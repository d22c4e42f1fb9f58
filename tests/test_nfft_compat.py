"""NFFT-convention adapter tests.

Mirrors the semantics exercised by the reference's test/abstractNFFTs.jl:
convention round-trip against a directly-constructed plan, adjoint
consistency (<A fhat, f> == <fhat, A^H f>), size_in/size_out, window name
map, and the exact-DFT oracle in the NFFT convention
(f_j = sum_k fhat[k] e^{-2pi i k.x_j}, k increasing).
"""

import numpy as np
import pytest

import nonuniformffts_tpu as nufft
from nonuniformffts_tpu.nfft_compat import accuracy_params


def nfft_direct_forward(x, fhat):
    """Brute-force NFFT trafo: f_j = sum_k fhat[k] e^{-2pi i k.x_j},
    frequencies in increasing order per axis."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    D, Np = x.shape
    N = fhat.shape
    ks = [np.arange(-(n // 2), (n + 1) // 2) for n in N]
    mats = [np.exp(-2j * np.pi * x[d][:, None] * ks[d][None, :]) for d in range(D)]
    if D == 1:
        return mats[0] @ fhat
    if D == 2:
        return np.einsum("ja,jb,ab->j", mats[0], mats[1], fhat)
    raise ValueError(D)


@pytest.mark.parametrize("N", [(64,), (32, 32)])
def test_forward_matches_direct(N, rng):
    D = len(N)
    Np = 200
    x = rng.uniform(-0.5, 0.5, (D, Np))
    fhat = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(np.complex128)

    p = nufft.plan_nfft(x, N, reltol=1e-9)
    f = np.asarray(p.forward(fhat))
    exact = nfft_direct_forward(x, fhat)
    err = np.linalg.norm(f - exact) / np.linalg.norm(exact)
    assert err < 1e-8, err


def test_adjoint_matches_direct(rng):
    N = (48,)
    Np = 150
    x = rng.uniform(-0.5, 0.5, (1, Np))
    f = rng.standard_normal(Np) + 1j * rng.standard_normal(Np)

    p = nufft.plan_nfft(x, N, reltol=1e-9)
    fhat = np.asarray(p.adjoint(f))
    ks = np.arange(-(N[0] // 2), (N[0] + 1) // 2)
    exact = np.exp(2j * np.pi * ks[:, None] * x[0][None, :]) @ f
    err = np.linalg.norm(fhat - exact) / np.linalg.norm(exact)
    assert err < 1e-8, err


def test_adjoint_consistency(rng):
    """<A fhat, f> == <fhat, A^H f> to near machine precision (an exact
    algebraic identity of the NUFFT pair, independent of kernel error)."""
    N = (32, 16)
    Np = 100
    x = rng.uniform(-0.5, 0.5, (2, Np))
    fhat = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    f = rng.standard_normal(Np) + 1j * rng.standard_normal(Np)

    p = nufft.plan_nfft(x, N, reltol=1e-9)
    lhs = np.vdot(np.asarray(p @ fhat), f)
    rhs = np.vdot(fhat, np.asarray(p.H @ f))
    assert abs(lhs - rhs) / abs(lhs) < 1e-7


def test_matches_native_plan_with_transformed_points(rng):
    """Convention round-trip: NFFTPlan == native plan built with the
    documented point transform + fftshift (reference:
    test/abstractNFFTs.jl comparison against a manually-constructed plan)."""
    N = (64,)
    Np = 128
    x = rng.uniform(-0.5, 0.5, (1, Np))
    fhat = rng.standard_normal(N) + 1j * rng.standard_normal(N)

    p = nufft.plan_nfft(x, N, m=6, sigma=2.0, window="kaiser_bessel")
    native = nufft.PlanNUFFT(
        np.complex128, N, m=6, sigma=2.0,
        kernel=nufft.KaiserBesselKernel(), fftshift=True,
    )
    native = nufft.set_points(native, np.mod(-2 * np.pi * x, 2 * np.pi))
    f_compat = np.asarray(p.forward(fhat))
    f_native = np.asarray(nufft.exec_type2(native, fhat.astype(np.complex128)))
    np.testing.assert_allclose(f_compat, f_native, rtol=1e-12)


def test_sizes_and_nodes_update(rng):
    N = (32, 24)
    x = rng.uniform(-0.5, 0.5, (2, 50))
    p = nufft.plan_nfft(x, N)
    assert p.size_in == N
    assert p.size_out == (50,)
    x2 = rng.uniform(-0.5, 0.5, (2, 70))
    p2 = p.with_nodes(x2)
    assert p2.size_out == (70,)
    assert p.size_out == (50,)  # original untouched (functional update)


def test_one_shot_helpers(rng):
    N = (32,)
    x = rng.uniform(-0.5, 0.5, (1, 64))
    fhat = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    f = np.asarray(nufft.nfft(x, fhat, reltol=1e-8))
    exact = nfft_direct_forward(x, fhat)
    assert np.linalg.norm(f - exact) / np.linalg.norm(exact) < 1e-7

    fh = np.asarray(nufft.nfft_adjoint(x, f, N, reltol=1e-8))
    assert fh.shape == N


def test_accuracy_params_mapping():
    m9, s9 = accuracy_params(1e-9)
    m4, s4 = accuracy_params(1e-4)
    assert s9 == s4 == 2.0
    assert m9 > m4 >= 2
    # f32 floor keeps m reasonable even for absurd tolerances
    m32, _ = accuracy_params(1e-14, f32=True)
    assert m32 <= 4
    with pytest.raises(ValueError):
        accuracy_params(0.0)


def test_window_map_and_errors(rng):
    x = rng.uniform(-0.5, 0.5, (1, 16))
    for w in ("kaiser_bessel", "kaiser_bessel_rev", "gauss", "spline"):
        p = nufft.plan_nfft(x, (16,), reltol=1e-4, window=w)
        assert p.size_in == (16,)
    with pytest.raises(ValueError, match="unknown window"):
        nufft.plan_nfft(x, (16,), window="hann")
    with pytest.raises(TypeError, match="complex"):
        nufft.NFFTPlan(x, (16,), dtype=np.float64)
