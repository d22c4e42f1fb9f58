"""Multidimensional transforms + feature matrix.

Port of the reference's test/multidimensional.jl: 2D/3D transforms against the
exact-DFT oracle, including the r2c Hermitian handling, plus the point-input
format variants of set_points (reference: src/set_points.jl and
test/multidimensional.jl:49, 98-104).
"""

import numpy as np
import pytest

import nonuniformffts_tpu as nufft
from nufft_test_utils import (
    direct_type1,
    direct_type2,
    direct_type2_real,
    l2_error,
    random_values,
)


def run_nd(dtype, shape, *, m=4, sigma=1.5, fftshift=False, rng=None, Np=300, **kw):
    rng = rng or np.random.default_rng(42)
    D = len(shape)
    real_dtype = np.dtype(dtype).type(0).real.dtype
    pts = rng.uniform(0, 2 * np.pi, (D, Np))
    v = random_values(rng, dtype, Np)
    plan = nufft.PlanNUFFT(dtype, shape, m=m, sigma=sigma, fftshift=fftshift, **kw)
    plan = nufft.set_points(plan, pts.astype(real_dtype))
    uhat = np.asarray(nufft.exec_type1(plan, v))
    kv = [np.asarray(k, np.float64) for k in plan.kvec]
    exact = direct_type1(pts, v.astype(np.complex128), kv)
    err1 = l2_error(uhat, exact)

    u_in = uhat.astype(plan.complex_dtype)
    if plan.is_real:
        if shape[-1] % 2 == 0:
            u_in = u_in.copy()
            u_in[..., -1] = 0  # zero last-axis Nyquist plane
        exact2 = direct_type2_real(pts, u_in.astype(np.complex128), kv, shape[-1])
    else:
        exact2 = direct_type2(pts, u_in.astype(np.complex128), kv)
    v2 = np.asarray(nufft.exec_type2(plan, u_in))
    err2 = l2_error(v2, exact2)
    return err1, err2


@pytest.mark.parametrize("dtype", [np.complex128, np.float64])
def test_2d(dtype):
    err1, err2 = run_nd(dtype, (64, 64))
    assert err1 < 2e-6 and err2 < 2e-6  # m=4, sigma=1.5 -> ~1.3e-6 budget


@pytest.mark.parametrize("dtype", [np.complex128, np.float64])
def test_3d(dtype):
    err1, err2 = run_nd(dtype, (16, 20, 24), m=4, sigma=2.0)
    assert err1 < 1e-6 and err2 < 1e-6


def test_odd_sizes_and_fftshift():
    err1, err2 = run_nd(np.complex128, (27, 33), fftshift=True)
    assert err1 < 2e-6 and err2 < 2e-6
    err1, err2 = run_nd(np.float64, (22, 27))  # odd last dim: full Hermitian test
    assert err1 < 2e-6 and err2 < 2e-6


def test_point_input_formats(rng):
    """set_points accepts tuples of vectors, (Np, D) and (D, Np) arrays with
    identical results (reference: src/set_points.jl:33-88)."""
    shape = (24, 18)
    Np = 100
    pts = rng.uniform(0, 2 * np.pi, (2, Np))
    v = random_values(rng, np.complex128, Np)
    plan0 = nufft.PlanNUFFT(np.complex128, shape)
    outs = []
    for form in (pts, pts.T, (pts[0], pts[1]), [pts[0], pts[1]]):
        p = nufft.set_points(plan0, form)
        outs.append(np.asarray(nufft.exec_type1(p, v)))
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    # 1-D convenience form.
    plan1 = nufft.PlanNUFFT(np.complex128, (32,))
    p = nufft.set_points(plan1, pts[0])
    assert p.num_points == Np


def test_ntransforms(rng):
    """Batched simultaneous transforms over shared points (reference C17)."""
    shape = (32, 28)
    Np, C = 200, 3
    pts = rng.uniform(0, 2 * np.pi, (2, Np))
    v = random_values(rng, np.complex128, (C, Np))
    plan = nufft.PlanNUFFT(np.complex128, shape, ntransforms=C, sigma=2.0)
    plan = nufft.set_points(plan, pts)
    uhat = np.asarray(nufft.exec_type1(plan, v))
    assert uhat.shape == (C,) + shape
    # Each component must match the single-transform result.
    plan1 = nufft.PlanNUFFT(np.complex128, shape, sigma=2.0)
    plan1 = nufft.set_points(plan1, pts)
    for c in range(C):
        single = np.asarray(nufft.exec_type1(plan1, v[c]))
        np.testing.assert_allclose(uhat[c], single, rtol=1e-12, atol=1e-12)
    # Type 2 batched.
    v2 = np.asarray(nufft.exec_type2(plan, uhat))
    assert v2.shape == (C, Np)
    for c in range(C):
        single = np.asarray(nufft.exec_type2(plan1, uhat[c]))
        np.testing.assert_allclose(v2[c], single, rtol=1e-12, atol=1e-12)


def test_real_dtype_shapes():
    plan = nufft.PlanNUFFT(np.float64, (16, 20))
    assert plan.spectral_shape == (16, 11)
    plan = nufft.PlanNUFFT(np.float32, (16, 21))
    assert plan.spectral_shape == (16, 11)
    assert plan.complex_dtype == np.complex64
