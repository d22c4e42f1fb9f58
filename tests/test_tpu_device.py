"""Opt-in on-device (real TPU) test job.

The CI suite runs on CPU with interpret-mode Pallas (tests/conftest.py), so
the compiled Mosaic kernels, real matmul-DFT precision and DMA alignment
are never exercised there — exactly what hid the round-1 batch-size crash
(ADVICE.md).  Run this file on a host with a real TPU:

    NUFFT_TPU_TESTS=1 JAX_PLATFORMS='' python -m pytest tests/test_tpu_device.py

(bench.py also certifies accuracy on device every round; this job is the
pytest-shaped version for development.)
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("NUFFT_TPU_TESTS") != "1",
    reason="set NUFFT_TPU_TESTS=1 on a TPU host to run compiled-kernel tests",
)


@requires_tpu
def test_compiled_blocked_matches_reference_small():
    import jax

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        exec_type1_channels,
        exec_type2_channels,
    )

    assert jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)
    shape = (64, 64, 64)
    Np = 20_000
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    v = rng.standard_normal((1, 2, Np)).astype(np.float32)

    pb = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5,
        spread_method="blocked", fft_method="matmul", np_hint=Np,
    )
    p = nufft.set_points(pb, jax.device_put(pts))
    u = np.asarray(exec_type1_channels(p, jax.device_put(v)))
    v2 = np.asarray(exec_type2_channels(p, u))
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v2))

    # Exact-DFT oracle on a mode subsample (f64, host).
    uc = (u[0, 0] + 1j * u[0, 1]).astype(np.complex128)
    kidx = rng.integers(0, 64, (128, 3))
    kval = np.where(kidx >= 32, kidx - 64, kidx).astype(np.float64)
    vc = (v[0, 0] + 1j * v[0, 1]).astype(np.complex128)
    ph = (
        kval[:, 0:1] * pts[0:1].astype(np.float64)
        + kval[:, 1:2] * pts[1:2].astype(np.float64)
        + kval[:, 2:3] * pts[2:3].astype(np.float64)
    )
    exact = np.exp(-1j * ph) @ vc
    got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
    err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert err < 5e-6, err


@requires_tpu
def test_compiled_batch_size_alignment_rejected():
    import nonuniformffts_tpu as nufft

    with pytest.raises(ValueError, match="multiple of 128"):
        nufft.PlanNUFFT(
            np.complex64, (64, 64, 64), spread_method="blocked", batch_size=64
        )


def _exact_t1_oracle(pts, vc, kidx, N):
    kval = np.where(kidx >= (N + 1) // 2, kidx - N, kidx).astype(np.float64)
    ph = (
        kval[:, 0:1] * pts[0:1].astype(np.float64)
        + kval[:, 1:2] * pts[1:2].astype(np.float64)
        + kval[:, 2:3] * pts[2:3].astype(np.float64)
    )
    return np.exp(-1j * ph) @ vc


_KERNELS = ["bkb", "kb", "gaussian", "bspline"]


@requires_tpu
@pytest.mark.parametrize("kernel_name", _KERNELS)
@pytest.mark.parametrize("evalmode", ["fast", "direct"])
def test_compiled_kernel_matrix(kernel_name, evalmode):
    """Compiled-Mosaic coverage of all four window kernels x both eval
    modes (reference: test/pseudo_gpu.jl:41-53's real-hardware mode).  The
    point set includes a dense cluster (windowed-fallback batches) and
    near-2pi coordinates."""
    import jax

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        exec_type1_channels,
        exec_type2_channels,
    )
    from nonuniformffts_tpu.ops import windows

    kern = {
        "bkb": windows.BackwardsKaiserBesselKernel(),
        "kb": windows.KaiserBesselKernel(),
        "gaussian": windows.GaussianKernel(),
        "bspline": windows.BSplineKernel(),
    }[kernel_name]
    mode = (
        windows.FastApproximation() if evalmode == "fast" else windows.Direct()
    )
    if kernel_name == "bspline" and evalmode == "direct":
        pytest.skip("bspline FastApproximation == Direct")

    rng = np.random.default_rng(3)
    N = 64
    Np = 30_000
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    pts[:, : Np // 3] = rng.uniform(0.5, 0.8, (3, Np // 3))
    pts[:, -500:] = np.nextafter(np.float32(2 * np.pi), np.float32(0))
    v = rng.standard_normal((1, 2, Np)).astype(np.float32)

    pb = nufft.PlanNUFFT(
        np.complex64, (N,) * 3, m=4, sigma=1.5, kernel=kern,
        kernel_evalmode=mode, spread_method="blocked", fft_method="matmul",
        np_hint=Np,
    )
    import jax as _jax

    p = nufft.set_points(pb, _jax.device_put(pts))
    u = np.asarray(exec_type1_channels(p, _jax.device_put(v)))
    uc = (u[0, 0] + 1j * u[0, 1]).astype(np.complex128)
    kidx = rng.integers(0, N, (128, 3))
    vc = (v[0, 0] + 1j * v[0, 1]).astype(np.complex128)
    exact = _exact_t1_oracle(pts, vc, kidx, N)
    got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
    err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    # f32 pipeline budgets per kernel family, set from the measured device
    # run 2026-08-19 (PROFILE.md round-3): fast (B)KB sits at the ~2e-6
    # pipeline floor; the DIRECT in-kernel evaluators carry the exp
    # dynamic-range noise of the shifted-exponent sinh / Chebyshev-i0 forms
    # (~beta*eps_f32 per tap, measured 5.5e-6/7.7e-6 at m=4); gaussian's
    # intrinsic m=4 sigma=1.5 truncation is ~3e-4 (docs/accuracy.md) and
    # measured 5.7e-4 on device.
    budget = {
        ("bkb", "fast"): 5e-6, ("kb", "fast"): 5e-6,
        ("bkb", "direct"): 2e-5, ("kb", "direct"): 2e-5,
        ("gaussian", "fast"): 1.5e-3, ("gaussian", "direct"): 1.5e-3,
        ("bspline", "fast"): 2e-3, ("bspline", "direct"): 2e-3,
    }
    assert err < budget[(kernel_name, evalmode)], (kernel_name, evalmode, err)

    # Type-2 round-trip sanity (finite + scale).
    v2 = np.asarray(exec_type2_channels(p, u))
    assert np.all(np.isfinite(v2))


@requires_tpu
@pytest.mark.parametrize("real_data", [False, True])
@pytest.mark.parametrize("fftshift", [False, True])
def test_compiled_r2c_fftshift_ntransforms(real_data, fftshift):
    """Compiled coverage: r2c x fftshift x ntransforms=2 against the exact
    oracle (VERDICT round-1 missing #3)."""
    import jax

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import exec_type1_channels

    rng = np.random.default_rng(5)
    N = 64
    Np = 20_000
    C = 2
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    dtype = np.float32 if real_data else np.complex64
    vshape = (C, Np) if real_data else (C, 2, Np)
    v = rng.standard_normal(vshape).astype(np.float32)

    pb = nufft.PlanNUFFT(
        dtype, (N,) * 3, m=4, sigma=1.5, ntransforms=C,
        spread_method="blocked", fft_method="matmul", np_hint=Np,
        fftshift=fftshift,
    )
    p = nufft.set_points(pb, jax.device_put(pts))
    u = np.asarray(exec_type1_channels(p, jax.device_put(v)))
    for c in range(C):
        if real_data:
            uc = (u[c, 0] + 1j * u[c, 1]).astype(np.complex128)
            vc = v[c].astype(np.complex128)
            kidx = rng.integers(0, N, (96, 3))
            kidx[:, 2] = rng.integers(0, N // 2 + 1, 96)  # half-spectrum
            # r2c: trailing axis never fftshifted; leading axes shifted
            kidx_eval = kidx.copy()
            if fftshift:
                kidx_eval[:, :2] = (kidx[:, :2] + N // 2) % N
            # last axis of kidx indexes the half-spectrum directly: mode k2
            kval2 = kidx[:, 2]
            ph2 = np.exp(-1j * np.outer(kval2.astype(np.float64), pts[2].astype(np.float64)))
            kv = np.where(kidx_eval[:, :2] >= N // 2, kidx_eval[:, :2] - N, kidx_eval[:, :2])
            ph01 = (
                kv[:, 0:1] * pts[0:1].astype(np.float64)
                + kv[:, 1:2] * pts[1:2].astype(np.float64)
            )
            exact = (np.exp(-1j * ph01) * ph2) @ vc
            got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
        else:
            uc = (u[c, 0] + 1j * u[c, 1]).astype(np.complex128)
            vc = (v[c, 0] + 1j * v[c, 1]).astype(np.complex128)
            kidx = rng.integers(0, N, (96, 3))
            kidx_eval = ((kidx + N // 2) % N) if fftshift else kidx
            exact = _exact_t1_oracle(pts, vc, kidx_eval, N)
            got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
        err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
        assert err < 5e-6, (real_data, fftshift, c, err)


@requires_tpu
def test_compiled_custom_blocks_dim1_window():
    """Compiled coverage of custom block_dims/batch_size and the dim-1
    windowed accumulation (window_rows_y; high-density batches contract a
    2D (dim-0, dim-1) accumulator window) including its fallback tiers,
    against the exact oracle."""
    import jax

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        exec_type1_channels,
        exec_type2_channels,
    )

    rng = np.random.default_rng(11)
    N = 64
    Np = 120_000  # rho ~ 0.14 oversampled: single-slab batches exist
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    # Dense cluster -> many single-x-slab batches (W1 engaged) AND
    # wide-span batches (W1/W0 fallbacks) in one program grid.
    pts[:, : Np // 2] = rng.uniform(1.0, 1.6, (3, Np // 2))
    v = rng.standard_normal((1, 2, Np)).astype(np.float32)

    pb = nufft.PlanNUFFT(
        np.complex64, (N,) * 3, m=4, sigma=1.5,
        spread_method="blocked", fft_method="matmul", np_hint=Np,
        block_dims=(16, 24, 48), window_rows=16, window_rows_y=16,
    )
    assert pb.window_rows_y is not None
    p = nufft.set_points(pb, jax.device_put(pts))
    r1 = np.asarray(p.batch_r1)
    assert (r1 >= 0).any(), "dim-1 window never engaged"
    assert (r1 < 0).any(), "fallback tier never engaged"
    u = np.asarray(exec_type1_channels(p, jax.device_put(v)))
    uc = (u[0, 0] + 1j * u[0, 1]).astype(np.complex128)
    kidx = rng.integers(0, N, (128, 3))
    vc = (v[0, 0] + 1j * v[0, 1]).astype(np.complex128)
    exact = _exact_t1_oracle(pts, vc, kidx, N)
    got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
    err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert err < 5e-6, err
    v2 = np.asarray(exec_type2_channels(p, u))
    assert np.all(np.isfinite(v2))


@requires_tpu
def test_compiled_large_batch_and_sort_permute():
    """Compiled coverage of batch_size=256 (super-batch DMA offsets, VMEM
    accumulator scaling, partial-batch masking at P=256) and the sort-based
    value permutation, against the exact oracle and the default-config
    output."""
    import jax

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        exec_type1_channels,
        exec_type2_channels,
    )

    rng = np.random.default_rng(13)
    N = 64
    Np = 100_001  # odd: exercises tail masking at the 256 granule
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    v = rng.standard_normal((1, 2, Np)).astype(np.float32)
    kidx = rng.integers(0, N, (128, 3))
    vc = (v[0, 0] + 1j * v[0, 1]).astype(np.complex128)
    exact = _exact_t1_oracle(pts, vc, kidx, N)

    base = nufft.PlanNUFFT(
        np.complex64, (N,) * 3, m=4, sigma=1.5,
        spread_method="blocked", fft_method="matmul", np_hint=Np,
    )
    pb = nufft.set_points(base, jax.device_put(pts))
    u_base = np.asarray(exec_type1_channels(pb, jax.device_put(v)))

    for cfg in (
        dict(batch_size=256, block_dims=(32, 8, 48)),
        dict(value_permute="sort"),
        dict(batch_size=256, block_dims=(32, 8, 48), value_permute="sort"),
    ):
        plan = nufft.PlanNUFFT(
            np.complex64, (N,) * 3, m=4, sigma=1.5,
            spread_method="blocked", fft_method="matmul", np_hint=Np, **cfg,
        )
        p = nufft.set_points(plan, jax.device_put(pts))
        if cfg.get("value_permute") == "sort":
            assert p.sort_key is not None
        u = np.asarray(exec_type1_channels(p, jax.device_put(v)))
        uc = (u[0, 0] + 1j * u[0, 1]).astype(np.complex128)
        got = uc[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
        err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
        assert err < 5e-6, (cfg, err)
        # Different batch/geometry => different f32 summation order; the
        # absolute tolerance must scale with the output magnitude (values
        # reach ~1e3 here; 1e-5 atol flagged pure reorder noise on device).
        atol = 2e-4 * float(np.max(np.abs(u_base)))
        np.testing.assert_allclose(u, u_base, rtol=2e-4, atol=atol)
        v2 = np.asarray(exec_type2_channels(p, u))
        assert np.all(np.isfinite(v2)), cfg


@requires_tpu
def test_compiled_ds_extended_precision():
    """The extended-precision (double-single) pipeline on the COMPILED
    Mosaic kernels: complex128 and float64 plans at m=6, sigma=2 must land
    ~4 orders below the f32 pipeline's ~2e-7 device floor (the regime the
    reference covers with native Float64, test/accuracy.jl:7-27)."""
    import jax
    import nonuniformffts_tpu as nufft

    rng = np.random.default_rng(21)
    N, Np = 48, 40_000
    pts = rng.uniform(0, 2 * np.pi, (3, Np))  # float64: ds split on host
    vc = rng.standard_normal(Np) + 1j * rng.standard_normal(Np)
    kidx = rng.integers(0, N, (96, 3))
    kval = np.where(kidx >= (N + 1) // 2, kidx - N, kidx).astype(np.float64)
    ph = (
        kval[:, 0:1] * pts[0:1]
        + kval[:, 1:2] * pts[1:2]
        + kval[:, 2:3] * pts[2:3]
    )
    exact_c = (np.exp(-1j * ph) * vc[None, :]).sum(axis=1)

    p = nufft.set_points(
        nufft.PlanNUFFT(
            np.complex128, (N,) * 3, m=6, sigma=2.0, precision="double",
            spread_method="blocked", np_hint=Np,
        ),
        pts,
    )
    u = np.asarray(nufft.exec_type1(p, vc[None]))[0]
    got = u[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
    err_c = np.linalg.norm(got - exact_c) / np.linalg.norm(exact_c)
    assert err_c < 5e-10, err_c

    # float64 real-data ds plan (r2c): same oracle on the half-spectrum.
    vr = vc.real.copy()
    kidxr = kidx.copy()
    kidxr[:, 2] = rng.integers(0, N // 2 + 1, 96)
    kvalr = kval.copy()
    kvalr[:, 2] = kidxr[:, 2]  # halved axis stores k = 0..+N/2
    phr = (
        kvalr[:, 0:1] * pts[0:1]
        + kvalr[:, 1:2] * pts[1:2]
        + kvalr[:, 2:3] * pts[2:3]
    )
    exact_r = (np.exp(-1j * phr) * vr[None, :]).sum(axis=1)
    pr = nufft.set_points(
        nufft.PlanNUFFT(
            np.float64, (N,) * 3, m=6, sigma=2.0, precision="double",
            spread_method="blocked", np_hint=Np,
        ),
        pts,
    )
    ur = np.asarray(nufft.exec_type1(pr, vr[None]))[0]
    gotr = ur[kidxr[:, 0], kidxr[:, 1], kidxr[:, 2]]
    err_r = np.linalg.norm(gotr - exact_r) / np.linalg.norm(exact_r)
    assert err_r < 5e-10, err_r


@requires_tpu
def test_compiled_direct_nudft():
    """The direct-NUDFT path on device: exact dense sums must sit at the
    contraction floor (~2e-7), below the windowed pipeline's 1e-6, with
    the split-product phase reduction surviving compilation."""
    import jax
    import nonuniformffts_tpu as nufft

    rng = np.random.default_rng(5)
    N, Np = 128, 1500
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    vc = (rng.standard_normal(Np) + 1j * rng.standard_normal(Np)).astype(
        np.complex64
    )
    p = nufft.set_points(
        nufft.PlanNUFFT(
            np.complex64, (N,) * 3, spread_method="direct", np_hint=Np
        ),
        jax.device_put(pts),
    )
    u = np.asarray(nufft.exec_type1(p, vc))
    kidx = rng.integers(0, N, (128, 3))
    exact = _exact_t1_oracle(pts, vc.astype(np.complex128), kidx, N)
    got = u[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
    err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert err < 1e-6, err


@requires_tpu
def test_compiled_chunked_matches_single_plan():
    """Points-chunked execution on the compiled kernels: a 3-chunk plan
    must reproduce the single-plan output (f32 summation-order noise
    only)."""
    import jax
    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.chunked import (
        exec_type1_ch_chunked,
        exec_type2_ch_chunked,
    )
    from nonuniformffts_tpu.execution import (
        _exec_type1_ch_impl,
        _exec_type2_ch_impl,
    )
    from nonuniformffts_tpu.callbacks import NUFFTCallbacks

    cbs = NUFFTCallbacks()
    rng = np.random.default_rng(6)
    shape = (64, 64, 64)
    Np = 60_000
    pts = rng.uniform(0, 2 * np.pi, (3, Np)).astype(np.float32)
    v = rng.standard_normal((1, 2, Np)).astype(np.float32)

    p1 = nufft.set_points(
        nufft.PlanNUFFT(
            np.complex64, shape, m=4, sigma=1.5,
            spread_method="blocked", np_hint=Np,
        ),
        jax.device_put(pts),
    )
    u1 = np.asarray(_exec_type1_ch_impl(p1, jax.device_put(v), cbs))

    cp = nufft.set_points_chunked(
        nufft.ChunkedPlanNUFFT(
            np.complex64, shape, nchunks=3, m=4, sigma=1.5,
            spread_method="blocked", np_hint=Np,
        ),
        jax.device_put(pts),
    )
    uc = np.asarray(exec_type1_ch_chunked(cp, jax.device_put(v), cbs))
    atol = 2e-4 * float(np.max(np.abs(u1)))
    np.testing.assert_allclose(uc, u1, rtol=2e-4, atol=atol)

    v1 = np.asarray(_exec_type2_ch_impl(p1, jax.device_put(u1), cbs))
    vc = np.asarray(exec_type2_ch_chunked(cp, jax.device_put(u1), cbs))
    atol = 2e-4 * float(np.max(np.abs(v1)))
    np.testing.assert_allclose(vc, v1, rtol=2e-4, atol=atol)
