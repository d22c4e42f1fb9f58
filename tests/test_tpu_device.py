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
