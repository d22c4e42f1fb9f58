"""On uniform points the NUFFT reduces exactly to the (r)FFT.

Port of the reference's test/uniform_points.jl: type-1 on equispaced points
matches the unnormalised forward DFT to < 4e-10, and type-2 matches the
unnormalised backward DFT (bfft) to < 5e-10.  This pins the normalisation
conventions of the whole pipeline.
"""

import numpy as np
import pytest

import nonuniformffts_tpu as nufft
from nufft_test_utils import l2_error, random_values


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_uniform_points(dtype):
    N = 256
    sigma = 1.25
    m = 8
    rng = np.random.default_rng(42)
    x = np.arange(N) * (2 * np.pi / N)
    vp = random_values(rng, dtype, N)

    is_real = not np.issubdtype(np.dtype(dtype), np.complexfloating)
    if is_real:
        uhat_fft = np.fft.rfft(vp)
        uhat_fft[-1] = 0  # zero Nyquist mode (reference: uniform_points.jl:26)
        vp = np.fft.irfft(uhat_fft, N).astype(dtype)
    else:
        uhat_fft = np.fft.fft(vp)

    plan = nufft.PlanNUFFT(dtype, (N,), m=m, sigma=sigma)
    plan = nufft.set_points(plan, x)

    uhat = np.asarray(nufft.exec_type1(plan, vp))
    assert l2_error(uhat, uhat_fft) < 4e-10

    if is_real:
        expected = np.fft.irfft(uhat_fft, N) * N  # brfft
    else:
        expected = np.fft.ifft(uhat_fft) * N  # bfft
    v2 = np.asarray(nufft.exec_type2(plan, uhat_fft.astype(plan.complex_dtype)))
    assert l2_error(v2, expected) < 5e-10


def test_uniform_points_2d_complex():
    """2D extension of the same identity."""
    shape = (32, 24)
    rng = np.random.default_rng(3)
    xs = np.meshgrid(
        np.arange(shape[0]) * (2 * np.pi / shape[0]),
        np.arange(shape[1]) * (2 * np.pi / shape[1]),
        indexing="ij",
    )
    pts = np.stack([g.ravel() for g in xs])
    vp = random_values(rng, np.complex128, pts.shape[1])

    plan = nufft.PlanNUFFT(np.complex128, shape, m=8, sigma=1.25)
    plan = nufft.set_points(plan, pts)
    uhat = np.asarray(nufft.exec_type1(plan, vp))
    expected = np.fft.fft2(vp.reshape(shape))
    assert l2_error(uhat, expected) < 1e-9

    v2 = np.asarray(nufft.exec_type2(plan, uhat))
    expected2 = (np.fft.ifft2(uhat) * np.prod(shape)).ravel()
    assert l2_error(v2, expected2) < 1e-9
