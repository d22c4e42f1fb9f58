"""Boundary / roundoff robustness near x = 2pi.

Port of the reference's test/near_2pi.jl: the chosen index formula
``trunc((x / L) * N)`` stays in bounds at ``x = prevfloat(2pi)`` and a single
point there transforms correctly end-to-end.
"""

import numpy as np
import pytest

import nonuniformffts_tpu as nufft
from nufft_test_utils import direct_type1, l2_error


@pytest.mark.parametrize("real_dtype", [np.float32, np.float64])
def test_single_point_near_two_pi(real_dtype):
    """End-to-end: one point just below 2pi (reference: near_2pi.jl:48-70)."""
    N = 64
    dtype = np.complex64 if real_dtype == np.float32 else np.complex128
    two_pi = real_dtype(2 * np.pi)
    x = np.nextafter(two_pi, real_dtype(0))
    v = np.asarray([1.0 + 0.5j], dtype=dtype)
    plan = nufft.PlanNUFFT(dtype, (N,), m=4, sigma=2.0)
    plan = nufft.set_points(plan, np.asarray([x], dtype=real_dtype))
    uhat = np.asarray(nufft.exec_type1(plan, v))
    assert np.all(np.isfinite(uhat))
    kv = [np.asarray(plan.kvec[0], np.float64)]
    exact = direct_type1(np.asarray([[x]], np.float64), v.astype(np.complex128), kv)
    tol = 1e-5 if real_dtype == np.float32 else 5e-7  # single-point m=4 accuracy
    assert l2_error(uhat, exact) < tol


@pytest.mark.parametrize("real_dtype", [np.float32, np.float64])
def test_points_near_pi(real_dtype):
    """Reference: near_2pi.jl:89-114 (points near pi, no folding edge)."""
    N = 32
    dtype = np.complex64 if real_dtype == np.float32 else np.complex128
    pi_t = real_dtype(np.pi)
    xs = np.asarray(
        [np.nextafter(pi_t, real_dtype(0)), pi_t, np.nextafter(pi_t, real_dtype(4))],
        dtype=real_dtype,
    )
    v = np.asarray([1.0, 2.0, 3.0], dtype=dtype)
    plan = nufft.PlanNUFFT(dtype, (N,), m=4, sigma=2.0)
    plan = nufft.set_points(plan, xs)
    uhat = np.asarray(nufft.exec_type1(plan, v))
    kv = [np.asarray(plan.kvec[0], np.float64)]
    exact = direct_type1(xs[None].astype(np.float64), v.astype(np.complex128), kv)
    tol = 2e-6 if real_dtype == np.float32 else 5e-7  # few-point m=4 accuracy
    assert l2_error(uhat, exact) < tol


def test_fold_negative_and_large_points():
    """Folding maps arbitrary reals onto [0, 2pi) (reference:
    blocking/blocking.jl to_unit_cell)."""
    from nonuniformffts_tpu.plan import fold_points
    import jax.numpy as jnp

    x = jnp.asarray([-0.1, -2 * np.pi, 7.0, 4 * np.pi + 0.25, 0.0])
    f = np.asarray(fold_points(x))
    assert np.all((f >= 0) & (f < 2 * np.pi))
    np.testing.assert_allclose(
        np.mod(np.asarray(x), 2 * np.pi), f, rtol=0, atol=1e-12
    )
