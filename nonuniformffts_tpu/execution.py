"""Transform execution: type-1 (non-uniform -> uniform) and type-2
(uniform -> non-uniform) pipelines.

Counterpart of the reference's exec_type1! / exec_type2!
(src/NonuniformFFTs.jl:148-189, 237-286), with identical conventions:

- type 1: ``uhat(k) = sum_j v_j exp(-i k . x_j)``;
- type 2: ``v_j = sum_k uhat(k) exp(+i k . x_j)``;
- on uniform points these reduce exactly to the unnormalised forward /
  backward DFT (pinned by tests/test_uniform_points.py, the port of
  test/uniform_points.jl).

Everything here is functional and jit-compiled as one XLA program: the
zero-fill, spreading, FFT and fused deconvolution stages of the reference map
to a single compiled computation per (plan-static, Np) signature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .callbacks import NUFFTCallbacks, apply_nonuniform_callback
from .ops import fft
from .ops.deconvolve import deconvolve_pad, deconvolve_truncate
from .ops.interpolation import interpolate_reference
from .ops.spreading import spread_reference
from .plan import Plan

_EMPTY_CALLBACKS = NUFFTCallbacks()


def _as_components(x: jnp.ndarray, plan: Plan, expected_tail_ndim: int):
    """Normalise input to a leading component axis of size ntransforms.
    Returns (array_with_C_axis, had_C_axis)."""
    if x.ndim == expected_tail_ndim:
        if plan.ntransforms != 1:
            raise ValueError(
                f"plan has ntransforms={plan.ntransforms}; pass data with a "
                f"leading component axis"
            )
        return x[None], False
    if x.ndim == expected_tail_ndim + 1:
        if x.shape[0] != plan.ntransforms:
            raise ValueError(
                f"leading axis {x.shape[0]} != ntransforms {plan.ntransforms}"
            )
        return x, True
    raise ValueError(f"unexpected input rank {x.ndim}")


def _check_points(plan: Plan):
    if plan.points is None:
        raise ValueError("points not set; call set_points first")


def _spread(plan: Plan, vp: jnp.ndarray) -> jnp.ndarray:
    """Dispatch spreading according to the plan's method."""
    if plan.spread_method == "blocked":
        from .ops.pallas import spread_blocked

        return spread_blocked(plan, vp)
    return spread_reference(
        plan.kernel_data,
        plan.evalmode,
        plan.shape_over,
        plan.points,
        vp,
        chunk_size=plan.chunk_size,
    )


def _interpolate(plan: Plan, grid: jnp.ndarray) -> jnp.ndarray:
    if plan.spread_method == "blocked":
        from .ops.pallas import interpolate_blocked

        return interpolate_blocked(plan, grid)
    return interpolate_reference(
        plan.kernel_data,
        plan.evalmode,
        grid,
        plan.points,
        plan.normfactor,
        chunk_size=plan.chunk_size,
    )


@partial(jax.jit, static_argnames=("callbacks", "had_axis"))
def _exec_type1_impl(plan: Plan, vp: jnp.ndarray, callbacks: NUFFTCallbacks, had_axis: bool):
    vp = apply_nonuniform_callback(vp, callbacks.nonuniform)
    grid = _spread(plan, vp)  # (C,) + shape_over, dtype Z
    uhat_over = fft.forward_fft(grid, real=plan.is_real)
    uhat = deconvolve_truncate(
        uhat_over,
        plan.index_maps,
        plan.phihat_inv,
        plan.normfactor,
        callback=callbacks.uniform,
    )
    return uhat if had_axis else uhat[0]


@partial(jax.jit, static_argnames=("callbacks", "had_axis"))
def _exec_type2_impl(plan: Plan, uhat: jnp.ndarray, callbacks: NUFFTCallbacks, had_axis: bool):
    uhat_over = deconvolve_pad(
        uhat,
        plan.spectral_shape_over,
        plan.index_maps,
        plan.phihat_inv,
        callback=callbacks.uniform,
    )
    grid = fft.backward_fft(uhat_over, plan.shape_over, real=plan.is_real)
    vp = _interpolate(plan, grid)
    vp = apply_nonuniform_callback(vp, callbacks.nonuniform)
    if plan.point_perm is not None:
        # Blocked path works on sorted points; return original point order
        # (reference: interpolation/gpu.jl:196-203).
        vp = jnp.zeros_like(vp).at[:, plan.point_perm].set(vp)
    return vp if had_axis else vp[0]


def exec_type1(plan: Plan, vp, callbacks: NUFFTCallbacks = None) -> jnp.ndarray:
    """Type-1 NUFFT: values at non-uniform points -> Fourier modes.

    ``vp`` has shape ``(Np,)`` or ``(ntransforms, Np)`` and the plan's dtype;
    the output has shape ``plan.spectral_shape`` (plus the leading component
    axis if present in the input) and complex dtype.
    """
    _check_points(plan)
    callbacks = callbacks or _EMPTY_CALLBACKS
    vp = jnp.asarray(vp)
    if vp.dtype != plan.dtype:
        raise TypeError(f"non-uniform data must have dtype {plan.dtype}, got {vp.dtype}")
    vp, had_axis = _as_components(vp, plan, expected_tail_ndim=1)
    if vp.shape[1] != plan.num_points:
        raise ValueError(
            f"number of values {vp.shape[1]} != number of points {plan.num_points}"
        )
    if plan.point_perm is not None:
        vp = jnp.take(vp, plan.point_perm, axis=1)
    return _exec_type1_impl(plan, vp, callbacks, had_axis)


def exec_type2(plan: Plan, uhat, callbacks: NUFFTCallbacks = None) -> jnp.ndarray:
    """Type-2 NUFFT: Fourier modes -> values at non-uniform points.

    ``uhat`` has shape ``plan.spectral_shape`` (optionally with a leading
    component axis) and complex dtype; the output has shape ``(Np,)`` /
    ``(ntransforms, Np)`` and the plan's dtype.
    """
    _check_points(plan)
    callbacks = callbacks or _EMPTY_CALLBACKS
    uhat = jnp.asarray(uhat)
    if uhat.dtype != plan.complex_dtype:
        raise TypeError(
            f"uniform data must have dtype {np.dtype(plan.complex_dtype)}, got {uhat.dtype}"
        )
    uhat, had_axis = _as_components(uhat, plan, expected_tail_ndim=plan.ndim)
    if uhat.shape[1:] != plan.spectral_shape:
        raise ValueError(
            f"uniform data shape {uhat.shape[1:]} != expected {plan.spectral_shape}"
        )
    return _exec_type2_impl(plan, uhat, callbacks, had_axis)
