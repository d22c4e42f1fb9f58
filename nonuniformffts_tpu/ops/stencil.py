"""Shared window-stencil construction: per-point linear indices and
tensor-product weights over the ``(2M)^D`` spreading stencil.

Used by both the reference (pure-jnp scatter/gather) spreading and
interpolation paths.  Counterpart of the index/value computation in the
reference's get_inds_vals_gpu (src/gpu_common.jl:101-116) and
spread_onto_arrays_gpu! (src/spreading/gpu.jl:43-127), re-shaped for SIMD: all
points in a chunk are processed at once along a leading axis.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from . import windows
from .windows import KernelData, EvaluationMode


def wrap_indices(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Branchless periodic wrap for indices in ``[-n, 2n)`` (the reference's
    kernel_indices wrap, src/Kernels/Kernels.jl:148-158; valid since the plan
    guarantees 2M <= N)."""
    idx = jnp.where(idx < 0, idx + n, idx)
    return jnp.where(idx >= n, idx - n, idx)


def window_values_and_starts(
    kernel_data: Sequence[KernelData],
    evalmode: EvaluationMode,
    points: jnp.ndarray,  # (D, P) folded into [0, 2pi)
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Per-dimension window values ``(P, 2M)`` and start nodes ``c - M + 1``
    (unwrapped int32, (P,)) for every point."""
    values, starts = [], []
    for d, kd in enumerate(kernel_data):
        # High-accuracy cell decomposition (point_to_cell_split): in f32 the
        # naive (x/L)*N costs N*2^-24 cells of position noise, which round-2
        # measured as the accuracy floor of the whole transform.
        c, X = windows.point_to_cell_split(points[d], kd.n)
        values.append(windows.eval_window_frac(kd, evalmode, X))
        starts.append(c - (kd.m - 1))
    return tuple(values), tuple(starts)


def linear_stencil(
    kernel_data: Sequence[KernelData],
    evalmode: EvaluationMode,
    points: jnp.ndarray,  # (D, P)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened stencil for each point.

    Returns ``(lin, w)`` with shapes ``(P, S)`` where ``S = prod(2M_d)``:
    ``lin`` are linear indices into the flattened (row-major) oversampled grid
    and ``w`` the tensor-product window weights.
    """
    values, starts = window_values_and_starts(kernel_data, evalmode, points)
    lin = None
    w = None
    for d, kd in enumerate(kernel_data):
        two_m = 2 * kd.m
        t = jnp.arange(two_m, dtype=jnp.int32)
        idx = wrap_indices(starts[d][:, None] + t[None, :], kd.n)  # (P, 2M)
        if lin is None:
            lin, w = idx, values[d]
        else:
            lin = (lin[:, :, None] * kd.n + idx[:, None, :]).reshape(lin.shape[0], -1)
            w = (w[:, :, None] * values[d][:, None, :]).reshape(w.shape[0], -1)
    return lin, w
