"""Type-2 interpolation: gather oversampled grid values at non-uniform points.

Reference-path (pure jnp) implementation; transpose of ops/spreading.py.
Counterpart of the reference's src/interpolation/cpu_nonblocked.jl, with the
cell-volume prefactor ``prod(2pi / N~)`` applied at the gather
(cpu_nonblocked.jl:45-48, interpolation/gpu.jl:55-56).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .stencil import linear_stencil
from .windows import KernelData, EvaluationMode


def interpolate_reference(
    kernel_data: Sequence[KernelData],
    evalmode: EvaluationMode,
    grid: jnp.ndarray,  # (C,) + shape_over, real or complex
    points: jnp.ndarray,  # (D, Np), folded
    prefactor: float,
    *,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Returns values at points, shape (C, Np)."""
    C = grid.shape[0]
    np_ = points.shape[1]
    gflat = grid.reshape(C, -1)
    pref = jnp.asarray(prefactor, dtype=grid.real.dtype)

    def gather(pts):
        lin, w = linear_stencil(kernel_data, evalmode, pts)
        vals = gflat[:, lin]  # (C, P, S)
        return jnp.sum(vals * w[None], axis=-1) * pref

    if chunk_size is None or chunk_size >= np_:
        return gather(points)

    nchunks = -(-np_ // chunk_size)
    np_pad = nchunks * chunk_size
    pts = jnp.pad(points, ((0, 0), (0, np_pad - np_)))
    pts = jnp.moveaxis(pts.reshape(points.shape[0], nchunks, chunk_size), 1, 0)

    def body(_, pts_c):
        return None, gather(pts_c)

    _, out = jax.lax.scan(body, None, pts)  # (nchunks, C, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(C, np_pad)[:, :np_]
