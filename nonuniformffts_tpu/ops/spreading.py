"""Type-1 spreading: scatter non-uniform values onto the oversampled grid.

This module holds the *reference* (pure-jnp) implementation: an XLA
scatter-add over the flattened grid, chunked over points to bound the memory
of the materialised ``(chunk, (2M)^D)`` stencil tensors.  It runs on any JAX
backend and is the correctness oracle for the Pallas fast path
(ops/pallas/spread.py), playing the role of the reference's non-blocked CPU
spreading (src/spreading/cpu_nonblocked.jl) — except vectorised instead of a
per-point loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .stencil import linear_stencil
from .windows import KernelData, EvaluationMode


def _pad_axis(x: jnp.ndarray, total: int, axis: int) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, total - x.shape[axis])
    return jnp.pad(x, pad)


def spread_reference(
    kernel_data: Sequence[KernelData],
    evalmode: EvaluationMode,
    shape_over: tuple,  # oversampled grid shape (N1~, ..., ND~)
    points: jnp.ndarray,  # (D, Np), folded
    vp: jnp.ndarray,  # (C, Np), real or complex
    *,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Returns the oversampled grid ``(C,) + shape_over`` with dtype of vp."""
    C, np_ = vp.shape
    ntot = 1
    for n in shape_over:
        ntot *= n

    if chunk_size is None or chunk_size >= np_:
        lin, w = linear_stencil(kernel_data, evalmode, points)
        vals = w[None, :, :] * vp[:, :, None]  # (C, Np, S)
        grid = jnp.zeros((C, ntot), dtype=vp.dtype)
        grid = grid.at[:, lin.reshape(-1)].add(
            vals.reshape(C, -1), mode="drop", unique_indices=False
        )
        return grid.reshape((C,) + tuple(shape_over))

    # Chunked accumulation via lax.scan to bound peak memory.
    nchunks = -(-np_ // chunk_size)
    np_pad = nchunks * chunk_size
    pts = _pad_axis(points, np_pad, axis=1).reshape(points.shape[0], nchunks, chunk_size)
    vpp = _pad_axis(vp, np_pad, axis=1).reshape(C, nchunks, chunk_size)
    pts = jnp.moveaxis(pts, 1, 0)  # (nchunks, D, chunk)
    vpp = jnp.moveaxis(vpp, 1, 0)  # (nchunks, C, chunk)

    def body(grid, inputs):
        pts_c, vp_c = inputs
        lin, w = linear_stencil(kernel_data, evalmode, pts_c)
        vals = w[None, :, :] * vp_c[:, :, None]
        grid = grid.at[:, lin.reshape(-1)].add(
            vals.reshape(C, -1), mode="drop", unique_indices=False
        )
        return grid, None

    grid0 = jnp.zeros((C, ntot), dtype=vp.dtype)
    grid, _ = jax.lax.scan(body, grid0, (pts, vpp))
    return grid.reshape((C,) + tuple(shape_over))
