"""User callbacks fused into transform passes.

Counterpart of the reference's ``NUFFTCallbacks`` (src/plan.jl:62-164), with
identical semantics:

- ``nonuniform(v, n)``: applied to non-uniform values; ``v`` is a tuple of C
  scalars (one per simultaneous transform) and ``n`` the point index.  Fused
  into the spreading read (type 1) and the interpolation write (type 2).
- ``uniform(w, idx)``: applied to uniform values; ``w`` is a tuple of C
  scalars and ``idx`` a tuple of D grid indices.  Fused into both
  deconvolution passes.

Transform inputs are never modified.  In JAX the callbacks are plain traced
functions: they are ``vmap``-ed over points / grid indices and fused by XLA
into the surrounding passes, which is the TPU-native equivalent of the
reference compiling them into its device kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NUFFTCallbacks:
    nonuniform: Optional[Callable] = None
    uniform: Optional[Callable] = None


def apply_nonuniform_callback(vp: jnp.ndarray, callback) -> jnp.ndarray:
    """Vectorised application of the per-point callback; ``vp`` is (C, Np)."""
    if callback is None:
        return vp
    C = vp.shape[0]
    n = jnp.arange(vp.shape[1])

    def one(v, i):
        out = callback(tuple(v[c] for c in range(C)), i)
        return jnp.stack(list(out))

    return jax.vmap(one, in_axes=(1, 0), out_axes=1)(vp, n)
