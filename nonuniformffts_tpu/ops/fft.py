"""Oversampled-grid FFTs through XLA's native TPU FFT.

Counterpart of the reference's FFT layer (src/plan.jl:37-60,
src/NonuniformFFTs.jl:197-211 and 293-314), with the reference's transform
conventions pinned by test/uniform_points.jl:

- type-1 uses the *unnormalised forward* DFT (FFTW ``rfft``/``fft``);
- type-2 uses the *unnormalised backward* DFT (FFTW ``bfft``/``brfft``), i.e.
  ``N_total * ifft`` in XLA terms (the scalar multiply fuses into neighbours).

Real-data transforms use r2c/c2r over the **last** axis (XLA's convention; the
reference halves the *first* axis per FFTW's convention — documented
divergence, see plan docs).
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_fft(grid: jnp.ndarray, *, real: bool) -> jnp.ndarray:
    """Forward (type-1) FFT over all axes but the leading component axis."""
    axes = tuple(range(1, grid.ndim))
    if real:
        return jnp.fft.rfftn(grid, axes=axes)
    return jnp.fft.fftn(grid, axes=axes)


def backward_fft(uhat: jnp.ndarray, shape_over, *, real: bool) -> jnp.ndarray:
    """Backward (type-2) unnormalised FFT (bfft semantics)."""
    axes = tuple(range(1, uhat.ndim))
    ntot = 1
    for n in shape_over:
        ntot *= n
    if real:
        u = jnp.fft.irfftn(uhat, s=tuple(shape_over), axes=axes)
        return u * u.dtype.type(ntot)
    u = jnp.fft.ifftn(uhat, axes=axes)
    return u * u.real.dtype.type(ntot)
