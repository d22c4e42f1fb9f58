"""Deconvolution passes fused with truncation / zero-padding between the
oversampled and non-oversampled Fourier grids.

Counterpart of the reference's copy_deconvolve_to_non_oversampled! /
copy_deconvolve_to_oversampled! (src/NonuniformFFTs.jl:350-480) and of the
index-map builder non_oversampled_indices! (src/NonuniformFFTs.jl:318-348).

Design notes (TPU-first):
- the per-dimension index maps are tiny static int32 vectors; truncation is a
  per-axis ``take`` and padding a per-axis open-mesh scatter, both of which
  XLA lowers to cheap dynamic-slice-like ops for the contiguous sub-ranges;
- the deconvolution factor ``1/phi_hat`` is applied as D successive broadcast
  multiplies (never materialising the dense D-dimensional factor), which XLA
  fuses with the copy;
- the optional user callback on uniform data is fused into the same pass via
  ``vmap`` (reference fuses it at NonuniformFFTs.jl:376, 398, 441, 464).

Wavenumber convention: identical to the reference (and FFTW): for output size
``N`` the modes are ``k = 0, 1, ..., N/2-1, -N/2, ..., -1`` unless
``fftshift=True`` (increasing order).  For real-data transforms the *last*
axis (XLA's rfft convention; the reference uses the first axis, FFTW
convention — documented divergence) holds modes ``k = 0 .. N/2``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def output_wavenumbers(n: int, *, r2c: bool, fftshift: bool) -> np.ndarray:
    """Integer wavenumbers of the non-oversampled output grid along one dim
    (reference: init_wavenumbers, src/plan.jl:558-566)."""
    if r2c:
        return np.arange(n // 2 + 1, dtype=np.float64)
    k = np.fft.fftfreq(n, d=1.0 / n).astype(np.float64)  # 0..N/2-1, -N/2..-1
    if fftshift:
        k = np.fft.fftshift(k)
    return k


def non_oversampled_indices(
    n_out: int, n_over: int, *, r2c: bool, fftshift: bool
) -> np.ndarray:
    """Map output index (along one dim) -> index into the oversampled FFT axis
    (reference: non_oversampled_indices!, src/NonuniformFFTs.jl:318-348)."""
    if r2c:
        assert n_out <= n_over
        return np.arange(n_out, dtype=np.int32)
    ax = np.arange(n_over, dtype=np.int32)
    out = np.empty(n_out, dtype=np.int32)
    if n_out % 2 == 0:
        h = n_out // 2
        if fftshift:
            out[:h] = ax[n_over - h :]  # k < 0
            out[h:] = ax[:h]  # k >= 0
        else:
            out[:h] = ax[:h]
            out[h:] = ax[n_over - h :]
    else:
        h = (n_out - 1) // 2
        if fftshift:
            out[:h] = ax[n_over - h :]
            out[h:] = ax[: h + 1]
        else:
            out[: h + 1] = ax[: h + 1]
            out[h + 1 :] = ax[n_over - h :]
    return out


def truncate_ranges(
    n_out: int, n_over: int, *, r2c: bool, fftshift: bool
) -> Tuple[Tuple[int, int], ...]:
    """The contiguous-slice structure of :func:`non_oversampled_indices`:
    a tuple of ``(src_start, length)`` ranges into the oversampled axis, in
    output order.  The non-oversampled modes always occupy at most two
    contiguous runs of the oversampled FFT axis (k >= 0 at the front,
    k < 0 at the back), so truncation/padding lower to slices and concats —
    important on TPU, where XLA lowers general gathers/scatters far less
    efficiently than dynamic slices."""
    if r2c:
        return ((0, n_out),)
    h_neg = n_out // 2  # count of k < 0 modes
    h_pos = n_out - h_neg  # count of k >= 0 modes (incl. 0)
    if fftshift:
        return ((n_over - h_neg, h_neg), (0, h_pos))
    return ((0, h_pos), (n_over - h_neg, h_neg))


def truncate_axis(x: jnp.ndarray, axis: int, ranges) -> jnp.ndarray:
    """Truncate one axis to the output modes (output-ordered slice concat)."""
    parts = [jax.lax.slice_in_dim(x, s, s + l, axis=axis) for s, l in ranges]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def pad_axis(x: jnp.ndarray, axis: int, ranges, n_over: int) -> jnp.ndarray:
    """Inverse of :func:`truncate_axis`: place the output-ordered input
    segments at their oversampled positions, zero-filling the gap."""
    # Input offsets of each segment, in listed (output) order.
    offs = []
    off = 0
    for _, l in ranges:
        offs.append(off)
        off += l
    segs = sorted(zip(ranges, offs))  # by src_start
    pieces = []
    pos = 0
    zshape = list(x.shape)
    for (s, l), o in segs:
        if s > pos:
            zshape[axis] = s - pos
            pieces.append(jnp.zeros(zshape, dtype=x.dtype))
        pieces.append(jax.lax.slice_in_dim(x, o, o + l, axis=axis))
        pos = s + l
    if pos < n_over:
        zshape[axis] = n_over - pos
        pieces.append(jnp.zeros(zshape, dtype=x.dtype))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=axis)


def _apply_uniform_callback(w: jnp.ndarray, callback) -> jnp.ndarray:
    """Apply the reference-semantics uniform callback ``(w_tuple, idx_tuple)
    -> w_tuple`` at every grid point.  ``w`` has shape ``(C,) + grid_shape``.

    The callback is called ONCE with whole-grid component arrays and
    broadcast per-dimension index arrays (XLA fuses the iotas into the
    surrounding elementwise work — nothing is materialised), the TPU
    counterpart of the reference fusing the callback into its deconvolve
    loops at zero cost (src/NonuniformFFTs.jl:376-464).  Callbacks written
    as jnp expressions vectorise unchanged; data-dependent Python control
    flow was never supported (the values are traced either way)."""
    C = w.shape[0]
    shape = w.shape[1:]
    D = len(shape)
    idx = tuple(
        jax.lax.broadcasted_iota(jnp.int32, shape, d) for d in range(D)
    )
    out = callback(tuple(w[c] for c in range(C)), idx)
    return jnp.stack(list(out))


def deconvolve_truncate(
    uhat_over: jnp.ndarray,  # (C,) + oversampled spectral shape
    index_ranges,  # per-dim tuple of (src_start, length) ranges
    phihat_inv: Sequence[jnp.ndarray],  # per-dim 1/phi_hat at output modes
    normfactor: float,
    callback=None,
) -> jnp.ndarray:
    """Type-1 step (3): truncate the oversampled spectrum to the output modes
    and multiply by ``normfactor / prod_d phi_hat_d`` (reference:
    src/NonuniformFFTs.jl:179-185, 350-414).  Truncation is per-axis slice +
    concat (see :func:`truncate_ranges`)."""
    out = uhat_over
    for d, ranges in enumerate(index_ranges):
        out = truncate_axis(out, 1 + d, ranges)
    D = len(index_ranges)
    scale = jnp.asarray(normfactor, dtype=out.real.dtype)
    out = out * scale
    for d, ph_inv in enumerate(phihat_inv):
        shape = [1] * (D + 1)
        shape[1 + d] = ph_inv.shape[0]
        out = out * ph_inv.reshape(shape)
    if callback is not None:
        out = _apply_uniform_callback(out, callback)
    return out


def deconvolve_pad(
    uhat_k: jnp.ndarray,  # (C,) + output spectral shape
    shape_over_spec: Tuple[int, ...],  # oversampled spectral shape
    index_ranges,  # per-dim tuple of (src_start, length) ranges
    phihat_inv: Sequence[jnp.ndarray],
    callback=None,
) -> jnp.ndarray:
    """Type-2 step (1): scale input modes by ``1 / prod_d phi_hat_d`` and
    place them into the zero-padded oversampled spectrum (reference:
    src/NonuniformFFTs.jl:268-272, 416-480).  Zero-padding is per-axis
    slice + concat — no scatter (serial on TPU)."""
    D = len(index_ranges)
    w = uhat_k
    if phihat_inv is not None:  # None: caller already applied the scaling
        for d, ph_inv in enumerate(phihat_inv):
            shape = [1] * (D + 1)
            shape[1 + d] = ph_inv.shape[0]
            w = w * ph_inv.reshape(shape)
    if callback is not None:
        w = _apply_uniform_callback(w, callback)
    for d, ranges in enumerate(index_ranges):
        w = pad_axis(w, 1 + d, ranges, shape_over_spec[d])
    return w
