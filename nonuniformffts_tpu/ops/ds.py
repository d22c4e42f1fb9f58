"""Double-single (ds) arithmetic helpers for the extended-precision pipeline.

A ds number is an unevaluated pair of f32 values ``(hi, lo)`` with
``|lo| <= ulp(hi)/2``, carrying ~48 significand bits — the classic
double-single / "float-float" representation, which is how a TPU (whose MXU
and VPU are f32-native; f64 is emulated and has no MXU path) can run the
high-accuracy NUFFT regime the reference covers with native Float64
(reference: test/accuracy.jl:7-27 certifies to ~4e-14 in f64).

The blocked extended-precision path (``precision='double'`` on 64-bit-dtype
plans) carries every value-bearing tensor — non-uniform values, spread
buffers, spectra, interpolation results — as (hi, lo) channel pairs through
spread -> DFT -> interpolation, with:

- window weights evaluated by a double-single Horner over (hi, lo)
  coefficient pairs (ds_horner below);
- MXU contractions split as ``hh`` (exact-f32 products at HIGHEST, the
  dominant term) plus ``hl + lh`` cross terms (at DEFAULT: the cross terms
  are ~2^-24 of the total, so one bf16 pass gives them 2^-32 absolute);
- all cross-batch / cross-chunk accumulation compensated with exact TwoSum.

All primitives here are branchless elementwise VPU ops, valid inside Pallas
kernels and in plain jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a + b)."""
    s = a + b
    z = s - a
    e = (a - (s - z)) + (b - z)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (one branchless chain shorter)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _mask_hi(a):
    """Truncate the low 12 mantissa bits with an integer mask: a 12-bit-
    significand high part whose pairwise products are exact in f32.

    Bit ops, not the classic Veltkamp multiply (c = 4097*a; hi = c-(c-a)):
    the float chain is only error-free under strictly-rounded f32, and the
    Pallas interpreter evaluates such chains at higher intermediate
    precision, silently collapsing the split (hi == a, lo == 0) and
    degrading every downstream ds value to f32 (measured 3.3e-8 on a
    minimal interpret kernel vs 3.6e-15 with the mask).  Integer masking
    is precision-independent, and two VPU bit-ops vs three float ops on
    device.

    SCALAR operands keep the Veltkamp chain: Mosaic's tpu.bitcast only
    accepts vectors (scalar sites — the in-kernel normfactor pair — are
    exact under Mosaic's strict f32 and measured exact in interpret)."""
    if getattr(a, "ndim", 0) == 0:
        c = 4097.0 * a  # 2^12 + 1 splits f32's 24-bit mantissa
        return c - (c - a)
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFFF000), jnp.float32
    )


def two_prod(a, b):
    """Exact f32 product a*b = p + e via bit-masked operand splitting (see
    _mask_hi; no FMA on the jnp surface)."""
    p = a * b
    a_hi = _mask_hi(a)
    a_lo = a - a_hi
    b_hi = _mask_hi(b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def ds_add(ah, al, bh, bl):
    """(ah, al) + (bh, bl), renormalised."""
    s, e = two_sum(ah, bh)
    e = e + (al + bl)
    return fast_two_sum(s, e)


def ds_mul(ah, al, bh, bl):
    """(ah, al) * (bh, bl), renormalised (drops the ~2^-48 al*bl term)."""
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return fast_two_sum(p, e)


def ds_scale(ah, al, sh: float, sl: float):
    """(ah, al) * ds scalar (sh, sl) with host-side scalar split."""
    return ds_mul(ah, al, jnp.asarray(sh, ah.dtype), jnp.asarray(sl, ah.dtype))


def split_scalar(x: float):
    """Host-side f64 -> (f32 hi, f32 lo) split."""
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return float(hi), float(lo)


def split_array_np(x: np.ndarray):
    """Host-side f64 array -> (f32 hi, f32 lo) arrays (exact)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def split_array(x: jnp.ndarray):
    """In-graph f64 array -> (f32 hi, f32 lo) (requires x64)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def ds_horner(cs_h: jnp.ndarray, cs_l: jnp.ndarray, zh: jnp.ndarray,
              zl: jnp.ndarray):
    """Double-single Horner: evaluate the tap-major piecewise polynomials at
    the ds coordinate ``(zh, zl)`` with ds coefficient pairs.

    ``cs_h``/``cs_l``: (2M, ncoef) tap-major (see common.coefficient_stack);
    ``zh``/``zl``: (1, P).  Returns the (2M, P) weight pair.  Each step is
    v <- v*z + c in ds arithmetic (TwoProd + TwoSum, lo-terms folded in) —
    the full-pair version of the compensated Horner already used by
    ``precision='double'`` f32 plans (common.window_weights ds=True).
    """
    two_m = cs_h.shape[0]
    P = zh.shape[-1]
    ncoef = cs_h.shape[-1]
    zh_b = jnp.broadcast_to(zh, (two_m, P))
    zl_b = jnp.broadcast_to(zl, (two_m, P))
    vh = jnp.broadcast_to(cs_h[:, ncoef - 1 : ncoef], (two_m, P))
    vl = jnp.broadcast_to(cs_l[:, ncoef - 1 : ncoef], (two_m, P))
    for q in range(ncoef - 2, -1, -1):
        ph, pe = two_prod(vh, zh_b)
        pe = pe + (vh * zl_b + vl * zh_b)
        sh, se = two_sum(ph, jnp.broadcast_to(cs_h[:, q : q + 1], (two_m, P)))
        vl = se + pe + jnp.broadcast_to(cs_l[:, q : q + 1], (two_m, P))
        vh, vl = fast_two_sum(sh, vl)
    return vh, vl


# ---------------------------------------------------------------------------
# Double-single contraction on the MXU: int8 limb cascade with EXACT int32
# accumulation.
#
# This is how a TPU runs an f64-grade dot product at MXU rates: each ds
# operand slice is scaled by a POWER OF TWO (so scaling is error-free),
# split into ``nl`` 7-bit int8 limbs by a round-to-nearest cascade (the lo
# channel folds into the residual stream once the hi residual reaches its
# scale), and the limb products accumulate in int32 — exactly, because
# 7-bit x 7-bit products over K <= ~20k rows stay far below 2^31.  The
# recombine splits each int32 group at 12 bits (both halves exact in f32)
# and TwoSum-accumulates groups smallest-first into an (hi, lo) pair; the
# final power-of-two unscaling is again exact.  End-to-end error is the
# quantisation residual only: ~2^-(7*nl)*|row max|*|col max| per element,
# i.e. ~1e-11-grade output accuracy at nl=6 and ~1e-13 at nl=7, while the
# MXU cost is nl*(nl+1)/2 int8 passes — at the v5e's ~2.65x int8-vs-bf16
# pass rate, nl=6 costs ~1.3x ONE bf16x6 (f32 HIGHEST) dot.
# ---------------------------------------------------------------------------


def _pow2_scale(m: jnp.ndarray):
    """Per-slice power-of-two scale: ``scale = 2^(e+1) > m`` for
    ``m in [2^e, 2^(e+1))``, with its exact inverse; zero slices get 1.
    Built by exponent-field bit surgery (branchless, Mosaic-safe)."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = (bits >> 23) & 0xFF
    one = jnp.int32(127 << 23)
    scale = jax.lax.bitcast_convert_type(
        jnp.where(m > 0, (e + 1) << 23, one), jnp.float32
    )
    inv = jax.lax.bitcast_convert_type(
        jnp.where(m > 0, (253 - e) << 23, one), jnp.float32
    )
    return scale, inv


def ds_limb_cascade(xh: jnp.ndarray, xl, nl: int):
    """Round-to-nearest int8 limb cascade for pre-scaled input (|x| <~ 1).

    Returns ``nl`` int8 limb arrays with ``x ~ sum_q limbs[q] * 2^-7(q+1)``
    to ``2^-(7*nl)`` absolute.  The lo channel (may be None) folds into the
    residual stream once the hi residual reaches the 2^-22 scale.  Peak
    elements clip limb0 at 127; the cascade absorbs the remainder in later
    limbs (the geometric tail sums to 1.0)."""
    limbs = []
    r = xh
    for q in range(nl):
        sh = 7 * (q + 1)
        l = jnp.clip(jnp.floor(r * (2.0 ** sh) + 0.5), -127.0, 127.0)
        r = r - l * (2.0 ** -sh)
        if q == 2 and xl is not None:
            r = r + xl
        limbs.append(l.astype(jnp.int8))
    return limbs


def ds_limb_groups(nl: int):
    """Limb-product groups by shift sum: {g: [(i, j)...]} keeping
    i + j < nl (deeper cross products fall below the quantisation floor)."""
    groups = {}
    for i in range(nl):
        for j in range(nl):
            if i + j < nl:
                groups.setdefault(i + j, []).append((i, j))
    return groups


def ds_limb_recombine(group_fn, nl: int):
    """Shared recombine: ``group_fn(i, j) -> int32 dot``; groups the limb
    products by shift sum, converts each int32 group exactly to ds, and
    TwoSum-accumulates smallest-first.  Returns the unscaled (hi, lo)."""
    groups = ds_limb_groups(nl)
    hi = lo = None
    for g in sorted(groups, reverse=True):
        acc = None
        for i, j in groups[g]:
            p = group_fn(i, j)
            acc = p if acc is None else acc + p
        top, low = _exact_i32_to_ds(acc)
        s2 = 2.0 ** -(7 * (g + 2))
        if hi is None:
            hi, lo = top * s2, low * s2
        else:
            hi, e1 = two_sum(hi, top * s2)
            hi, e2 = two_sum(hi, low * s2)
            lo = lo + e1 + e2
    return fast_two_sum(hi, lo)


def ds_fxp_quant(xh: jnp.ndarray, xl, reduce_dims, nl: int):
    """Quantise a ds (hi, lo) slice into ``nl`` int8 limbs.

    ``xl`` may be None (plain f32 input).  Returns ``(limbs, scale)`` with
    ``scale`` a power of two per non-reduced slice (reduce_dims REMOVED),
    such that ``xh + xl ~ scale * sum_q limbs[q] * 2^-7(q+1)`` to
    ``2^-(7*nl) * scale`` absolute.  Every step is error-free: the
    power-of-two scaling, the cascade subtractions (Sterbenz), and the
    ``l * 2^-s`` products; the single rounding is the lo-channel fold-in at
    ~2^-46 relative.  Peak elements clip limb0 at 127 and the cascade
    absorbs the remainder in later limbs (the geometric tail sums to 1.0)."""
    rd = tuple(reduce_dims)
    m = jnp.max(jnp.abs(xh), axis=rd, keepdims=True)
    scale, inv = _pow2_scale(m)
    limbs = ds_limb_cascade(
        xh * inv, None if xl is None else xl * inv, nl
    )  # power-of-two scaling is exact
    if rd:
        scale = jnp.squeeze(scale, rd)
    return limbs, scale


def _exact_i32_to_ds(acc: jnp.ndarray):
    """int32 -> exact (f32 top, f32 low) split at 12 bits (|acc| < 2^27)."""
    low = (acc & 0xFFF).astype(jnp.float32)
    top = (acc - (acc & 0xFFF)).astype(jnp.float32)
    return top, low


def ds_fxp_contract(albs, sa, blbs, sb, dn, nl: int):
    """Limb-level core of :func:`ds_fxp_dot_general`: pre-quantised limb
    lists + power-of-two scales -> (hi, lo) pair.  Exposed so callers that
    reuse an operand across several dots (the complex pair-dots) quantise
    it once."""
    hi, lo = ds_limb_recombine(
        lambda i, j: jax.lax.dot_general(
            albs[i], blbs[j], dn, preferred_element_type=jnp.int32
        ),
        nl,
    )
    # Exact unscaling: both scales are powers of two.
    s = jnp.expand_dims(sa, tuple(range(sa.ndim, hi.ndim))) * sb
    return hi * s, lo * s


def ds_fxp_dot_general(a, b, dims, nl: int = 6):
    """ds x ds ``dot_general`` with exact integer accumulation.

    ``a``/``b``: (hi, lo) tuples (lo may be None); ``dims`` =
    ``(lhs_contract_dims, rhs_contract_dims)`` as in lax.dot_general.
    Returns the (hi, lo) f32 pair of the product — dims: lhs free then rhs
    free, in order — accurate to ~2^-(7*nl) of |row max|*|col max| per
    output element (quantisation only: accumulation is exact int32 and the
    recombine is compensated).  Works identically under jnp/XLA and inside
    Pallas kernels (elementwise VPU ops + int8 MXU dots only)."""
    lhs_dims, rhs_dims = (tuple(dims[0]), tuple(dims[1]))
    dn = ((lhs_dims, rhs_dims), ((), ()))
    albs, sa = ds_fxp_quant(a[0], a[1], lhs_dims, nl)
    blbs, sb = ds_fxp_quant(b[0], b[1], rhs_dims, nl)
    return ds_fxp_contract(albs, sa, blbs, sb, dn, nl)


def ds_rowsum(ph: jnp.ndarray, pl: jnp.ndarray, axis: int = 0):
    """Compensated reduction over ``axis``: pairwise TwoSum tree, so the only
    uncompensated adds are on the ~2^-48-scale lo channel.  Returns the
    (hi, lo) pair with the reduced axis removed (kept as size 1 then
    squeezed by slicing is up to the caller — here it is dropped)."""
    n = ph.shape[axis]
    while n > 1:
        half = n // 2
        a_h = jax.lax.slice_in_dim(ph, 0, half, axis=axis)
        b_h = jax.lax.slice_in_dim(ph, half, 2 * half, axis=axis)
        a_l = jax.lax.slice_in_dim(pl, 0, half, axis=axis)
        b_l = jax.lax.slice_in_dim(pl, half, 2 * half, axis=axis)
        s, e = two_sum(a_h, b_h)
        l = e + (a_l + b_l)
        if n % 2:
            tail_h = jax.lax.slice_in_dim(ph, 2 * half, n, axis=axis)
            tail_l = jax.lax.slice_in_dim(pl, 2 * half, n, axis=axis)
            s0 = jax.lax.slice_in_dim(s, 0, 1, axis=axis)
            l0 = jax.lax.slice_in_dim(l, 0, 1, axis=axis)
            s0n, e0 = two_sum(s0, tail_h)
            l0n = l0 + e0 + tail_l
            s = jnp.concatenate(
                [s0n, jax.lax.slice_in_dim(s, 1, half, axis=axis)], axis=axis
            ) if half > 1 else s0n
            l = jnp.concatenate(
                [l0n, jax.lax.slice_in_dim(l, 1, half, axis=axis)], axis=axis
            ) if half > 1 else l0n
        ph, pl = s, l
        n = half
    return ph, pl
