"""Blocked TPU fast path: Pallas spread (type-1) and interpolate (type-2).

The hot kernels of the library — the counterpart of the reference's
shared-memory GPU method (src/spreading/gpu.jl:237-434 and
src/interpolation/gpu.jl:211-328), re-architected for the TPU:

- grid = one Pallas program per spatial block; the program reads its
  *contiguous* slice of bin-sorted points (scalar-prefetched segment
  boundaries -> dynamic-sliced DMA of fixed-size point batches);
- per batch, window weights become per-dimension dense matrices and the
  (2M)^D tensor-product scatter/gather becomes an MXU contraction over the
  point batch (spread: K = batch; interp: K = padded y*z plane);
- spreading accumulates into a padded VMEM block; the periodic halo merge is
  a separable roll-and-add in jnp after the kernel (common.overlap_add) —
  no atomics anywhere, by ownership;
- interpolation reads a halo-gathered padded block per program, computes the
  transposed contraction, and DMA-writes each batch's results to its slot
  range (programs run in ascending grid order on TPU, so batch-tail overlap
  into the next block's slots is always overwritten by its owner).

Partial batches are handled by masking the first-dimension window matrix
(spread) or by the ownership-overwrite argument (interp); no dynamic shapes
anywhere.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...blocking import num_blocks
from . import common

TWO_PI = 2.0 * math.pi

# Kernel contraction precision.  Mosaic's dot lowering supports ONLY
# DEFAULT (bf16x1) and HIGHEST (bf16x6) — requesting HIGH raises
# NotImplementedError at compile time on the device (measured; interpret
# mode hides it).  bf16x1 injects ~1e-3 window error, so every accuracy-
# bearing mode maps to HIGHEST; 'default' stays bf16x1 for callers that
# explicitly trade accuracy for speed (and as the pass-count timing
# probe).  The XLA-level matmul-DFT keeps true 3-pass HIGH
# (ops/matmul_fft.py); the int8 'fxp' path is _fxp_dot below.
_PRECS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
    # 'double' runs the kernels' contractions at HIGHEST; the compensated
    # accumulation lives in the DFT drivers (matmul_fft._mm_ds).
    "double": jax.lax.Precision.HIGHEST,
}


def _kprec(plan):
    """Contraction precision for the blocked kernels: the plan's
    ``kernel_precision`` override when set, else its ``precision``."""
    return _PRECS[getattr(plan, "kernel_precision", None) or plan.precision]


#: Valid plan.debug_strip values per kernel direction.  An unrecognized
#: value would silently match no branch and time the full baseline —
#: a zero-cost stage reading in the differencing attribution — so the
#: launchers reject unknown names loudly.
_STRIPS_SPREAD = frozenset(
    {"horner", "weights", "stack", "dot", "acc", "branch", "loop", "dma",
     "nodma", "decode"}
)
_STRIPS_INTERP = frozenset(
    {"horner", "weights", "dot", "rowsum", "branch", "loop", "dma", "nodma",
     "decode"}
)


def _check_strip(plan, allowed, W, W1):
    s = plan.debug_strip
    if s is None:
        return
    if s not in allowed:
        raise ValueError(
            f"unknown debug_strip {s!r}; valid here: {sorted(allowed)}"
        )
    if s == "branch" and not (W and not W1):
        # 'branch' only replaces the windowed dispatch; without an active
        # dim-0-only window it would silently time the baseline.
        raise ValueError(
            "debug_strip='branch' requires the dim-0 window active without "
            f"a dim-1 window (got W={W}, W1={W1})"
        )


# Limb scales for the int8 fixed-point contraction ('fxp'): three 7-bit
# limbs at 2^-7 / 2^-14 / 2^-22 cover an operand in [-1, 1] to ~2^-23 —
# the same coverage as HIGHEST's three bf16 limbs — while the v5e MXU runs
# int8 x int8 -> int32 at 2x the bf16 pass rate (scripts/exp_int8.py:
# 277.7 Top/s vs 104.8 Tflop/s bf16), and the int32 accumulation is EXACT
# (max K = 1024-point batches x 127^2 products < 2^31).  Of the nine limb
# products only six exceed ~2^-24 and are kept; the scheme is the int8
# twin of XLA's bf16x6, at half the MXU passes-equivalent.
_FXP_SHIFTS = (7, 14, 22)


def _rn(x):
    """Round-to-nearest (half up) via floor(x + 0.5) — two cheap VPU ops
    whose result does not depend on the executor's float semantics.  The
    magic-number trick ((x + 1.5*2^23) - 1.5*2^23) is NOT safe here: the
    Pallas interpreter evaluates it at higher precision, turning the round
    into the identity, which leaves non-integer limb0 values whose int8
    cast truncates (measured 4e-2 end-to-end); jnp.round's device lowering
    was similarly unreliable on the first probe."""
    return jnp.floor(x + 0.5)


def _fxp_split3(x):
    """Split ``x`` (f32, |x| <= 1) into three int8 limbs (VPU, in-VMEM).

    Nearest rounding bounds each residual by half an ulp, so limbs 2 and 3
    stay within +-64 / +-128; the clip only acts on the rare exact-boundary
    l2 = 128 case (residual <= 2^-22 there)."""
    limbs = []
    r = x
    for sh in _FXP_SHIFTS:
        l = jnp.clip(_rn(r * (2.0**sh)), -127.0, 127.0)
        r = r - l * (2.0**-sh)
        limbs.append(l.astype(jnp.int8))
    return limbs


def _fxp_dot(a, b, dims, out_dtype):
    """``dot_general(a, b)`` over contracting ``dims`` via six int8 MXU
    products with exact int32 accumulation (f32-grade result at ~2x the
    HIGHEST pass rate).

    ``b`` must already be in [-1, 1] (window-weight matrices are peak-
    normalised); ``a`` is normalised here PER ROW (its contracting dim must
    be dim 1) so every output row sees quantisation noise relative to its
    own magnitude, not the batch max — one VPU row-reduction that folds
    back into the recombine as a row-broadcast multiply.  Both sides carry
    a (1 - 2^-6) margin so elements at the scale peak (weights == 1.0, the
    row-max value) keep limb0 = rn(x*128) <= 127 — without it the
    first-limb clip leaves ~2^-14 residuals on near-peak elements
    (measured 1.2e-5 end-to-end)."""
    s0, s1, s2 = _FXP_SHIFTS
    margin = 1.0 - 2.0**-6
    a_scale = jnp.max(jnp.abs(a), axis=1, keepdims=True) * (1.0 / margin)
    inv = jnp.where(a_scale > 0, 1.0 / a_scale, 1.0)
    al = _fxp_split3(a * inv)
    bl = _fxp_split3(b * margin)
    a_scale = a_scale * (1.0 / margin)  # undo the b-side margin at recombine
    dn = (dims, ((), ()))

    def d8(x, y):
        return jax.lax.dot_general(
            x, y, dn, preferred_element_type=jnp.int32
        )

    p00 = d8(al[0], bl[0])
    p1 = d8(al[0], bl[1]) + d8(al[1], bl[0])
    p11 = d8(al[1], bl[1])
    p2 = d8(al[0], bl[2]) + d8(al[2], bl[0])
    out = (
        p00.astype(jnp.float32) * (2.0 ** -(2 * s0))
        + p1.astype(jnp.float32) * (2.0 ** -(s0 + s1))
        + p11.astype(jnp.float32) * (2.0 ** -(2 * s1))
        + p2.astype(jnp.float32) * (2.0 ** -(s0 + s2))
    )
    return (out * a_scale).astype(out_dtype)


def _kdot(plan, a, b, dims, out_dtype):
    """The kernels' contraction primitive: int8 fixed-point when the plan's
    kernel_precision is 'fxp', else a dot_general at the mapped precision.
    ``a`` is the dynamic-range side (values / grid), ``b`` the weight side."""
    kp = getattr(plan, "kernel_precision", None) or plan.precision
    if kp == "fxp":
        return _fxp_dot(a, b, dims, out_dtype)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=out_dtype,
        precision=_PRECS[kp],
    )


# ---------------------------------------------------------------------------
# Component packing: complex data <-> real channels (CR = C or 2C)
# ---------------------------------------------------------------------------


def pack_components(x: jnp.ndarray, is_complex: bool) -> jnp.ndarray:
    """(C, ...) complex -> (2C, ...) real (re/im interleaved per component);
    real data passes through."""
    if not is_complex:
        return x
    C = x.shape[0]
    return jnp.stack([x.real, x.imag], axis=1).reshape((2 * C,) + x.shape[1:])


def unpack_components(x: jnp.ndarray, is_complex: bool) -> jnp.ndarray:
    if not is_complex:
        return x
    C2 = x.shape[0]
    y = x.reshape((C2 // 2, 2) + x.shape[1:])
    return jax.lax.complex(y[:, 0], y[:, 1])


def _geometry(plan):
    D = plan.ndim
    m = plan.m
    bdims = plan.block_dims
    nb = num_blocks(plan.shape_over, bdims)
    pd = (
        plan.padded_dims
        if plan.padded_dims is not None
        else common.padded_block_dims(bdims, m)
    )
    yz = 1
    for p in pd[1:]:
        yz *= p
    return D, m, bdims, nb, pd, yz


def _decompose_block(b, nb):
    """Row-major decomposition of the flat block id (matches
    blocking.compute_block_ids)."""
    D = len(nb)
    out = []
    rem = b
    for d in range(D):
        stride = 1
        for q in range(d + 1, D):
            stride *= nb[q]
        out.append(rem // stride)
        rem = rem % stride
    return out


def _blocks_buffer_shape(CR, nb, pd, yz):
    """Kernel-side layout: (CR, nb0, .., nbD-1, p0, YZ) with the trailing
    padded dims kept *flat* (Mosaic requires the last two block dims to span
    the array, and cannot split the lane dim in an in-kernel reshape; the
    split to (p1, p2, ...) happens for free on the HBM array in jnp)."""
    return (CR,) + tuple(nb) + (pd[0], yz)


def _block_shape(CR, nb, pd, yz):
    return (CR,) + (1,) * len(nb) + (pd[0], yz)


def _block_index_map(D, nb):
    def index_map(b, *prefetch_refs):
        bids = _decompose_block(b, nb)
        return (0,) + tuple(bids) + (0, 0)

    return index_map


def _build_wts_from_cells(plan, cells, fracs_rows, cs_ref, valid, pd, P,
                          window=None):
    """Per-dimension transposed window matrices for one point batch.

    ``cells``: list of D (1, P) int32 *block-local* cell indices;
    ``fracs_rows``: list of D (1, P) in-cell fractions.  ``valid`` (optional
    (1, P) bool) zeroes the dim-0 weights of masked lanes (packed-layout
    edge batches; the counterpart of the slot layout's zero-value padding).
    With ``window = (W, r0)`` the dim-0 matrix is the (W, P) windowed form
    (common.build_wt_matrix_window)."""
    D = plan.ndim
    wts = []
    for d in range(D):
        vlist = common.window_weights(
            plan.kernel_data[d], plan.evalmode, fracs_rows[d], cs_ref[d],
            ds=(plan.precision == "double"),
        )
        if d == 0 and valid is not None:
            vlist = jnp.where(valid, vlist, 0.0)
        if d == 0 and window is not None:
            W, r0 = window
            wts.append(
                common.build_wt_matrix_window(
                    vlist, cells[0], 0, plan.m, W, P, r0
                )
            )
        else:
            wts.append(
                common.build_wt_matrix(
                    vlist, cells[d], 0, plan.m, pd[d], P, plan.block_dims[d]
                )
            )
    return wts


def _decode_slots(plan, pts_b, origins):
    """Slot layout: rows [c0.., cD-1, f0.., fD-1] with global cells as exact
    floats; localise against the program's block origin."""
    D = plan.ndim
    cells = [
        pts_b[d : d + 1, :].astype(jnp.int32) - origins[d] for d in range(D)
    ]
    fracs = [pts_b[D + d : D + d + 1, :] for d in range(D)]
    return cells, fracs, None


def _decode_packed(plan, pts_b):
    """Packed layout: rows [key_bits, f0.., fD-1, idx_bits, c0.., cD-1].
    Local cells arrive pre-decoded from set_points' single vectorised pass
    (blocking.packed_layout) in the trailing rows — reading them replaces
    the per-batch key divmod chain that used to sit on the critical path
    before the weight build (edge lanes from neighbour blocks carry
    in-range local cells of *their* block — harmless, they are masked)."""
    D = plan.ndim
    if pts_b.dtype == jnp.float64:
        idx = pts_b[1 + D : 2 + D, :].astype(jnp.int32)
    else:
        idx = jax.lax.bitcast_convert_type(pts_b[1 + D : 2 + D, :], jnp.int32)
    cells = [
        pts_b[2 + D + d : 3 + D + d, :].astype(jnp.int32) for d in range(D)
    ]
    fracs = [pts_b[1 + d : 2 + d, :] for d in range(D)]
    return cells, fracs, idx


def _stack_weighted(w: jnp.ndarray, vals_b: jnp.ndarray, CR: int):
    """Channel-stacked weighted rows: out[c*R + r, p] = w[r, p] * v[c, p].

    Per-channel sublane-broadcast multiplies + one concat — replaces the
    round-1 0/1 selector matmul, whose K=CR 6-pass HIGHEST dot cost ~0.5 us
    of MXU pipeline drain per batch (measured round 2: the selector dots
    were ~20%% of the kernel time)."""
    return jnp.concatenate(
        [w * vals_b[c : c + 1, :] for c in range(CR)], axis=0
    )


def _channel_rowsum(t: jnp.ndarray, w: jnp.ndarray, CR: int, R: int,
                    scale: float = 1.0):
    """Per-channel weighted row reduction: out[c, p] = scale * sum_r
    t[c*R + r, p] * w[r, p] — the interp-side replacement of the 0/1
    channel-sum selector matmul (cross-sublane jnp.sum lowers to log-depth
    shuffles on the VPU, far cheaper than a tiny M=CR 6-pass dot).  ``scale``
    fuses the type-2 cell-volume prefactor (reference:
    interpolation/gpu.jl:55-56) into the per-batch epilogue, replacing a
    full-length post-pass over the slot array."""
    out = jnp.concatenate(
        [
            jnp.sum(
                jax.lax.slice_in_dim(t, c * R, (c + 1) * R, axis=0) * w,
                axis=0,
                keepdims=True,
            )
            for c in range(CR)
        ],
        axis=0,
    )
    if scale != 1.0:
        out = out * jnp.asarray(scale, out.dtype)
    return out


def _qt_matrix(wts, yz, P):
    """Combined trailing-dims window matrix QT (YZ, P): Khatri-Rao of the
    per-dim transposed windows.  The (p1, p2, P) -> (YZ, P) reshape is
    tile-aligned because trailing padded dims are rounded to the sublane
    granule (common.padded_block_dims)."""
    if len(wts) == 1:
        return jnp.ones((1, P), dtype=wts[0].dtype)
    if len(wts) == 2:
        return wts[1]
    return (wts[1][:, None, :] * wts[2][None, :, :]).reshape(yz, P)


# ---------------------------------------------------------------------------
# Z-form layout helpers: buffer (CR, nb0, pd0, [nb1, pd1,] nb_last*pd_last)
# with ONLY the last padded dim in lanes (128-aligned); all other padded
# dims live in MXU rows.  The blockform DFT contracts this layout natively
# in both directions (matmul_fft.forward_dft_blockform_z), so there is no
# relayout transpose anywhere between the kernels and the DFT.
# ---------------------------------------------------------------------------


def _z_buffer_shape(CR, nb, pd):
    shape = [CR]
    for d in range(len(nb) - 1):
        shape += [nb[d], pd[d]]
    shape.append(nb[-1] * pd[-1])
    return tuple(shape)


def _z_block_shape(CR, nb, pd):
    shape = [CR]
    for d in range(len(nb) - 1):
        shape += [1, pd[d]]
    shape.append(pd[-1])
    return tuple(shape)


def _z_index_map(D, nb):
    def index_map(b, *prefetch_refs):
        bids = _decompose_block(b, nb)
        out = [0]
        for d in range(D - 1):
            out += [bids[d], 0]
        out.append(bids[-1])
        return tuple(out)

    return index_map


def _rows_mid(pd):
    rm = 1
    for p in pd[1:-1]:
        rm *= p
    return rm


def _z_wrows(w0, mids, P):
    """Khatri-Rao stack of the dim-0 window (W0, P) with the full middle-dim
    windows [(pd_d, P)...] into the z-form row matrix (W0*prod(pd_mid), P).
    Leading-dim merges only — tile-aligned because the middle padded dims
    are 8-multiples."""
    w = w0
    for wm in mids:
        w = (w[:, None, :] * wm[None, :, :]).reshape(
            w.shape[0] * wm.shape[0], P
        )
    return w


# ---------------------------------------------------------------------------
# Spreading (type 1)
# ---------------------------------------------------------------------------


NBUF = 4  # DMA pipeline depth at SUPER == 1 (see _spread_kernel)
# Pipeline depth for super-batched DMA.  Measured (round-4 strip ladder,
# rho=1 (48,8,96)@384 super=4): depth 4 is bit-identical in time to depth 2
# (spread 155.47 vs 155.43 ms full, 76.6 vs 78.5 ms stripped-empty) -- the
# pipeline floor is NOT outstanding-descriptor starvation, so keep the
# smaller buffer (VMEM pressure feeds the 9 MiB cliff).
NBUF_SUPER = 2
SUPER_DEFAULT = 4  # batches per DMA descriptor (plan.dma_super)


def _nbuf(SUPER: int) -> int:
    return NBUF if SUPER == 1 else NBUF_SUPER


#: pts++vals operand bytes above which the spread launcher ships points and
#: values as separate HBM operands instead of one concatenated array.  The
#: concat is one DMA descriptor per super-batch (the fast default); at
#: rho = 10 (167.8M points) the (16, Np) temp alone is 10 GB and the
#: transform OOMs 16 GB HBM, so huge plans pay the second descriptor
#: (~1.5 us per super-batch, ~4% at rho = 10) to halve peak memory.
PV_SPLIT_BYTES = 2 << 30


class _CopyPair:
    """Two async copies driven as one (split pts/vals DMA)."""

    def __init__(self, a, b):
        self._copies = (a, b)

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _pack_r01(r0s, r1s):
    """Pack the per-batch window row starts into ONE scalar-prefetch operand.

    Scalar-prefetch operands live in SMEM (1 MB): two separate s32 arrays of
    nbatches entries blow the budget at high density (131k batches at rho=1
    -> 2 x 516 KB, the round-3 device SMEM OOM).  Both values are small
    non-negative ints or the -1 full-fallback sentinel, so they ride one
    word as (r0+1) | ((r1+1) << 16)."""
    import jax.numpy as jnp

    enc0 = r0s + 1
    enc1 = (r1s + 1) if r1s is not None else jnp.zeros_like(r0s)
    return (enc0 | (enc1 << 16)).astype(jnp.int32)


def _unpack_r0(r01s_ref, idx):
    return (r01s_ref[idx] & 0xFFFF) - 1


def _unpack_r01(r01s_ref, idx):
    v = r01s_ref[idx]
    return (v & 0xFFFF) - 1, (v >> 16) - 1


def _spread_kernel(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, pv_hbm, cs_ref,
    out_ref, acc_ref, pv_buf, sem_pv,
    *, plan, CR, DP, nb, pd, yz, P, W, layout, SUPER,
):
    b = pl.program_id(0)
    bids = _decompose_block(b, nb)
    # offset_ref: per-dim block offset of this device's block range within
    # the global grid (zero on a single chip; the spatially-sharded path
    # passes the chip's block-row offset so cell arithmetic stays global).
    origins = [
        (offset_ref[d] + bids[d]) * plan.block_dims[d] for d in range(plan.ndim)
    ]
    start_b = starts_ref[b]  # segment boundaries in units of P
    nbatch = starts_ref[b + 1] - start_b
    if layout == "packed":
        # Packed layout: batches are 128-aligned windows of the SORTED point
        # array covering this block's range [s0, s1); edge lanes belonging
        # to neighbour blocks are masked via ``valid`` below.
        s0 = pstarts_ref[b]
        s1 = pstarts_ref[b + 1]
        base = (s0 // P) * P
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # Pipelined DMA of the combined (points ++ values) rows, SUPER batches
    # per descriptor: the scalar core's per-descriptor issue cost (~1-2 us,
    # round-1 profiling) exceeds a single batch's compute, so descriptors
    # carry SUPER*P lanes and the inner loop peels P-wide sub-batches at
    # traced 128-aligned lane offsets (no static slot branching needed —
    # Mosaic supports dynamic lane slices with a multiple_of proof).
    def dma(slot, j):
        if layout == "packed":
            off = pl.multiple_of(base + j * SB, P)
        else:
            off = pl.multiple_of((start_b + j * SUPER) * P, P)
        dst = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            pv_hbm.at[:, pl.ds(off, SB)],
            pv_buf.at[:, pl.ds(dst, SB)],
            sem_pv.at[slot],
        )

    for j in range(NB - 1):
        @pl.when(j < nsuper)
        def _(j=j):
            dma(j, j).start()

    def decode(pv_b, i):
        pts_b = pv_b[:DP]
        if layout == "packed":
            cells, fracs, _ = _decode_packed(plan, pts_b)
            pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            valid = (pos >= s0) & (pos < s1)
        else:
            cells, fracs, _ = _decode_slots(plan, pts_b, origins)
            valid = None
        return cells, fracs, valid

    def compute(pv_b, i):
        cells, fracs, valid = decode(pv_b, i)
        vals_b = pv_b[DP:]
        # Slot layout: padding slots carry zero values, no masking needed.
        # Packed layout: edge lanes are masked out of the dim-0 weights.
        wts = _build_wts_from_cells(plan, cells, fracs, cs_ref, valid, pd, P)
        qt = _qt_matrix(wts, yz, P)
        # Channel-stacked contraction: Wv[c*p0 + x, p] = W0T[x, p] * v[c, p],
        # acc (CR*p0, YZ) += sum_p Wv[cx, p] qt[yz, p].  One matmul with
        # M = CR*p0: MXU row utilisation and CR scaling both come from the
        # stacking (no Python channel loop in the contraction).
        wv = _stack_weighted(wts[0], vals_b, CR)  # (CR*p0, P)
        prod = _kdot(plan, wv, qt, ((1,), (1,)), acc_ref.dtype)
        acc_ref[...] = acc_ref[...] + prod

    def compute_win(pv_b, i, r0):
        # Windowed path: this batch's points only touch rows [r0, r0+W) of
        # the padded block (sub-sorted by dim-0 cell; the layout certified
        # no left-edge wrap), so the contraction runs with M = CR*W rows
        # and accumulates at a dynamic 8-aligned sublane offset.
        cells, fracs, valid = decode(pv_b, i)
        vals_b = pv_b[DP:]
        wts = _build_wts_from_cells(
            plan, cells, fracs, cs_ref, valid, pd, P, window=(W, r0)
        )
        qt = _qt_matrix(wts, yz, P)
        wv = _stack_weighted(wts[0], vals_b, CR)  # (CR*W, P)
        prod = _kdot(plan, wv, qt, ((1,), (1,)), acc_ref.dtype)  # (CR*W, yz)
        for c in range(CR):
            off = pl.multiple_of(c * pd[0] + r0, 8)  # r0 is 8-aligned
            win = acc_ref[pl.ds(off, W), :]
            acc_ref[pl.ds(off, W), :] = win + jax.lax.slice_in_dim(
                prod, c * W, (c + 1) * W, axis=0
            )

    nr = r01s_ref.shape[0]

    def body(i, carry):
        slot = i % NB

        @pl.when(i + NB - 1 < nsuper)
        def _():
            dma((i + NB - 1) % NB, i + NB - 1).start()

        dma(slot, i).wait()
        for k in range(SUPER):
            gi = i * SUPER + k
            src = pl.multiple_of(slot * SB + k * P, P)
            pv_b = pv_buf[:, pl.ds(src, P)]
            if W:
                r0 = _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1))

                @pl.when((gi < nbatch) & (r0 >= 0))
                def _(pv_b=pv_b, gi=gi, r0=r0):
                    compute_win(pv_b, gi, r0)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pv_b=pv_b, gi=gi):
                    compute(pv_b, gi)
            else:
                @pl.when(gi < nbatch)
                def _(pv_b=pv_b, gi=gi):
                    compute(pv_b, gi)

        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)
    # Un-stack channels with static sublane slices (one write per channel;
    # a (CR*p0, yz) -> (CR, 1.., p0, yz) reshape would be a boundary-
    # crossing relayout Mosaic lowers as an unsupported gather).
    for c in range(CR):
        out_ref[(c,) + (0,) * len(nb)] = jax.lax.slice_in_dim(
            acc_ref[...], c * pd[0], (c + 1) * pd[0], axis=0
        )


def _spread_kernel_z(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, *args,
    plan, CR, DP, nb, pd, P, W, W1, layout, SUPER, SPLIT=False,
):
    """Z-form spreading: accumulator (CR*pd0*prod(pd_mid), pd_last); the
    x-window lives in MXU rows (M = CR*W0*prod(pd_mid)), the contraction's
    lane width is only pd_last.  Per-point dense-window MACs drop from
    CR*W0*prod(pd[1:]) to CR*W0*prod(pd_mid)*pd_last == the same...
    crucially with pd_mid in the cheap M dimension instead of lanes, and
    the buffer layout needs zero relayout against the blockform DFT.

    With ``W1`` (D >= 3) the accumulator is the 3D view (CR*pd0, pd1,
    pd_last) and batches whose points also span a narrow dim-1 window
    contract M = CR*W0*W1 rows, accumulating into a 2D (dim-0 leading,
    dim-1 8-aligned sublane) window — the high-density regime where one
    batch sits inside a single dim-0 slab."""
    # Huge-Np plans (SPLIT) ship points and values as SEPARATE HBM operands
    # (two DMA descriptors per super-batch) so the launcher never
    # materialises the 10 GB pts++vals concat a rho=10 transform would need
    # (167.8M points OOMed the 16 GB HBM in round 4).
    if SPLIT:
        pts_hbm, vals_hbm, cs_ref, out_ref = args[:4]
        scratch = args[4:]
        pv_hbm = None
    else:
        pv_hbm, cs_ref, out_ref = args[:3]
        scratch = args[3:]
    if plan.spread_acc2:
        acc_ref, acc2_ref = scratch[0], scratch[1]
        rest = scratch[2:]
    else:
        acc_ref, acc2_ref = scratch[0], None
        rest = scratch[1:]
    if SPLIT:
        # Values get their OWN VMEM buffer (CR rows, full-row DMAs):
        # Mosaic cannot slice a tiled VMEM memref at a non-8-multiple
        # sublane SIZE, so the 2-row value DMA may not target a sublane
        # window of the point buffer.
        pv_buf, vals_vmem, sem_pv, sem_vals = rest[:4]
    else:
        pv_buf, sem_pv = rest[:2]
        vals_vmem = sem_vals = None
    D = plan.ndim
    b = pl.program_id(0)
    start_b = starts_ref[b]
    nbatch = starts_ref[b + 1] - start_b
    if layout == "packed":
        s0 = pstarts_ref[b]
        s1 = pstarts_ref[b + 1]
        base = (s0 // P) * P
    rm = _rows_mid(pd)
    pdL = pd[-1]
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    acc_ref[...] = jnp.zeros_like(acc_ref)
    if acc2_ref is not None:
        acc2_ref[...] = jnp.zeros_like(acc2_ref)

    def dma(slot, j):
        if layout == "packed":
            off = pl.multiple_of(base + j * SB, P)
        else:
            off = pl.multiple_of((start_b + j * SUPER) * P, P)
        dst = pl.multiple_of(slot * SB, P)
        if SPLIT:
            # vals_hbm is UNPADDED (CR rows); it lands in its own CR-row
            # VMEM buffer with a full-row DMA (no sublane slicing).
            return _CopyPair(
                pltpu.make_async_copy(
                    pts_hbm.at[:, pl.ds(off, SB)],
                    pv_buf.at[:, pl.ds(dst, SB)],
                    sem_pv.at[slot],
                ),
                pltpu.make_async_copy(
                    vals_hbm.at[:, pl.ds(off, SB)],
                    vals_vmem.at[:, pl.ds(dst, SB)],
                    sem_vals.at[slot],
                ),
            )
        return pltpu.make_async_copy(
            pv_hbm.at[:, pl.ds(off, SB)],
            pv_buf.at[:, pl.ds(dst, SB)],
            sem_pv.at[slot],
        )

    if plan.debug_strip != "nodma":
        for j in range(NB - 1):
            @pl.when(j < nsuper)
            def _(j=j):
                dma(j, j).start()

    def decode(pv_b, i):
        if plan.debug_strip == "decode":
            # Stage attribution: constant cells/fracs with a thin data
            # dependence on the DMA'd rows (so the buffer read stays).
            z = pv_b[:1, :] * 0.0
            cells = [z.astype(jnp.int32) for _ in range(D)]
            fracs = [z + 0.5 for _ in range(D)]
            return cells, fracs, None
        pts_b = pv_b[:DP]
        if layout == "packed":
            cells, fracs, _ = _decode_packed(plan, pts_b)
            pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            valid = (pos >= s0) & (pos < s1)
        else:
            bids = _decompose_block(b, nb)
            origins = [
                (offset_ref[d] + bids[d]) * plan.block_dims[d]
                for d in range(D)
            ]
            cells, fracs, _ = _decode_slots(plan, pts_b, origins)
            valid = None
        return cells, fracs, valid

    strip = plan.debug_strip

    def _ww(d, frac):
        if strip == "horner":
            return jnp.full((2 * plan.m, P), 0.5, frac.dtype)
        return common.window_weights(
            plan.kernel_data[d], plan.evalmode, frac, cs_ref[d],
            ds=(plan.precision == "double"),
        )

    def weights(cells, fracs, valid, window, window_y=None):
        if strip == "weights":
            # Stage attribution: stand-in constants for the whole decode ->
            # weight-matrix chain (decode DCEs away with it).
            if window is not None and window_y is not None:
                rows = W * W1
            elif window is not None:
                rows = W * rm
            else:
                rows = pd[0] * rm
            dt = fracs[0].dtype
            return jnp.full((rows, P), 0.5, dt), jnp.full((pdL, P), 0.5, dt)
        vl0 = _ww(0, fracs[0])
        if valid is not None:
            vl0 = jnp.where(valid, vl0, 0.0)
        if window is None:
            w0 = common.build_wt_matrix(
                vl0, cells[0], 0, plan.m, pd[0], P, plan.block_dims[0],
                shifted=True,
            )
        else:
            w0 = common.build_wt_matrix_window(
                vl0, cells[0], 0, plan.m, W, P, window, shifted=True
            )
        mids = []
        for d in range(1, D - 1):
            vl = _ww(d, fracs[d])
            if d == 1 and window_y is not None:
                mids.append(
                    common.build_wt_matrix_window(
                        vl, cells[d], 0, plan.m, W1, P, window_y, shifted=True
                    )
                )
            else:
                mids.append(
                    common.build_wt_matrix(
                        vl, cells[d], 0, plan.m, pd[d], P, plan.block_dims[d],
                        shifted=True,
                    )
                )
        vl = _ww(D - 1, fracs[D - 1])
        wlast = common.build_wt_matrix(
            vl, cells[D - 1], 0, plan.m, pdL, P, plan.block_dims[D - 1],
            shifted=True,
        )
        return _z_wrows(w0, mids, P), wlast

    def _dot(wv, wlast, out_dtype):
        if strip == "dot":
            # Static lane slice + scalar multiply (a lane-broadcast of
            # wv[:, :1] inside the scf.if crashed Mosaic's vector layout
            # pass at the rho=1 geometry).
            n = wlast.shape[0]
            return (
                jax.lax.slice(wv, (0, 0), (wv.shape[0], n)) * wlast[0, 0]
            ).astype(out_dtype)
        return _kdot(plan, wv, wlast, ((1,), (1,)), out_dtype)

    def _accumulate(aref, prod):
        """strip == 'acc': fixed tiny-window RMW — keeps the dot alive,
        removes the full accumulator read-modify-write and its dynamic
        offsets.  Returns True when it handled the accumulation."""
        if strip != "acc":
            return False
        sl = jax.lax.slice_in_dim(prod, 0, 8, axis=0)  # (8, pdL)
        if aref.ndim == 3:
            aref[pl.ds(0, 8), 0, :] = aref[pl.ds(0, 8), 0, :] + sl
        else:
            aref[pl.ds(0, 8), :] = aref[pl.ds(0, 8), :] + sl
        return True

    def _touch(pv_b, aref):
        """strip == 'loop': minimal batch body — keeps the DMA pipeline and
        loop/branch scaffolding alive, skips decode/weights/dot/acc."""
        t = pv_b[:8, :1]
        if aref.ndim == 3:
            aref[pl.ds(0, 8), 0, :] = aref[pl.ds(0, 8), 0, :] + t
        else:
            aref[pl.ds(0, 8), :] = aref[pl.ds(0, 8), :] + t

    def _stack(wr, vals_b):
        if strip == "stack":
            return (
                jnp.broadcast_to(wr[:1, :], (CR * wr.shape[0], P))
                + vals_b[0, 0]
            )
        return _stack_weighted(wr, vals_b[:CR, :], CR)

    # With the dim-1 window active the accumulator scratch is the 3D view
    # (CR*pd0, rm, pdL): dim-0 offsets land on the untiled leading dim
    # (granule 1) and dim-1 offsets on the 8-aligned sublane dim.
    acc3 = W1 is not None

    def compute(pv_b, vb, i, aref):
        cells, fracs, valid = decode(pv_b, i)
        vals_b = vb
        wr, wlast = weights(cells, fracs, valid, None)  # (pd0*rm, P), (pdL, P)
        wv = _stack(wr, vals_b)  # (CR*pd0*rm, P)
        prod = _dot(wv, wlast, aref.dtype)
        if _accumulate(aref, prod):
            return
        if acc3:
            aref[...] = aref[...] + prod.reshape(CR * pd[0], rm, pdL)
        else:
            aref[...] = aref[...] + prod

    def compute_win(pv_b, vb, i, r0, aref):
        cells, fracs, valid = decode(pv_b, i)
        vals_b = vb
        wr, wlast = weights(cells, fracs, valid, r0)  # (W*rm, P), (pdL, P)
        wv = _stack(wr, vals_b)  # (CR*W*rm, P)
        prod = _dot(wv, wlast, aref.dtype)  # (CR*W*rm, pdL)
        if _accumulate(aref, prod):
            return
        for c in range(CR):
            sl = jax.lax.slice_in_dim(
                prod, c * W * rm, (c + 1) * W * rm, axis=0
            )
            if acc3:
                off = c * pd[0] + r0
                win = aref[pl.ds(off, W), :, :]
                aref[pl.ds(off, W), :, :] = win + sl.reshape(W, rm, pdL)
            else:
                # Offset is a multiple of rm (pd1, an 8-multiple) for D=3;
                # for D=2 rm=1 and r0 itself is 8-aligned.
                off = pl.multiple_of((c * pd[0] + r0) * rm, 8)
                win = aref[pl.ds(off, W * rm), :]
                aref[pl.ds(off, W * rm), :] = win + sl

    def compute_win2(pv_b, vb, i, r0, r1, aref):
        # 2D (dim-0, dim-1) window: M = CR*W*W1 contraction rows.
        cells, fracs, valid = decode(pv_b, i)
        vals_b = vb
        wr, wlast = weights(cells, fracs, valid, r0, r1)  # (W*W1, P)
        wv = _stack(wr, vals_b)  # (CR*W*W1, P)
        prod = _dot(wv, wlast, aref.dtype)  # (CR*W*W1, pdL)
        if _accumulate(aref, prod):
            return
        r1a = pl.multiple_of(r1, 8)
        for c in range(CR):
            off = c * pd[0] + r0
            win = aref[pl.ds(off, W), pl.ds(r1a, W1), :]
            aref[pl.ds(off, W), pl.ds(r1a, W1), :] = (
                win
                + jax.lax.slice_in_dim(
                    prod, c * W * W1, (c + 1) * W * W1, axis=0
                ).reshape(W, W1, pdL)
            )

    nr = r01s_ref.shape[0]

    def body(i, carry):
        slot = i % NB

        if strip != "nodma":
            @pl.when(i + NB - 1 < nsuper)
            def _():
                dma((i + NB - 1) % NB, i + NB - 1).start()

            dma(slot, i).wait()
        if strip == "dma":
            # Stage attribution: DMA pipeline alive, batch loop gone.  One
            # static-offset touch keeps a data dependence on the buffer
            # (clamped to the buffer's actual rows: slotted-layout plans
            # carry only 2*ndim point rows).
            tr = min(8, pv_buf.shape[0])
            t = pv_buf[:tr, :pdL]
            if acc3:
                acc_ref[pl.ds(0, tr), 0, :] = acc_ref[pl.ds(0, tr), 0, :] + t
            else:
                acc_ref[pl.ds(0, tr), :] = acc_ref[pl.ds(0, tr), :] + t
            return carry
        for k in range(SUPER):
            gi = i * SUPER + k
            src = pl.multiple_of(slot * SB + k * P, P)
            pv_b = pv_buf[:, pl.ds(src, P)]
            vb = vals_vmem[:, pl.ds(src, P)] if SPLIT else pv_b[DP:]
            # Ping-pong accumulator (spread_acc2): alternate batches write
            # disjoint scratch so batch k+1's contraction is not serialised
            # behind batch k's accumulator read-modify-write.
            aref = acc2_ref if (acc2_ref is not None and k % 2) else acc_ref
            if strip == "loop":
                @pl.when(gi < nbatch)
                def _(pv_b=pv_b, aref=aref):
                    _touch(pv_b, aref)
            elif strip == "branch" and W and not W1:
                # Unconditional windowed compute with a clamped row start:
                # times the cost of the r0 fallback branch machinery.
                r0 = jnp.maximum(
                    _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1)), 0
                )

                @pl.when(gi < nbatch)
                def _(pv_b=pv_b, vb=vb, gi=gi, r0=r0, aref=aref):
                    compute_win(pv_b, vb, gi, r0, aref)
            elif W and W1:
                r0, r1 = _unpack_r01(
                    r01s_ref, jnp.minimum(start_b + gi, nr - 1)
                )

                @pl.when((gi < nbatch) & (r1 >= 0))
                def _(pv_b=pv_b, vb=vb, gi=gi, r0=r0, r1=r1, aref=aref):
                    compute_win2(pv_b, vb, gi, r0, r1, aref)

                @pl.when((gi < nbatch) & (r1 < 0) & (r0 >= 0))
                def _(pv_b=pv_b, vb=vb, gi=gi, r0=r0, aref=aref):
                    compute_win(pv_b, vb, gi, r0, aref)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pv_b=pv_b, vb=vb, gi=gi, aref=aref):
                    compute(pv_b, vb, gi, aref)
            elif W:
                r0 = _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1))

                @pl.when((gi < nbatch) & (r0 >= 0))
                def _(pv_b=pv_b, vb=vb, gi=gi, r0=r0, aref=aref):
                    compute_win(pv_b, vb, gi, r0, aref)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pv_b=pv_b, vb=vb, gi=gi, aref=aref):
                    compute(pv_b, vb, gi, aref)
            else:
                @pl.when(gi < nbatch)
                def _(pv_b=pv_b, vb=vb, gi=gi, aref=aref):
                    compute(pv_b, vb, gi, aref)

        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)
    # Write the block: split the row dim (c, i0[, i1]) with leading-dim /
    # 8-aligned-sublane reshapes only.
    acc_all = acc_ref[...]
    if acc2_ref is not None:
        acc_all = acc_all + acc2_ref[...]
    for c in range(CR):
        if acc3:
            out_ref[(c, 0, slice(None), 0)] = jax.lax.slice_in_dim(
                acc_all, c * pd[0], (c + 1) * pd[0], axis=0
            )
        else:
            rows = jax.lax.slice_in_dim(
                acc_all, c * pd[0] * rm, (c + 1) * pd[0] * rm, axis=0
            )
            if D == 2:
                out_ref[c, 0] = rows
            else:
                out_ref[(c, 0, slice(None), 0)] = rows.reshape(pd[0], rm, pdL)


def spread_blocked(
    plan, vp: jnp.ndarray, *, channel_input: bool = False,
    channel_output: bool = False, block_offset=None, shard_axis=None,
    raw_output: bool = False,
) -> jnp.ndarray:
    """Blocked type-1 spreading.  ``vp``: (C, Np) in *original* point order
    (scattered into the slot-aligned layout here), or the real channel form
    (C, 2, Np) with ``channel_input``.  Returns (C,) + shape_over, or the
    channel form (C, 2) + shape_over when ``channel_output`` is set (complex
    plans; the matmul-FFT path uses channels throughout so no complex
    arithmetic ever materialises — required on backends without complex
    support)."""
    D, m, bdims, nb, pd, yz = _geometry(plan)
    is_complex = not plan.is_real
    if channel_input and is_complex:
        C = vp.shape[0]
        vals_in = vp.reshape(2 * C, vp.shape[-1])
    else:
        C = vp.shape[0]
        vals_in = pack_components(vp, is_complex)
    CR = 2 * C if is_complex else C
    P = plan.batch_size
    rdt = plan.real_dtype

    # Leading (sublane) dims of DMA-sliced arrays must be tile-aligned;
    # the slot layout is built with one gather (TPU scatters are serial);
    # the packed layout reads the sorted array directly.
    from ...blocking import gather_slots

    layout = plan.layout
    pts = plan.points_packed if layout == "packed" else plan.points_slotted
    DP = pts.shape[0]
    nslots = pts.shape[1]
    cs = common.coefficient_stack(plan.kernel_data).astype(rdt)
    if block_offset is None:
        block_offset = jnp.zeros((D,), jnp.int32)

    nblocks = int(np.prod(nb))
    out_index = _block_index_map(D, nb)

    W = plan.window_rows if plan.batch_r0 is not None else None
    W1 = (
        plan.window_rows_y
        if (W and plan.kernel_form == "z" and plan.batch_r1 is not None)
        else None
    )
    r01s = (
        _pack_r01(plan.batch_r0, plan.batch_r1 if W1 else None)
        if W
        else jnp.zeros((1,), jnp.int32)
    )
    _check_strip(plan, _STRIPS_SPREAD, W, W1)
    pstarts = (
        plan.pstarts if layout == "packed" else jnp.zeros((1,), jnp.int32)
    )
    SUPER = plan.dma_super_eff
    NB = _nbuf(SUPER)
    SB = SUPER * P

    def run_chunk(vals_chunk):
        """One Pallas pass over a channel chunk (CRc rows of values)."""
        CRc = vals_chunk.shape[0]
        CRPc = common.round_up(CRc, 8)
        # Combined rows [points ; values]: each super-batch is ONE DMA
        # descriptor of SUPER*P lanes.  Huge plans (rho ~ 10) ship the two
        # arrays separately instead — the concat temp alone would OOM HBM
        # (see PV_SPLIT_BYTES); z-form kernels only.  The split path also
        # ships the value rows UNPADDED (CRc, nslots): the CRPc = 8 row
        # pad would cost (8 - CRc) * nslots * 4 bytes of HBM zeros —
        # ~4.6 GB at rho = 10 — purely for DMA row-shape regularity it
        # does not need (the kernel DMAs CRc rows to a static sublane
        # offset and never reads the buffer's value tail rows).
        split_pv = (
            plan.kernel_form == "z"
            and DP % 8 == 0  # vals rows start at a sublane-aligned offset
            and (DP + CRPc) * nslots * 4 > PV_SPLIT_BYTES
        )
        row_pad = 0 if split_pv else CRPc - CRc
        if layout == "packed":
            # Values permute to sorted order; edge/tail lanes are masked
            # in-kernel (no zeroing pass needed).  Two engines: ONE stable
            # payload sort keyed by the saved unsorted bin key (identical
            # ordering to the points sort; cheaper past a few million
            # points: XLA TPU gathers run ~7 ns/index) when set_points
            # prepared sort_key and the row count is small, else one gather
            # by the (overhang-padded) sort_perm.
            if plan.sort_key is not None and CRc <= 4:
                ops = jax.lax.sort(
                    (plan.sort_key,)
                    + tuple(vals_chunk[c].astype(rdt) for c in range(CRc)),
                    num_keys=1,
                )
                vals = jnp.stack(ops[1:], axis=0)
                vals = jnp.pad(
                    vals,
                    ((0, row_pad), (0, nslots - vals.shape[1])),
                )
            else:
                vals = jnp.take(vals_chunk.astype(rdt), plan.sort_perm, axis=1)
                if row_pad:
                    vals = jnp.pad(vals, ((0, row_pad), (0, 0)))
        else:
            vals = gather_slots(
                vals_chunk.astype(rdt), plan.slot_to_point, plan.slot_valid,
                rows=(CRc if split_pv else CRPc),
            )
        if split_pv:
            pv_ops = (pts.astype(rdt), vals)
        else:
            pv_ops = (jnp.concatenate([pts.astype(rdt), vals], axis=0),)
        if plan.kernel_form == "z":
            rm = _rows_mid(pd)
            out_specs = pl.BlockSpec(
                _z_block_shape(CRc, nb, pd), _z_index_map(D, nb)
            )
            out_shape = jax.ShapeDtypeStruct(_z_buffer_shape(CRc, nb, pd), rdt)
            acc_shape = (
                (CRc * pd[0], rm, pd[-1])
                if W1 is not None
                else (CRc * pd[0] * rm, pd[-1])
            )
            scratch = [pltpu.VMEM(acc_shape, rdt)]
            if plan.spread_acc2:
                scratch.append(pltpu.VMEM(acc_shape, rdt))
            if split_pv:
                # Split path: points and (unpadded) values each get their
                # own VMEM buffer with full-row DMAs — Mosaic cannot slice
                # a tiled VMEM memref at a non-8-multiple sublane size.
                scratch += [
                    pltpu.VMEM((DP, NB * SB), rdt),
                    pltpu.VMEM((CRc, NB * SB), rdt),
                    pltpu.SemaphoreType.DMA((NB,)),
                    pltpu.SemaphoreType.DMA((NB,)),
                ]
            else:
                scratch += [
                    pltpu.VMEM((DP + CRPc, NB * SB), rdt),
                    pltpu.SemaphoreType.DMA((NB,)),
                ]
            kernel = functools.partial(
                _spread_kernel_z, plan=plan, CR=CRc, DP=DP, nb=nb, pd=pd,
                P=P, W=W, W1=W1, layout=layout, SUPER=SUPER, SPLIT=split_pv,
            )
        else:
            out_specs = pl.BlockSpec(_block_shape(CRc, nb, pd, yz), out_index)
            out_shape = jax.ShapeDtypeStruct(
                _blocks_buffer_shape(CRc, nb, pd, yz), rdt
            )
            scratch = [
                pltpu.VMEM((CRc * pd[0], yz), rdt),
                pltpu.VMEM((DP + CRPc, NB * SB), rdt),
                pltpu.SemaphoreType.DMA((NB,)),
            ]
            kernel = functools.partial(
                _spread_kernel, plan=plan, CR=CRc, DP=DP, nb=nb, pd=pd, yz=yz,
                P=P, W=W, layout=layout, SUPER=SUPER,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblocks,),
            in_specs=(
                # pts++vals (DP+CRPc, Ns) or split (DP, Ns) + (CRPc, Ns)
                [pl.BlockSpec(memory_space=pltpu.HBM)] * len(pv_ops)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # coefficients
            ),
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=plan.interpret,
        )(plan.block_starts, pstarts, block_offset, r01s, *pv_ops, cs)

    # Channel chunking (large ntransforms): the VMEM accumulator scales with
    # CR, so components are processed in plan.cr_chunk-sized groups — the
    # counterpart of the reference's serial component loop in its
    # shared-memory method (src/spreading/gpu.jl:293).
    chunk = getattr(plan, "cr_chunk", None) or CR
    if CR <= chunk:
        blocks = run_chunk(vals_in)
    else:
        blocks = jnp.concatenate(
            [run_chunk(vals_in[s : s + chunk]) for s in range(0, CR, chunk)],
            axis=0,
        )

    if plan.kernel_form == "z":
        # Z-form buffers only exist on the blockform-DFT path, which
        # consumes the kernel layout directly.
        assert raw_output, "z-form kernels require the blockform DFT path"
        return blocks

    blocks = blocks.reshape((CR,) + tuple(nb) + tuple(pd))  # free lane split
    if raw_output:
        # Block-form DFT path: the halo merge + relayout are folded into the
        # DFT factor matrices (matmul_fft.forward_dft_blockform); hand the
        # padded buffer over untouched.
        return blocks
    grid = common.overlap_add(blocks, bdims, pd, m, interpret=plan.interpret, shard_axis=shard_axis)
    if channel_output and is_complex:
        return grid.reshape((C, 2) + grid.shape[1:])
    return unpack_components(grid, is_complex).astype(plan.dtype)


# ---------------------------------------------------------------------------
# Interpolation (type 2)
# ---------------------------------------------------------------------------


def _interp_kernel(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, blk_ref, pts_hbm,
    cs_ref, out_ref, pts_buf, res_buf, gblk_ref, sem_p, sem_r,
    *, plan, CR, nb, pd, yz, P, W, layout, SUPER, EMIT=True,
):
    b = pl.program_id(0)
    bids = _decompose_block(b, nb)
    origins = [
        (offset_ref[d] + bids[d]) * plan.block_dims[d] for d in range(plan.ndim)
    ]
    start_b = starts_ref[b]  # in units of P (slot layout)
    nbatch = starts_ref[b + 1] - start_b
    if layout == "packed":
        s0 = pstarts_ref[b]
        s1 = pstarts_ref[b + 1]
        base = (s0 // P) * P
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    # Channel-stacked block (CR*p0, YZ), hoisted out of the batch loop into
    # a VMEM scratch (static per-channel loads + sublane concat; a merging
    # reshape would be a boundary-crossing relayout Mosaic rejects).  A ref,
    # not a value, so the windowed path can slice it at a dynamic sublane
    # offset.
    gblk_ref[...] = jnp.concatenate(
        [blk_ref[(c,) + (0,) * len(nb)] for c in range(CR)], axis=0
    )
    def dma_p(slot, j):
        if layout == "packed":
            off = pl.multiple_of(base + j * SB, P)
        else:
            off = pl.multiple_of((start_b + j * SUPER) * P, P)
        dst = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(off, SB)],
            pts_buf.at[:, pl.ds(dst, SB)],
            sem_p.at[slot],
        )

    def res_dma(slot, j):
        # Results always land in the batch-slot layout (the packed input
        # windows of neighbouring blocks overlap; outputs must not).  A
        # super-batch's tail lanes past nbatch carry stale data; they fall
        # in the next program's slot range (overwritten — programs run in
        # ascending order) or past block_starts[-1]*P (masked by the
        # un-permute's `written` mask).  The buffer's row count matches
        # the (possibly unpadded) HBM output — see run_chunk.
        off = pl.multiple_of((start_b + j * SUPER) * P, P)
        src = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            res_buf.at[:, pl.ds(src, SB)],
            out_ref.at[:, pl.ds(off, SB)],
            sem_r.at[slot],
        )

    for j in range(NB - 1):
        @pl.when(j < nsuper)
        def _(j=j):
            dma_p(j, j).start()

    def decode(pts_b, i):
        if layout == "packed":
            cells, fracs, idx = _decode_packed(plan, pts_b)
            pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            valid = (pos >= s0) & (pos < s1)
        else:
            cells, fracs, idx = _decode_slots(plan, pts_b, origins)
            valid = None
        return cells, fracs, idx, valid

    def emit_keys(roff, idx, valid):
        # Packed layout: row CR carries the original point index of each
        # lane (sentinel INT32_MAX on masked lanes) for the masked-sort
        # un-permute; travels bit-cast in the f32 result buffer.
        key = jnp.where(valid, idx, jnp.int32(2**31 - 1))
        if res_buf.dtype == jnp.float64:
            res_buf[CR : CR + 1, pl.ds(roff, P)] = key.astype(res_buf.dtype)
        else:
            res_buf[CR : CR + 1, pl.ds(roff, P)] = jax.lax.bitcast_convert_type(
                key, jnp.float32
            )

    def compute(pts_b, roff, i):
        cells, fracs, idx, valid = decode(pts_b, i)
        wts = _build_wts_from_cells(plan, cells, fracs, cs_ref, None, pd, P)
        qt = _qt_matrix(wts, yz, P)
        # T (CR*p0, P) = sum_yz G[cx, yz] * QT[yz, p]: one matmul with
        # M = CR*p0 (no Python channel loop; MXU rows scale with CR).
        t = _kdot(plan, gblk_ref[...], qt, ((1,), (0,)), res_buf.dtype)
        # v (CR, P) = sum_x W0T[x, p] * T[c*p0 + x, p]: per-channel weighted
        # VPU row reduction (replaces the round-1 0/1 selector matmul).
        res_buf[:CR, pl.ds(roff, P)] = _channel_rowsum(
            t, wts[0], CR, pd[0], plan.normfactor
        )
        if layout == "packed" and EMIT:
            emit_keys(roff, idx, valid)

    def compute_win(pts_b, roff, i, r0):
        # Windowed gather: only rows [r0, r0+W) of each channel's padded
        # block contribute to this batch (see _spread_kernel.compute_win).
        cells, fracs, idx, valid = decode(pts_b, i)
        wts = _build_wts_from_cells(
            plan, cells, fracs, cs_ref, None, pd, P, window=(W, r0)
        )
        qt = _qt_matrix(wts, yz, P)
        g_w = jnp.concatenate(
            [
                gblk_ref[pl.ds(pl.multiple_of(c * pd[0] + r0, 8), W), :]
                for c in range(CR)
            ],
            axis=0,
        )  # (CR*W, yz)
        t = _kdot(plan, g_w, qt, ((1,), (0,)), res_buf.dtype)
        res_buf[:CR, pl.ds(roff, P)] = _channel_rowsum(
            t, wts[0], CR, W, plan.normfactor
        )
        if layout == "packed" and EMIT:
            emit_keys(roff, idx, valid)

    nr = r01s_ref.shape[0]

    def body(i, carry):
        slot = i % NB

        @pl.when(i + NB - 1 < nsuper)
        def _():
            dma_p((i + NB - 1) % NB, i + NB - 1).start()

        dma_p(slot, i).wait()
        # Wait for the result DMA of super-batch i-NB (same slot) before
        # overwriting its buffer.
        @pl.when(i >= NB)
        def _():
            res_dma(slot, i - NB).wait()

        for k in range(SUPER):
            gi = i * SUPER + k
            off = pl.multiple_of(slot * SB + k * P, P)
            pts_b = pts_buf[:, pl.ds(off, P)]
            if W:
                r0 = _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1))

                @pl.when((gi < nbatch) & (r0 >= 0))
                def _(pts_b=pts_b, off=off, gi=gi, r0=r0):
                    compute_win(pts_b, off, gi, r0)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pts_b=pts_b, off=off, gi=gi):
                    compute(pts_b, off, gi)
            else:
                @pl.when(gi < nbatch)
                def _(pts_b=pts_b, off=off, gi=gi):
                    compute(pts_b, off, gi)

        res_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)

    # Drain the last (up to NB) in-flight result DMAs.
    for k in range(NB):
        @pl.when(nsuper > k)
        def _(k=k):
            i = nsuper - 1 - k
            res_dma(i % NB, i).wait()


def _interp_kernel_z(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, blk_ref, pts_hbm,
    cs_ref, out_ref, pts_buf, res_buf, gblk_ref, sem_p, sem_r,
    *, plan, CR, DP, nb, pd, P, W, W1, layout, SUPER, EMIT=True,
):
    """Z-form interpolation: gblk (CR*pd0*prod(pd_mid), pd_last); per batch
    t = G_window @ Wlast (M = CR*W0*prod(pd_mid), K = pd_last, N = P), then
    the (x [, y]) windows reduce via the elementwise Khatri-Rao weights and
    an exact 0/1 channel-sum selector matmul."""
    D = plan.ndim
    b = pl.program_id(0)
    start_b = starts_ref[b]
    nbatch = starts_ref[b + 1] - start_b
    if layout == "packed":
        s0 = pstarts_ref[b]
        s1 = pstarts_ref[b + 1]
        base = (s0 // P) * P
    rm = _rows_mid(pd)
    pdL = pd[-1]
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    # Channel-stacked z-form block, hoisted into VMEM scratch (leading-dim
    # merges only).  With the dim-1 window the scratch keeps the 3D view
    # (CR*pd0, rm, pdL) so 2D (dim-0 leading, dim-1 sublane) slices work.
    acc3 = W1 is not None
    pieces = []
    for c in range(CR):
        if D == 2:
            pieces.append(blk_ref[c, 0])
        elif acc3:
            pieces.append(blk_ref[(c, 0, slice(None), 0)])
        else:
            pieces.append(
                blk_ref[(c, 0, slice(None), 0)].reshape(pd[0] * rm, pdL)
            )
    gblk_ref[...] = jnp.concatenate(pieces, axis=0) if CR > 1 else pieces[0]

    def dma_p(slot, j):
        if layout == "packed":
            off = pl.multiple_of(base + j * SB, P)
        else:
            off = pl.multiple_of((start_b + j * SUPER) * P, P)
        dst = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(off, SB)],
            pts_buf.at[:, pl.ds(dst, SB)],
            sem_p.at[slot],
        )

    def res_dma(slot, j):
        off = pl.multiple_of((start_b + j * SUPER) * P, P)
        src = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            res_buf.at[:, pl.ds(src, SB)],
            out_ref.at[:, pl.ds(off, SB)],
            sem_r.at[slot],
        )

    if plan.debug_strip != "nodma":
        for j in range(NB - 1):
            @pl.when(j < nsuper)
            def _(j=j):
                dma_p(j, j).start()

    def decode(pts_b, i):
        if plan.debug_strip == "decode":
            z = pts_b[:1, :] * 0.0
            cells = [z.astype(jnp.int32) for _ in range(D)]
            fracs = [z + 0.5 for _ in range(D)]
            return cells, fracs, z.astype(jnp.int32), (z < 1.0)
        if layout == "packed":
            cells, fracs, idx = _decode_packed(plan, pts_b)
            pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            valid = (pos >= s0) & (pos < s1)
        else:
            bids = _decompose_block(b, nb)
            origins = [
                (offset_ref[d] + bids[d]) * plan.block_dims[d]
                for d in range(D)
            ]
            cells, fracs, idx = _decode_slots(plan, pts_b, origins)
            valid = None
        return cells, fracs, idx, valid

    def emit_keys(roff, idx, valid):
        key = jnp.where(valid, idx, jnp.int32(2**31 - 1))
        if res_buf.dtype == jnp.float64:
            res_buf[CR : CR + 1, pl.ds(roff, P)] = key.astype(res_buf.dtype)
        else:
            res_buf[CR : CR + 1, pl.ds(roff, P)] = jax.lax.bitcast_convert_type(
                key, jnp.float32
            )

    strip = plan.debug_strip

    def _ww(d, frac):
        if strip == "horner":
            return jnp.full((2 * plan.m, P), 0.5, frac.dtype)
        return common.window_weights(
            plan.kernel_data[d], plan.evalmode, frac, cs_ref[d],
            ds=(plan.precision == "double"),
        )

    def weights(cells, fracs, window, window_y=None):
        if strip == "weights":
            if window is not None and window_y is not None:
                rows = W * W1
            elif window is not None:
                rows = W * rm
            else:
                rows = pd[0] * rm
            dt = fracs[0].dtype
            return jnp.full((rows, P), 0.5, dt), jnp.full((pdL, P), 0.5, dt)
        vl0 = _ww(0, fracs[0])
        if window is None:
            w0 = common.build_wt_matrix(
                vl0, cells[0], 0, plan.m, pd[0], P, plan.block_dims[0],
                shifted=True,
            )
        else:
            w0 = common.build_wt_matrix_window(
                vl0, cells[0], 0, plan.m, W, P, window, shifted=True
            )
        mids = []
        for d in range(1, D - 1):
            vl = _ww(d, fracs[d])
            if d == 1 and window_y is not None:
                mids.append(
                    common.build_wt_matrix_window(
                        vl, cells[d], 0, plan.m, W1, P, window_y, shifted=True
                    )
                )
            else:
                mids.append(
                    common.build_wt_matrix(
                        vl, cells[d], 0, plan.m, pd[d], P, plan.block_dims[d],
                        shifted=True,
                    )
                )
        vl = _ww(D - 1, fracs[D - 1])
        wlast = common.build_wt_matrix(
            vl, cells[D - 1], 0, plan.m, pdL, P, plan.block_dims[D - 1],
            shifted=True,
        )
        return _z_wrows(w0, mids, P), wlast

    def _dot(g, wlast, out_dtype):
        if strip == "dot":
            # Sublane broadcast of wlast's first row (a lane-broadcast of
            # g[:, :1] inside the scf.if crashed Mosaic's vector layout
            # pass at the rho=1 geometry).
            return (
                jnp.broadcast_to(
                    wlast[:1, :] * g[0, 0], (g.shape[0], wlast.shape[1])
                )
            ).astype(out_dtype)
        return _kdot(plan, g, wlast, ((1,), (0,)), out_dtype)

    def _rowsum(t, wr, R, roff):
        if strip == "rowsum":
            res_buf[:CR, pl.ds(roff, P)] = t[:CR, :] * wr[:1, :]
            return True
        return False

    def compute(pts_b, roff, i):
        cells, fracs, idx, valid = decode(pts_b, i)
        wr, wlast = weights(cells, fracs, None)
        g2 = (
            gblk_ref[...].reshape(CR * pd[0] * rm, pdL)
            if acc3
            else gblk_ref[...]
        )
        t = _dot(g2, wlast, res_buf.dtype)  # (CR*pd0*rm, P)
        if not _rowsum(t, wr, pd[0] * rm, roff):
            res_buf[:CR, pl.ds(roff, P)] = _channel_rowsum(
                t, wr, CR, pd[0] * rm, plan.normfactor
            )
        if layout == "packed" and EMIT:
            emit_keys(roff, idx, valid)

    def compute_win(pts_b, roff, i, r0):
        cells, fracs, idx, valid = decode(pts_b, i)
        wr, wlast = weights(cells, fracs, r0)
        if acc3:
            g_w = jnp.concatenate(
                [
                    gblk_ref[pl.ds(c * pd[0] + r0, W), :, :].reshape(
                        W * rm, pdL
                    )
                    for c in range(CR)
                ],
                axis=0,
            )  # (CR*W*rm, pdL)
        else:
            g_w = jnp.concatenate(
                [
                    gblk_ref[
                        pl.ds(pl.multiple_of((c * pd[0] + r0) * rm, 8), W * rm),
                        :,
                    ]
                    for c in range(CR)
                ],
                axis=0,
            )  # (CR*W*rm, pdL)
        t = _dot(g_w, wlast, res_buf.dtype)
        if not _rowsum(t, wr, W * rm, roff):
            res_buf[:CR, pl.ds(roff, P)] = _channel_rowsum(
                t, wr, CR, W * rm, plan.normfactor
            )
        if layout == "packed" and EMIT:
            emit_keys(roff, idx, valid)

    def compute_win2(pts_b, roff, i, r0, r1):
        cells, fracs, idx, valid = decode(pts_b, i)
        wr, wlast = weights(cells, fracs, r0, r1)  # (W*W1, P), (pdL, P)
        r1a = pl.multiple_of(r1, 8)
        g_w = jnp.concatenate(
            [
                gblk_ref[
                    pl.ds(c * pd[0] + r0, W), pl.ds(r1a, W1), :
                ].reshape(W * W1, pdL)
                for c in range(CR)
            ],
            axis=0,
        )  # (CR*W*W1, pdL)
        t = _dot(g_w, wlast, res_buf.dtype)
        if not _rowsum(t, wr, W * W1, roff):
            res_buf[:CR, pl.ds(roff, P)] = _channel_rowsum(
                t, wr, CR, W * W1, plan.normfactor
            )
        if layout == "packed" and EMIT:
            emit_keys(roff, idx, valid)

    nr = r01s_ref.shape[0]

    def body(i, carry):
        slot = i % NB

        if strip != "nodma":
            @pl.when(i + NB - 1 < nsuper)
            def _():
                dma_p((i + NB - 1) % NB, i + NB - 1).start()

            dma_p(slot, i).wait()

            @pl.when(i >= NB)
            def _():
                res_dma(slot, i - NB).wait()

        if strip == "dma":
            # DMA pipeline alive (points in + results out), batch loop gone.
            # Row count clamped: slotted-layout plans carry only 2*ndim
            # point rows in pts_buf.
            tr = min(8, pts_buf.shape[0], res_buf.shape[0])
            res_buf[:tr, :P] = pts_buf[:tr, :P]
            res_dma(slot, i).start()
            return carry
        for k in range(SUPER):
            gi = i * SUPER + k
            off = pl.multiple_of(slot * SB + k * P, P)
            pts_b = pts_buf[:, pl.ds(off, P)]
            if strip == "loop":
                @pl.when(gi < nbatch)
                def _(pts_b=pts_b, off=off):
                    res_buf[:CR, pl.ds(off, P)] = pts_b[:CR, :]
            elif strip == "branch" and W and not W1:
                r0 = jnp.maximum(
                    _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1)), 0
                )

                @pl.when(gi < nbatch)
                def _(pts_b=pts_b, off=off, gi=gi, r0=r0):
                    compute_win(pts_b, off, gi, r0)
            elif W and W1:
                r0, r1 = _unpack_r01(
                    r01s_ref, jnp.minimum(start_b + gi, nr - 1)
                )

                @pl.when((gi < nbatch) & (r1 >= 0))
                def _(pts_b=pts_b, off=off, gi=gi, r0=r0, r1=r1):
                    compute_win2(pts_b, off, gi, r0, r1)

                @pl.when((gi < nbatch) & (r1 < 0) & (r0 >= 0))
                def _(pts_b=pts_b, off=off, gi=gi, r0=r0):
                    compute_win(pts_b, off, gi, r0)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pts_b=pts_b, off=off, gi=gi):
                    compute(pts_b, off, gi)
            elif W:
                r0 = _unpack_r0(r01s_ref, jnp.minimum(start_b + gi, nr - 1))

                @pl.when((gi < nbatch) & (r0 >= 0))
                def _(pts_b=pts_b, off=off, gi=gi, r0=r0):
                    compute_win(pts_b, off, gi, r0)

                @pl.when((gi < nbatch) & (r0 < 0))
                def _(pts_b=pts_b, off=off, gi=gi):
                    compute(pts_b, off, gi)
            else:
                @pl.when(gi < nbatch)
                def _(pts_b=pts_b, off=off, gi=gi):
                    compute(pts_b, off, gi)

        if strip != "nodma":
            res_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)

    if strip != "nodma":
        for k in range(NB):
            @pl.when(nsuper > k)
            def _(k=k):
                i = nsuper - 1 - k
                res_dma(i % NB, i).wait()


def _packed_slot_keys(plan, nslots: int, P: int) -> jnp.ndarray:
    """Original-point-index key per batch-slot lane of the packed layout,
    computed OUTSIDE the kernel from (sort_perm, pstarts, batch_starts) —
    the huge-plan replacement for the kernel-emitted key row (slot s =
    batch jb, lane l of block b; its sorted-array position is
    (pstarts[b]//P)*P + brank*P + l, valid iff inside the block's point
    range).  Costs a ~7 ns/slot gather, so only huge plans use it."""
    s = jnp.arange(nslots, dtype=jnp.int32)
    jb = s // jnp.int32(P)
    lane = s % jnp.int32(P)
    bs = plan.block_starts
    blk = jnp.clip(
        jnp.searchsorted(bs, jb, side="right").astype(jnp.int32) - 1,
        0,
        bs.shape[0] - 2,
    )
    p0 = jnp.take(plan.pstarts, blk)
    p1 = jnp.take(plan.pstarts, blk + 1)
    brank = jb - jnp.take(bs, blk)
    pos = (p0 // jnp.int32(P)) * jnp.int32(P) + brank * jnp.int32(P) + lane
    valid = (pos >= p0) & (pos < p1) & (jb < bs[-1])
    cap = plan.sort_perm.shape[0] - 1
    key = jnp.take(plan.sort_perm, jnp.clip(pos, 0, cap))
    return jnp.where(valid, key, jnp.int32(2**31 - 1))


def interpolate_blocked(
    plan, grid: jnp.ndarray, *, channel_input: bool = False,
    channel_output: bool = False, block_offset=None, shard_axis=None,
    halos_in: jnp.ndarray = None,
) -> jnp.ndarray:
    """Blocked type-2 interpolation.  ``grid``: (C,) + shape_over (or channel
    form (C, 2) + shape_over with ``channel_input``).  Returns (C, Np) in
    *original* point order with the cell-volume prefactor applied (channel
    form (C, 2, Np) with ``channel_output``)."""
    D, m, bdims, nb, pd, yz = _geometry(plan)
    is_complex = not plan.is_real
    if halos_in is not None:
        # Block-form DFT path: the backward contraction already emitted the
        # halo-gathered padded buffer (CR, nb.., pd..) directly.
        CR = halos_in.shape[0]
        C = CR // 2 if is_complex else CR
    else:
        C = grid.shape[0]
        CR = 2 * C if is_complex else C
    P = plan.batch_size
    rdt = plan.real_dtype

    layout = plan.layout
    pts = plan.points_packed if layout == "packed" else plan.points_slotted
    DP = pts.shape[0]
    SUPER = plan.dma_super_eff
    NB = _nbuf(SUPER)
    SB = SUPER * P
    if layout == "packed":
        from ...blocking import max_packed_batches

        nblocks_ = int(np.prod(nb))
        # Batch-slot output layout + the super-batch DMA overhang (the last
        # program's final descriptor may write up to SUPER-1 batches past
        # the last real batch; those lanes are masked by `written` below).
        nslots = (
            max_packed_batches(plan.num_points, nblocks_, P) + SUPER - 1
        ) * P
    else:
        nslots = pts.shape[1] + (SUPER - 1) * P
    cs = common.coefficient_stack(plan.kernel_data).astype(rdt)

    if halos_in is not None:
        halos = halos_in.astype(rdt)
    else:
        assert plan.kernel_form != "z", (
            "z-form interpolation requires the blockform DFT (halos_in)"
        )
        if channel_input and is_complex:
            gp = grid.reshape((2 * C,) + grid.shape[2:]).astype(rdt)
        else:
            gp = pack_components(grid, is_complex).astype(rdt)
        halos = common.halo_gather(gp, bdims, pd, m, interpret=plan.interpret, shard_axis=shard_axis)  # (CR, nb.., pd..)
    if plan.kernel_form != "z":
        halos = halos.reshape((CR,) + tuple(nb) + (pd[0], yz))  # free lane merge

    nblocks = int(np.prod(nb))
    in_index = _block_index_map(D, nb)
    if block_offset is None:
        block_offset = jnp.zeros((D,), jnp.int32)

    W = plan.window_rows if plan.batch_r0 is not None else None
    W1 = (
        plan.window_rows_y
        if (W and plan.kernel_form == "z" and plan.batch_r1 is not None)
        else None
    )
    r01s = (
        _pack_r01(plan.batch_r0, plan.batch_r1 if W1 else None)
        if W
        else jnp.zeros((1,), jnp.int32)
    )
    _check_strip(plan, _STRIPS_INTERP, W, W1)
    pstarts = (
        plan.pstarts if layout == "packed" else jnp.zeros((1,), jnp.int32)
    )

    # Huge plans (rho ~ 10): (a) the HBM result array ships UNPADDED
    # (the 8-row granule pad is GBs of never-read zeros), and (b) for
    # CR >= 2 the un-permute keys are DERIVED outside the kernel
    # (_packed_slot_keys) instead of emitted, dropping the key row so the
    # result rows are exactly CR (an even row count Mosaic can DMA; a
    # CR+1 = 3-row buffer fails its (4,128) tiling).  Key derivation
    # costs a ~7 ns/slot gather — measured +90 ms at 1M, so NORMAL plans
    # keep the in-kernel emission; at rho = 10 it hides inside a
    # multi-second iteration.
    huge_out = (
        layout == "packed"
        and common.round_up(CR + 1, 8) * nslots * 4 > PV_SPLIT_BYTES
    )
    derive_keys = huge_out and CR >= 2

    def run_chunk(halos_chunk):
        CRc = halos_chunk.shape[0]
        # Packed layout: one extra output row carries the un-permute keys
        # (unless derived outside — see above).
        emit = layout == "packed" and not derive_keys
        nrows = CRc + 1 if emit else CRc
        CRPc = common.round_up(nrows, 8)
        out_rows = nrows if huge_out else CRPc
        if plan.kernel_form == "z":
            rm = _rows_mid(pd)
            in_spec0 = pl.BlockSpec(
                _z_block_shape(CRc, nb, pd), _z_index_map(D, nb)
            )
            gblk_shape = (
                (CRc * pd[0], rm, pd[-1])
                if W1 is not None
                else (CRc * pd[0] * rm, pd[-1])
            )
            gblk_scratch = pltpu.VMEM(gblk_shape, rdt)
            kernel = functools.partial(
                _interp_kernel_z, plan=plan, CR=CRc, DP=DP, nb=nb, pd=pd,
                P=P, W=W, W1=W1, layout=layout, SUPER=SUPER, EMIT=emit,
            )
        else:
            in_spec0 = pl.BlockSpec(_block_shape(CRc, nb, pd, yz), in_index)
            gblk_scratch = pltpu.VMEM((CRc * pd[0], yz), rdt)
            kernel = functools.partial(
                _interp_kernel, plan=plan, CR=CRc, nb=nb, pd=pd, yz=yz, P=P,
                W=W, layout=layout, SUPER=SUPER, EMIT=emit,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblocks,),
            in_specs=[
                in_spec0,
                pl.BlockSpec(memory_space=pltpu.HBM),  # points (DP, Nslots)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # coefficient stack
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),  # (CRPc, Nslots)
            scratch_shapes=[
                pltpu.VMEM((DP, NB * SB), rdt),
                # Result buffer rows match the (possibly unpadded) HBM
                # output so the result DMA copies full rows — Mosaic
                # cannot slice a tiled VMEM memref at a non-8-multiple
                # sublane size.
                pltpu.VMEM((out_rows, NB * SB), rdt),
                gblk_scratch,
                pltpu.SemaphoreType.DMA((NB,)),
                pltpu.SemaphoreType.DMA((NB,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, nslots), rdt),
            interpret=plan.interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            plan.block_starts, pstarts, block_offset, r01s, halos_chunk,
            pts, cs,
        )[:nrows]

    # Channel chunking for large ntransforms (see spread_blocked).
    chunk = getattr(plan, "cr_chunk", None) or CR
    if CR <= chunk:
        outs = [run_chunk(halos)]
    else:
        outs = [run_chunk(halos[s : s + chunk]) for s in range(0, CR, chunk)]
    if layout == "packed" and not derive_keys:
        keys_row = outs[0][-1]  # identical across chunks
        slot_vals = jnp.concatenate([o[:-1] for o in outs], axis=0)
    else:
        slot_vals = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    np_ = plan.num_points
    if layout == "packed":
        # Un-permute with ONE masked sort over the key row (original point
        # index per lane; INT32_MAX on masked/edge lanes and, below, on
        # never-written tail slots).  The valid lanes are a bijection onto
        # 0..Np-1, so the first Np sorted entries are the points in
        # original order.
        if derive_keys:
            keys = _packed_slot_keys(plan, nslots, P)
        else:
            if rdt == jnp.float64:
                keys = keys_row.astype(jnp.int32)
            else:
                keys = jax.lax.bitcast_convert_type(keys_row, jnp.int32)
            written = jnp.arange(nslots, dtype=jnp.int32) < (
                plan.block_starts[-1] * P
            )
            keys = jnp.where(written, keys, jnp.int32(2**31 - 1))
        sorted_ops = jax.lax.sort(
            (keys,) + tuple(slot_vals[c] for c in range(CR)), num_keys=1
        )
        vals = jnp.stack([o[:np_] for o in sorted_ops[1:]], axis=0)
    elif plan.point_slots is not None:
        # Routed (spatial) layouts carry an explicit inverse map — their
        # valid-slot keys are NOT a bijection onto 0..Np-1 (invalid receives
        # are masked out of slot_valid), so the sort trick below would
        # misplace values after the holes.
        vals = jnp.take(slot_vals[:CR], plan.point_slots, axis=1)
    else:
        # Un-permute slot results to original point order with ONE masked
        # sort (invalid slots key to the Np sentinel and fall off the
        # tail): 2x faster than a point_slots gather on v5e (XLA's gather
        # runs ~7 ns per index regardless of axis) and removes the second
        # set_points sort that built the inverse map.  Valid slots are a
        # bijection onto 0..Np-1 on the single-chip path, so the first Np
        # sorted entries are exactly the points in original order.
        # Reference analogue: interpolation/gpu.jl:196-203.
        keys = jnp.where(
            plan.slot_valid, plan.slot_to_point, jnp.int32(nslots)
        ).astype(jnp.int32)
        sorted_ops = jax.lax.sort(
            (keys,) + tuple(slot_vals[c] for c in range(CR)), num_keys=1
        )
        vals = jnp.stack([o[:np_] for o in sorted_ops[1:]], axis=0)
    if channel_output and is_complex:
        return vals.reshape(C, 2, vals.shape[1])
    return unpack_components(vals, is_complex).astype(plan.dtype)
