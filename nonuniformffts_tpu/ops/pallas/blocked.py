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

# Mosaic's dot lowering supports only DEFAULT and HIGHEST; map 'high' to
# HIGHEST inside the kernels (the window contractions need >=f32-ish
# accuracy anyway — bf16 single-pass would inject ~1e-3 window error).
# The XLA-level matmul-DFT keeps true 3-pass HIGH (ops/matmul_fft.py).
_PRECS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


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
    pd = common.padded_block_dims(bdims, m)
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


def _build_batch_wts(plan, cs_ref, pts_buf, origins, valid, pd, P,
                     window=None):
    """Per-dimension transposed window matrices for one point batch.
    ``pts_buf`` rows: D cell-index rows (exact floats) then D fraction
    rows (the set_points high-accuracy split layout).  With ``window =
    (W, r0)`` the dim-0 matrix is the (W, P) windowed form
    (common.build_wt_matrix_window)."""
    D = plan.ndim
    wts = []
    for d in range(D):
        c_row = pts_buf[d : d + 1, :]  # (1, P) cells as floats
        X = pts_buf[D + d : D + d + 1, :]  # (1, P) fractions
        c, vlist = common.window_values_lanes(
            plan.kernel_data[d], plan.evalmode, c_row, X, cs_ref[d]
        )
        if d == 0 and valid is not None:
            vlist = [jnp.where(valid, v, 0.0) for v in vlist]
        if d == 0 and window is not None:
            W, r0 = window
            wts.append(
                common.build_wt_matrix_window(
                    vlist, c, origins[0], plan.m, W, P, r0
                )
            )
        else:
            wts.append(
                common.build_wt_matrix(
                    vlist, c, origins[d], plan.m, pd[d], P, plan.block_dims[d]
                )
            )
    return wts


def _channel_selector(CR: int, rows_per_c: int, dtype):
    """0/1 row-expansion selector B[c*rows + x, c'] = (c == c') — expands
    per-channel rows to the channel-stacked layout with an exact matmul
    (Mosaic rejects the boundary-crossing reshape/broadcast forms)."""
    row_c = jax.lax.broadcasted_iota(
        jnp.int32, (CR * rows_per_c, CR), 0
    ) // rows_per_c
    col_c = jax.lax.broadcasted_iota(jnp.int32, (CR * rows_per_c, CR), 1)
    return (row_c == col_c).astype(dtype)


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
# Spreading (type 1)
# ---------------------------------------------------------------------------


NBUF = 4  # point/value DMA pipeline depth (see _spread_kernel)


def _spread_kernel(
    starts_ref, offset_ref, r0s_ref, pv_hbm, cs_ref, out_ref,
    acc_ref, pv_buf, sem_pv,
    *, plan, CR, DP, nb, pd, yz, P, W,
):
    b = pl.program_id(0)
    bids = _decompose_block(b, nb)
    # offset_ref: per-dim block offset of this device's block range within
    # the global grid (zero on a single chip; the spatially-sharded path
    # passes the chip's block-row offset so cell arithmetic stays global).
    origins = [
        (offset_ref[d] + bids[d]) * plan.block_dims[d] for d in range(plan.ndim)
    ]
    start_b = starts_ref[b]  # segment boundaries in units of P (slot layout)
    nbatch = starts_ref[b + 1] - start_b

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # NBUF-deep pipelined DMA of the combined (points ++ values) rows: one
    # descriptor per batch (separate point/value copies doubled the ~1-2 us
    # per-descriptor latency, which exceeds the ~1 us batch compute and
    # dominated at high density — rho=1 profiling), with NBUF-1 batches in
    # flight to cover the latency.
    def dma(slot, j):
        off = pl.multiple_of((start_b + j) * P, P)
        return pltpu.make_async_copy(
            pv_hbm.at[:, pl.ds(off, P)], pv_buf.at[slot], sem_pv.at[slot]
        )

    for j in range(NBUF - 1):
        @pl.when(j < nbatch)
        def _(j=j):
            dma(j, j).start()

    # Row-expansion selector: B_sel[c*p0 + x, c'] = (c == c'), so
    # B_sel @ v expands per-channel rows to the stacked (CR*p0, P) layout
    # with an exact 0/1 matmul — Mosaic rejects the boundary-crossing
    # (CR, p0, P) reshape/broadcast forms as unsupported gathers.
    b_sel = _channel_selector(CR, pd[0], acc_ref.dtype)
    b_sel_w = _channel_selector(CR, W, acc_ref.dtype) if W else None

    def compute(pv_b):
        pts_b = pv_b[:DP]
        vals_b = pv_b[DP:]
        # Padding slots carry zero values: their rows of wv are identically
        # zero, so no masking is needed.
        wts = _build_batch_wts(plan, cs_ref, pts_b, origins, None, pd, P)
        qt = _qt_matrix(wts, yz, P)
        # Channel-stacked contraction: Wv[c*p0 + x, p] = W0T[x, p] * v[c, p],
        # acc (CR*p0, YZ) += sum_p Wv[cx, p] qt[yz, p].  One matmul with
        # M = CR*p0: MXU row utilisation and CR scaling both come from the
        # stacking (no Python channel loop in the contraction).
        w_tiled = jnp.concatenate([wts[0]] * CR, axis=0)  # (CR*p0, P)
        v_rows = jax.lax.dot_general(
            b_sel, vals_b[:CR, :], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CR*p0, P): row c*p0+x = v[c]
        wv = w_tiled * v_rows
        prod = jax.lax.dot_general(
            wv, qt, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_ref.dtype,
            precision=_PRECS[plan.precision],
        )
        acc_ref[...] = acc_ref[...] + prod

    def compute_win(pv_b, r0):
        # Windowed path: this batch's points only touch rows [r0, r0+W) of
        # the padded block (sub-sorted by dim-0 cell; slot_layout certified
        # no left-edge wrap), so the contraction runs with M = CR*W rows
        # and accumulates at a dynamic 8-aligned sublane offset.
        pts_b = pv_b[:DP]
        vals_b = pv_b[DP:]
        wts = _build_batch_wts(
            plan, cs_ref, pts_b, origins, None, pd, P, window=(W, r0)
        )
        qt = _qt_matrix(wts, yz, P)
        w_tiled = jnp.concatenate([wts[0]] * CR, axis=0)  # (CR*W, P)
        v_rows = jax.lax.dot_general(
            b_sel_w, vals_b[:CR, :], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        wv = w_tiled * v_rows
        prod = jax.lax.dot_general(
            wv, qt, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_ref.dtype,
            precision=_PRECS[plan.precision],
        )  # (CR*W, yz)
        for c in range(CR):
            off = pl.multiple_of(c * pd[0] + r0, 8)  # r0 is 8-aligned
            win = acc_ref[pl.ds(off, W), :]
            acc_ref[pl.ds(off, W), :] = win + jax.lax.slice_in_dim(
                prod, c * W, (c + 1) * W, axis=0
            )

    def body(i, carry):
        slot = i % NBUF

        @pl.when(i + NBUF - 1 < nbatch)
        def _():
            dma((i + NBUF - 1) % NBUF, i + NBUF - 1).start()

        dma(slot, i).wait()
        # Mosaic cannot load a VMEM value at a traced leading index; the
        # slot choice is branched statically instead (DMAs/semaphores above
        # *do* take traced .at[slot] indices).
        if W:
            r0 = r0s_ref[start_b + i]
            for s in range(NBUF):
                @pl.when((slot == s) & (r0 >= 0))
                def _(s=s):
                    compute_win(pv_buf[s], r0)

                @pl.when((slot == s) & (r0 < 0))
                def _(s=s):
                    compute(pv_buf[s])
        else:
            for s in range(NBUF):
                @pl.when(slot == s)
                def _(s=s):
                    compute(pv_buf[s])

        return carry

    jax.lax.fori_loop(0, nbatch, body, 0)
    # Un-stack channels with static sublane slices (one write per channel;
    # a (CR*p0, yz) -> (CR, 1.., p0, yz) reshape would be a boundary-
    # crossing relayout Mosaic lowers as an unsupported gather).
    for c in range(CR):
        out_ref[(c,) + (0,) * len(nb)] = jax.lax.slice_in_dim(
            acc_ref[...], c * pd[0], (c + 1) * pd[0], axis=0
        )


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
    # the slot layout is built with one gather (TPU scatters are serial).
    from ...blocking import gather_slots

    pts = plan.points_slotted
    DP = pts.shape[0]
    nslots = pts.shape[1]
    cs = common.coefficient_stack(plan.kernel_data).astype(rdt)
    if block_offset is None:
        block_offset = jnp.zeros((D,), jnp.int32)

    nblocks = int(np.prod(nb))
    out_index = _block_index_map(D, nb)

    W = plan.window_rows if plan.batch_r0 is not None else None
    r0s = (
        plan.batch_r0 if W else jnp.zeros((1,), jnp.int32)
    )

    def run_chunk(vals_chunk):
        """One Pallas pass over a channel chunk (CRc rows of values)."""
        CRc = vals_chunk.shape[0]
        CRPc = common.round_up(CRc, 8)
        vals = gather_slots(
            vals_chunk.astype(rdt), plan.slot_to_point, plan.slot_valid,
            rows=CRPc,
        )
        # Combined rows [points ; values]: each batch is ONE DMA descriptor.
        pv = jnp.concatenate([pts.astype(rdt), vals], axis=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # pts++vals (DP+CRPc, Ns)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # coefficient stack
            ],
            out_specs=pl.BlockSpec(_block_shape(CRc, nb, pd, yz), out_index),
            scratch_shapes=[
                pltpu.VMEM((CRc * pd[0], yz), rdt),
                pltpu.VMEM((NBUF, DP + CRPc, P), rdt),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        kernel = functools.partial(
            _spread_kernel, plan=plan, CR=CRc, DP=DP, nb=nb, pd=pd, yz=yz,
            P=P, W=W,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                _blocks_buffer_shape(CRc, nb, pd, yz), rdt
            ),
            interpret=plan.interpret,
        )(plan.block_starts, block_offset, r0s, pv, cs)

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
    starts_ref, offset_ref, r0s_ref, blk_ref, pts_hbm, cs_ref, out_ref,
    pts_buf, res_buf, gblk_ref, sem_p, sem_r,
    *, plan, CR, nb, pd, yz, P, W,
):
    b = pl.program_id(0)
    bids = _decompose_block(b, nb)
    origins = [
        (offset_ref[d] + bids[d]) * plan.block_dims[d] for d in range(plan.ndim)
    ]
    start_b = starts_ref[b]  # in units of P (slot layout)
    nbatch = starts_ref[b + 1] - start_b

    # Channel-stacked block (CR*p0, YZ), hoisted out of the batch loop into
    # a VMEM scratch (static per-channel loads + sublane concat; a merging
    # reshape would be a boundary-crossing relayout Mosaic rejects).  A ref,
    # not a value, so the windowed path can slice it at a dynamic sublane
    # offset.
    gblk_ref[...] = jnp.concatenate(
        [blk_ref[(c,) + (0,) * len(nb)] for c in range(CR)], axis=0
    )
    # Channel-summing selector: A_sel[c, c'*p0 + x] = (c == c') so that
    # A_sel @ (W0T-weighted T) reduces each channel's p0 rows exactly.
    a_row = jax.lax.broadcasted_iota(jnp.int32, (CR, CR * pd[0]), 0)
    a_col = jax.lax.broadcasted_iota(jnp.int32, (CR, CR * pd[0]), 1) // pd[0]
    a_sel = (a_row == a_col).astype(res_buf.dtype)
    if W:
        a_row_w = jax.lax.broadcasted_iota(jnp.int32, (CR, CR * W), 0)
        a_col_w = jax.lax.broadcasted_iota(jnp.int32, (CR, CR * W), 1) // W
        a_sel_w = (a_row_w == a_col_w).astype(res_buf.dtype)

    def dma_p(slot, j):
        off = pl.multiple_of((start_b + j) * P, P)
        return pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(off, P)], pts_buf.at[slot], sem_p.at[slot]
        )

    def res_dma(slot, j):
        off = pl.multiple_of((start_b + j) * P, P)
        return pltpu.make_async_copy(
            res_buf.at[slot, :, :], out_ref.at[:, pl.ds(off, P)], sem_r.at[slot]
        )

    # NBUF-deep point prefetch (per-descriptor latency exceeds the batch
    # compute; 2 slots could not cover it — see _spread_kernel).
    for j in range(NBUF - 1):
        @pl.when(j < nbatch)
        def _(j=j):
            dma_p(j, j).start()

    def compute(pts_b, res_slot_ref):
        wts = _build_batch_wts(plan, cs_ref, pts_b, origins, None, pd, P)
        qt = _qt_matrix(wts, yz, P)
        # T (CR*p0, P) = sum_yz G[cx, yz] * QT[yz, p]: one matmul with
        # M = CR*p0 (no Python channel loop; MXU rows scale with CR).
        t = jax.lax.dot_general(
            gblk_ref[...], qt, (((1,), (0,)), ((), ())),
            preferred_element_type=res_buf.dtype,
            precision=_PRECS[plan.precision],
        )
        # v (CR, P) = sum_x W0T[x, p] * T[c*p0 + x, p]: weight with the
        # tiled W0T, then reduce each channel's p0 rows with the exact 0/1
        # selector matmul.
        w_tiled = jnp.concatenate([wts[0]] * CR, axis=0)  # (CR*p0, P)
        res_slot_ref[:CR, :] = jax.lax.dot_general(
            a_sel, t * w_tiled, (((1,), (0,)), ((), ())),
            preferred_element_type=res_buf.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def compute_win(pts_b, res_slot_ref, r0):
        # Windowed gather: only rows [r0, r0+W) of each channel's padded
        # block contribute to this batch (see _spread_kernel.compute_win).
        wts = _build_batch_wts(
            plan, cs_ref, pts_b, origins, None, pd, P, window=(W, r0)
        )
        qt = _qt_matrix(wts, yz, P)
        g_w = jnp.concatenate(
            [
                gblk_ref[pl.ds(pl.multiple_of(c * pd[0] + r0, 8), W), :]
                for c in range(CR)
            ],
            axis=0,
        )  # (CR*W, yz)
        t = jax.lax.dot_general(
            g_w, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=res_buf.dtype,
            precision=_PRECS[plan.precision],
        )
        w_tiled = jnp.concatenate([wts[0]] * CR, axis=0)  # (CR*W, P)
        res_slot_ref[:CR, :] = jax.lax.dot_general(
            a_sel_w, t * w_tiled, (((1,), (0,)), ((), ())),
            preferred_element_type=res_buf.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    def body(i, carry):
        slot = i % NBUF

        @pl.when(i + NBUF - 1 < nbatch)
        def _():
            dma_p((i + NBUF - 1) % NBUF, i + NBUF - 1).start()

        dma_p(slot, i).wait()
        # Wait for the result DMA of batch i-NBUF (same slot) before
        # overwriting its buffer; static-slot branches (Mosaic cannot load
        # VMEM values at traced leading indices).
        @pl.when(i >= NBUF)
        def _():
            res_dma(slot, i - NBUF).wait()

        if W:
            r0 = r0s_ref[start_b + i]
            for s in range(NBUF):
                @pl.when((slot == s) & (r0 >= 0))
                def _(s=s):
                    compute_win(pts_buf[s], res_buf.at[s], r0)

                @pl.when((slot == s) & (r0 < 0))
                def _(s=s):
                    compute(pts_buf[s], res_buf.at[s])
        else:
            for s in range(NBUF):
                @pl.when(slot == s)
                def _(s=s):
                    compute(pts_buf[s], res_buf.at[s])

        res_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nbatch, body, 0)

    # Drain the last (up to NBUF) in-flight result DMAs.
    for k in range(NBUF):
        @pl.when(nbatch > k)
        def _(k=k):
            i = nbatch - 1 - k
            res_dma(i % NBUF, i).wait()


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

    pts = plan.points_slotted
    DP = pts.shape[0]
    nslots = pts.shape[1]
    cs = common.coefficient_stack(plan.kernel_data).astype(rdt)

    if halos_in is not None:
        halos = halos_in.astype(rdt)
    else:
        if channel_input and is_complex:
            gp = grid.reshape((2 * C,) + grid.shape[2:]).astype(rdt)
        else:
            gp = pack_components(grid, is_complex).astype(rdt)
        halos = common.halo_gather(gp, bdims, pd, m, interpret=plan.interpret, shard_axis=shard_axis)  # (CR, nb.., pd..)
    halos = halos.reshape((CR,) + tuple(nb) + (pd[0], yz))  # free lane merge

    nblocks = int(np.prod(nb))
    in_index = _block_index_map(D, nb)
    if block_offset is None:
        block_offset = jnp.zeros((D,), jnp.int32)

    W = plan.window_rows if plan.batch_r0 is not None else None
    r0s = plan.batch_r0 if W else jnp.zeros((1,), jnp.int32)

    def run_chunk(halos_chunk):
        CRc = halos_chunk.shape[0]
        CRPc = common.round_up(CRc, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(_block_shape(CRc, nb, pd, yz), in_index),
                pl.BlockSpec(memory_space=pltpu.HBM),  # points (DP, Nslots)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # coefficient stack
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),  # (CRPc, Nslots)
            scratch_shapes=[
                pltpu.VMEM((NBUF, DP, P), rdt),
                pltpu.VMEM((NBUF, CRPc, P), rdt),
                pltpu.VMEM((CRc * pd[0], yz), rdt),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        kernel = functools.partial(
            _interp_kernel, plan=plan, CR=CRc, nb=nb, pd=pd, yz=yz, P=P, W=W
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((CRPc, nslots), rdt),
            interpret=plan.interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(plan.block_starts, block_offset, r0s, halos_chunk, pts, cs)[:CRc]

    # Channel chunking for large ntransforms (see spread_blocked).
    chunk = getattr(plan, "cr_chunk", None) or CR
    if CR <= chunk:
        slot_vals = run_chunk(halos)
    else:
        slot_vals = jnp.concatenate(
            [run_chunk(halos[s : s + chunk]) for s in range(0, CR, chunk)],
            axis=0,
        )

    if plan.point_slots is not None:
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
        np_ = plan.num_points
        keys = jnp.where(
            plan.slot_valid, plan.slot_to_point, jnp.int32(nslots)
        ).astype(jnp.int32)
        sorted_ops = jax.lax.sort(
            (keys,) + tuple(slot_vals[c] for c in range(CR)), num_keys=1
        )
        vals = jnp.stack([o[:np_] for o in sorted_ops[1:]], axis=0)
    vals = vals * jnp.asarray(plan.normfactor, rdt)
    if channel_output and is_complex:
        return vals.reshape(C, 2, vals.shape[1])
    return unpack_components(vals, is_complex).astype(plan.dtype)
