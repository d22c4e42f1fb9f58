"""Extended-precision (double-single) blocked kernels: ds spread + interp.

The TPU-native replacement for the reference's native-Float64 transform
path (reference: src/plan.jl Float64/ComplexF64 plans; test/accuracy.jl
certifies ~4e-14 with f64 arithmetic): every value-bearing tensor is an
(hi, lo) f32 pair carrying ~48 significand bits, window weights evaluate
with the full-pair ds Horner (ops/ds.ds_horner), and the kernel
contractions run as int8 limb cascades with EXACT int32 accumulation on
the MXU (ops/ds.ds_limb_cascade / ds_limb_recombine) — ~nl*(nl+1)/2 int8
passes, i.e. ~1.3x ONE f32-HIGHEST dot at nl=6 on v5e pass rates, for
~2^-42-grade contraction accuracy.

Scope (the extended-precision mode is an accuracy product, not the
throughput fast path):

- packed point layout, yz kernel form, block-form DFT only (the halo
  merge must live inside the ds factor contraction: a separate f32
  overlap_add pass would round hi channels at 2^-24);
- complex plans only; CR = 2C real channels, each one an (hi, lo) pair —
  value rows arrive interleaved ``[c0_hi, c0_lo, c1_hi, c1_lo, ...]``;
- no windowed accumulation, no spread_acc2, no channel chunking.

Layout of the spread output buffer: (2*CR,) + nb + pd with the hi
channels at [0, CR) and the lo channels at [CR, 2*CR) — the ds blockform
DFT (matmul_fft.forward_dft_blockform_ds) consumes exactly this split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ds import (
    _pow2_scale,
    ds_add,
    ds_limb_cascade,
    ds_limb_recombine,
    ds_mul,
    ds_rowsum,
    split_scalar,
    two_sum,
)
from . import common
from .blocked import (
    _block_index_map,
    _block_shape,
    _blocks_buffer_shape,
    _geometry,
    _nbuf,
)


def _ds_dot_rows(wv, qt, dims, nl):
    """ds contraction for the kernels: ``wv`` = (hi, lo) value-bearing rows
    with per-ROW power-of-two scaling (contracting dim must be dim 1);
    ``qt`` = (hi, lo) window-weight matrix quantised at UNIT scale (weights
    are peak-normalised into [0, 1], so no per-column scale — and no
    Mosaic-hostile 1-D scale relayout — is needed).  ``dims`` is the
    lax.dot_general contracting spec."""
    m = jnp.max(jnp.abs(wv[0]), axis=1, keepdims=True)  # (R, 1)
    scale, inv = _pow2_scale(m)
    albs = ds_limb_cascade(wv[0] * inv, None if wv[1] is None else wv[1] * inv, nl)
    blbs = ds_limb_cascade(qt[0], qt[1], nl)
    dn = (dims, ((), ()))
    hi, lo = ds_limb_recombine(
        lambda i, j: jax.lax.dot_general(
            albs[i], blbs[j], dn, preferred_element_type=jnp.int32
        ),
        nl,
    )
    return hi * scale, lo * scale  # (R, 1) broadcasts over the free dim


def _decode_packed_ds(plan, pts_b):
    """Packed ds rows: [key, f0_hi.., idx, c0.., f0_lo..] (blocking.
    packed_layout with points_lo)."""
    D = plan.ndim
    idx = jax.lax.bitcast_convert_type(pts_b[1 + D : 2 + D, :], jnp.int32)
    cells = [
        pts_b[2 + D + d : 3 + D + d, :].astype(jnp.int32) for d in range(D)
    ]
    fr_h = [pts_b[1 + d : 2 + d, :] for d in range(D)]
    fr_l = [pts_b[2 + 2 * D + d : 3 + 2 * D + d, :] for d in range(D)]
    return cells, fr_h, fr_l, idx


def _ds_wts(plan, cells, fr_h, fr_l, cs_ref, csl_ref, valid, pd, P):
    """Per-dim ds window weight matrices [(hi, lo) of (pd_d, P)]."""
    D = plan.ndim
    wts = []
    for d in range(D):
        vh, vl = common.window_weights_ds(
            plan.kernel_data[d], fr_h[d], fr_l[d], cs_ref[d], csl_ref[d]
        )
        if d == 0 and valid is not None:
            vh = jnp.where(valid, vh, 0.0)
            vl = jnp.where(valid, vl, 0.0)
        wts.append(
            tuple(
                common.build_wt_matrix(
                    v, cells[d], 0, plan.m, pd[d], P, plan.block_dims[d]
                )
                for v in (vh, vl)
            )
        )
    return wts


def _qt_ds(wts, yz, P):
    """Khatri-Rao of the trailing-dim ds windows -> (hi, lo) of (YZ, P)."""
    if len(wts) == 1:
        return jnp.ones((1, P), jnp.float32), jnp.zeros((1, P), jnp.float32)
    if len(wts) == 2:
        return wts[1]
    (h1, l1), (h2, l2) = wts[1], wts[2]
    qh, ql = ds_mul(
        h1[:, None, :], l1[:, None, :], h2[None, :, :], l2[None, :, :]
    )
    return qh.reshape(yz, P), ql.reshape(yz, P)


# ---------------------------------------------------------------------------
# Spreading (type 1)
# ---------------------------------------------------------------------------


def _spread_kernel_ds(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, pv_hbm, cs_ref, csl_ref,
    out_ref, acc_h, acc_l, pv_buf, sem_pv,
    *, plan, CR, DP, nb, pd, yz, P, SUPER,
):
    b = pl.program_id(0)
    start_b = starts_ref[b]
    nbatch = starts_ref[b + 1] - start_b
    s0 = pstarts_ref[b]
    s1 = pstarts_ref[b + 1]
    base = (s0 // P) * P
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    acc_h[...] = jnp.zeros_like(acc_h)
    acc_l[...] = jnp.zeros_like(acc_l)

    def dma(slot, j):
        off = pl.multiple_of(base + j * SB, P)
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

    def compute(pv_b, i):
        pts_b = pv_b[:DP]
        cells, fr_h, fr_l, _ = _decode_packed_ds(plan, pts_b)
        pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        valid = (pos >= s0) & (pos < s1)
        vals_b = pv_b[DP:]
        wts = _ds_wts(plan, cells, fr_h, fr_l, cs_ref, csl_ref, valid, pd, P)
        qt = _qt_ds(wts, yz, P)
        # Channel-stacked ds weighted rows: (CR*pd0, P) pair.
        w0h, w0l = wts[0]
        hs, ls = [], []
        for c in range(CR):
            ph, plo = ds_mul(
                w0h, w0l, vals_b[2 * c : 2 * c + 1], vals_b[2 * c + 1 : 2 * c + 2]
            )
            hs.append(ph)
            ls.append(plo)
        wv = (jnp.concatenate(hs, axis=0), jnp.concatenate(ls, axis=0))
        prh, prl = _ds_dot_rows(wv, qt, ((1,), (1,)), plan.ds_nl)
        nh, nl_ = ds_add(acc_h[...], acc_l[...], prh, prl)
        acc_h[...] = nh
        acc_l[...] = nl_

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

            @pl.when(gi < nbatch)
            def _(pv_b=pv_b, gi=gi):
                compute(pv_b, gi)

        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)
    for c in range(CR):
        rows_h = jax.lax.slice_in_dim(
            acc_h[...], c * pd[0], (c + 1) * pd[0], axis=0
        )
        rows_l = jax.lax.slice_in_dim(
            acc_l[...], c * pd[0], (c + 1) * pd[0], axis=0
        )
        out_ref[(c,) + (0,) * len(nb)] = rows_h
        out_ref[(CR + c,) + (0,) * len(nb)] = rows_l


def spread_blocked_ds(plan, vp_ds: jnp.ndarray):
    """ds blocked type-1 spreading.

    ``vp_ds``: complex plans (C, 2, 2, Np) f32 — (component, re/im, hi/lo,
    point); real (float64) plans (C, 2, Np) — (component, hi/lo, point).
    Returns the (hi, lo) padded block buffer pair, each (C, 2) + nb + pd
    (complex) / (C,) + nb + pd (real)."""
    D, m, bdims, nb, pd, yz = _geometry(plan)
    C = vp_ds.shape[0]
    # Interpret-mode shape guard: the Pallas INTERPRETER (not Mosaic, not
    # plain jit — verified against both) compiles certain single-channel
    # elementwise chains with non-strict f32 semantics, silently collapsing
    # the ds error-free transforms (measured 3.3e-8 vs 3.6e-15 on a minimal
    # ds_mul kernel).  CR = 2 is the shape class every certified ds config
    # (complex C = 1; device ladder 5e-12) runs, so real C = 1 plans pad a
    # zero component under interpret only.
    pad_ch = plan.is_real and C == 1 and plan.interpret
    if pad_ch:
        vp_ds = jnp.concatenate([vp_ds, jnp.zeros_like(vp_ds)], axis=0)
        C = 2
    CR = C if plan.is_real else 2 * C
    P = plan.batch_size
    vals_in = vp_ds.reshape(2 * CR, vp_ds.shape[-1])  # [c_hi, c_lo] pairs

    pts = plan.points_packed
    DP = pts.shape[0]
    nslots = pts.shape[1]
    cs, csl = common.coefficient_stack_ds(plan.kernel_data)

    nblocks = int(np.prod(nb))
    SUPER = plan.dma_super_eff
    NB = _nbuf(SUPER)
    SB = SUPER * P
    CRP = common.round_up(2 * CR, 8)

    # Values permute to sorted order (see blocked.spread_blocked).
    if plan.sort_key is not None and 2 * CR <= 4:
        ops = jax.lax.sort(
            (plan.sort_key,) + tuple(vals_in[c] for c in range(2 * CR)),
            num_keys=1,
        )
        vals = jnp.stack(ops[1:], axis=0)
        vals = jnp.pad(vals, ((0, CRP - 2 * CR), (0, nslots - vals.shape[1])))
    else:
        vals = jnp.take(vals_in, plan.sort_perm, axis=1)
        if CRP != 2 * CR:
            vals = jnp.pad(vals, ((0, CRP - 2 * CR), (0, 0)))
    pv = jnp.concatenate([pts.astype(jnp.float32), vals], axis=0)

    out_specs = pl.BlockSpec(_block_shape(2 * CR, nb, pd, yz), _block_index_map(D, nb))
    out_shape = jax.ShapeDtypeStruct(
        _blocks_buffer_shape(2 * CR, nb, pd, yz), jnp.float32
    )
    scratch = [
        pltpu.VMEM((CR * pd[0], yz), jnp.float32),
        pltpu.VMEM((CR * pd[0], yz), jnp.float32),
        pltpu.VMEM((DP + CRP, NB * SB), jnp.float32),
        pltpu.SemaphoreType.DMA((NB,)),
    ]
    kernel = functools.partial(
        _spread_kernel_ds, plan=plan, CR=CR, DP=DP, nb=nb, pd=pd, yz=yz,
        P=P, SUPER=SUPER,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pts++vals
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs lo
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    r01s = jnp.zeros((1,), jnp.int32)
    buf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=plan.interpret,
    )(plan.block_starts, plan.pstarts, jnp.zeros((D,), jnp.int32), r01s,
      pv, cs, csl)
    buf = buf.reshape((2 * CR,) + tuple(nb) + tuple(pd))
    chsh = (C,) if plan.is_real else (C, 2)
    hi = buf[:CR].reshape(chsh + tuple(nb) + tuple(pd))
    lo = buf[CR:].reshape(chsh + tuple(nb) + tuple(pd))
    if pad_ch:
        hi, lo = hi[:1], lo[:1]
    return hi, lo


# ---------------------------------------------------------------------------
# Interpolation (type 2)
# ---------------------------------------------------------------------------


def _interp_kernel_ds(
    starts_ref, pstarts_ref, offset_ref, r01s_ref, blk_ref, pts_hbm,
    cs_ref, csl_ref, out_ref, pts_buf, res_buf, gblk_h, gblk_l, sem_p, sem_r,
    *, plan, CR, DP, nb, pd, yz, P, SUPER, nf_h, nf_l,
):
    b = pl.program_id(0)
    start_b = starts_ref[b]
    nbatch = starts_ref[b + 1] - start_b
    s0 = pstarts_ref[b]
    s1 = pstarts_ref[b + 1]
    base = (s0 // P) * P
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nsuper = (nbatch + SUPER - 1) // SUPER

    # Channel-stacked ds block pair (CR*pd0, YZ): hi channels [0, CR),
    # lo channels [CR, 2CR) of the backward-ds buffer.
    gblk_h[...] = jnp.concatenate(
        [blk_ref[(c,) + (0,) * len(nb)] for c in range(CR)], axis=0
    )
    gblk_l[...] = jnp.concatenate(
        [blk_ref[(CR + c,) + (0,) * len(nb)] for c in range(CR)], axis=0
    )

    def dma_p(slot, j):
        off = pl.multiple_of(base + j * SB, P)
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

    for j in range(NB - 1):
        @pl.when(j < nsuper)
        def _(j=j):
            dma_p(j, j).start()

    def compute(pts_b, roff, i):
        cells, fr_h, fr_l, idx = _decode_packed_ds(plan, pts_b)
        pos = base + i * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        valid = (pos >= s0) & (pos < s1)
        wts = _ds_wts(plan, cells, fr_h, fr_l, cs_ref, csl_ref, None, pd, P)
        qt = _qt_ds(wts, yz, P)
        # T (CR*pd0, P) pair = ds contraction of the block against QT.
        th, tl = _ds_dot_rows(
            (gblk_h[...], gblk_l[...]), qt, ((1,), (0,)), plan.ds_nl
        )
        # Per-channel ds row reduction over the dim-0 window, with the
        # cell-volume prefactor applied in ds.
        w0h, w0l = wts[0]
        for c in range(CR):
            ph, plo = ds_mul(
                jax.lax.slice_in_dim(th, c * pd[0], (c + 1) * pd[0], axis=0),
                jax.lax.slice_in_dim(tl, c * pd[0], (c + 1) * pd[0], axis=0),
                w0h, w0l,
            )
            vh, vl = ds_rowsum(ph, plo, axis=0)  # (1, P) pair
            vh, vl = ds_mul(
                vh, vl, jnp.float32(nf_h), jnp.float32(nf_l)
            )
            res_buf[2 * c : 2 * c + 1, pl.ds(roff, P)] = vh
            res_buf[2 * c + 1 : 2 * c + 2, pl.ds(roff, P)] = vl
        key = jnp.where(valid, idx, jnp.int32(2**31 - 1))
        res_buf[2 * CR : 2 * CR + 1, pl.ds(roff, P)] = (
            jax.lax.bitcast_convert_type(key, jnp.float32)
        )

    def body(i, carry):
        slot = i % NB

        @pl.when(i + NB - 1 < nsuper)
        def _():
            dma_p((i + NB - 1) % NB, i + NB - 1).start()

        dma_p(slot, i).wait()

        @pl.when(i >= NB)
        def _():
            res_dma(slot, i - NB).wait()

        for k in range(SUPER):
            gi = i * SUPER + k
            off = pl.multiple_of(slot * SB + k * P, P)
            pts_b = pts_buf[:, pl.ds(off, P)]

            @pl.when(gi < nbatch)
            def _(pts_b=pts_b, off=off, gi=gi):
                compute(pts_b, off, gi)

        res_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nsuper, body, 0)
    for k in range(NB):
        @pl.when(nsuper > k)
        def _(k=k):
            i = nsuper - 1 - k
            res_dma(i % NB, i).wait()


def interpolate_blocked_ds(plan, halos_hi: jnp.ndarray, halos_lo: jnp.ndarray):
    """ds blocked type-2 interpolation.

    ``halos_hi``/``halos_lo``: the ds backward blockform buffer pair, each
    (C, 2) + nb + pd for complex plans / (C,) + nb + pd for real (float64)
    plans (halo-gathered padded blocks).  Returns (C, 2, 2, Np) f32
    (complex) / (C, 2, Np) (real) in original point order, cell-volume
    prefactor applied in ds."""
    D, m, bdims, nb, pd, yz = _geometry(plan)
    C = halos_hi.shape[0]
    # Interpret-mode single-channel shape guard (see spread_blocked_ds).
    pad_ch = plan.is_real and C == 1 and plan.interpret
    if pad_ch:
        halos_hi = jnp.concatenate([halos_hi, jnp.zeros_like(halos_hi)], axis=0)
        halos_lo = jnp.concatenate([halos_lo, jnp.zeros_like(halos_lo)], axis=0)
        C = 2
    CR = C if plan.is_real else 2 * C
    P = plan.batch_size
    pts = plan.points_packed
    DP = pts.shape[0]
    cs, csl = common.coefficient_stack_ds(plan.kernel_data)

    from ...blocking import max_packed_batches

    nblocks = int(np.prod(nb))
    SUPER = plan.dma_super_eff
    NB = _nbuf(SUPER)
    SB = SUPER * P
    nslots = (
        max_packed_batches(plan.num_points, nblocks, P) + SUPER - 1
    ) * P

    halos = jnp.concatenate(
        [
            halos_hi.reshape((CR,) + tuple(nb) + tuple(pd)),
            halos_lo.reshape((CR,) + tuple(nb) + tuple(pd)),
        ],
        axis=0,
    ).reshape((2 * CR,) + tuple(nb) + (pd[0], yz))

    nrows = 2 * CR + 1  # interleaved (hi, lo) value rows + the key row
    CRP = common.round_up(nrows, 8)
    nf_h, nf_l = split_scalar(plan.normfactor)

    kernel = functools.partial(
        _interp_kernel_ds, plan=plan, CR=CR, DP=DP, nb=nb, pd=pd, yz=yz,
        P=P, SUPER=SUPER, nf_h=nf_h, nf_l=nf_l,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                _block_shape(2 * CR, nb, pd, yz), _block_index_map(D, nb)
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # points
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs lo
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((DP, NB * SB), jnp.float32),
            pltpu.VMEM((CRP, NB * SB), jnp.float32),
            pltpu.VMEM((CR * pd[0], yz), jnp.float32),
            pltpu.VMEM((CR * pd[0], yz), jnp.float32),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
        ],
    )
    r01s = jnp.zeros((1,), jnp.int32)
    slot_vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CRP, nslots), jnp.float32),
        interpret=plan.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(plan.block_starts, plan.pstarts, jnp.zeros((D,), jnp.int32), r01s,
      halos, pts, cs, csl)[:nrows]

    np_ = plan.num_points
    keys = jax.lax.bitcast_convert_type(slot_vals[-1], jnp.int32)
    written = jnp.arange(nslots, dtype=jnp.int32) < (plan.block_starts[-1] * P)
    keys = jnp.where(written, keys, jnp.int32(2**31 - 1))
    sorted_ops = jax.lax.sort(
        (keys,) + tuple(slot_vals[c] for c in range(2 * CR)), num_keys=1
    )
    vals = jnp.stack([o[:np_] for o in sorted_ops[1:]], axis=0)
    if plan.is_real:
        out = vals.reshape(C, 2, np_)
        return out[:1] if pad_ch else out
    return vals.reshape(C, 2, 2, np_)
