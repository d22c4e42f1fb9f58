"""Microbenchmarks of Pallas per-program overhead and spread-kernel DMA
strategies on the TPU, guiding the blocked-kernel redesign.

Questions answered:
1. What is Mosaic's fixed per-program cost for a trivial BlockSpec-pipelined
   copy (vary program count at constant total bytes)?
2. Does a scalar-prefetch-driven "one batch per program, out-block
   revisiting" spread kernel beat the manual double-buffered-DMA design?
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def timed(f, *args, k=5, reps=3):
    @jax.jit
    def loop(*a):
        def body(c, _):
            def perturb(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (c * jnp.asarray(1e-30, x.dtype)).astype(x.dtype)
                return x

            y = f(*jax.tree.map(perturb, a))
            s = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(y))
            return jax.lax.optimization_barrier(s), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    _ = float(loop(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        ts.append((time.perf_counter() - t0) / k)
    return min(ts) * 1e3


def report(name, ms, extra=""):
    print(f"{name:<52}{ms:8.2f} ms  {extra}")


rng = np.random.default_rng(0)

# --------------------------------------------------------------------------
# 1. Trivial copy at varying granularity: total 0.9 GB moved each time.
# --------------------------------------------------------------------------
TOT_ROWS = 36864  # total sublane rows (2D layout: tile-clean)
LANES = 4352


def copy_kernel(src_ref, dst_ref):
    dst_ref[...] = src_ref[...]


x_big = jnp.asarray(rng.standard_normal((TOT_ROWS, LANES)).astype(np.float32))
for rows in ():
    nprog = TOT_ROWS // rows

    f = functools.partial(
        pl.pallas_call,
        copy_kernel,
        grid=(nprog,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((rows, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((TOT_ROWS, LANES), jnp.float32),
    )()
    ms = timed(f, x_big)
    blk_mb = rows * LANES * 4 / 1e6
    per_prog = ms * 1e3 / nprog
    gbs = 2 * TOT_ROWS * LANES * 4 / ms / 1e6
    report(
        f"copy nprog={nprog} blk={blk_mb:.2f}MB", ms,
        f"{per_prog:.2f} us/prog, {gbs:.0f} GB/s",
    )

# --------------------------------------------------------------------------
# 2. Spread-kernel strategies at the bench operating point.
# --------------------------------------------------------------------------
import nonuniformffts_tpu as nufft  # noqa: E402
from nonuniformffts_tpu.ops.pallas import blocked, common  # noqa: E402
from nonuniformffts_tpu.blocking import gather_slots, num_blocks  # noqa: E402

N = 256
NP = 1_000_000
plan = nufft.PlanNUFFT(
    np.complex64, (N, N, N), m=4, sigma=1.5, spread_method="blocked",
    fft_method="matmul",
)
pts = rng.uniform(0, 2 * np.pi, (3, NP)).astype(np.float32)
plan = nufft.set_points(plan, pts)
v_ch = jnp.asarray(rng.standard_normal((2, NP)).astype(np.float32))

D, m, bdims, nb, pd, yz = blocked._geometry(plan)
print(f"geometry: bdims={bdims} nb={nb} pd={pd} yz={yz} "
      f"nslots={plan.points_slotted.shape[1]}")

f_cur = functools.partial(blocked.spread_blocked, plan)
report("spread_blocked current (incl. gather+oadd)", timed(f_cur, v_ch))


def kernel_only(v):
    CR = 2
    CRP = common.round_up(CR, 8)
    vals = gather_slots(v, plan.slot_to_point, plan.slot_valid, rows=CRP)
    cs = common.coefficient_stack(plan.kernel_data).astype(jnp.float32)
    out_shape = blocked._blocks_buffer_shape(CR, nb, pd, yz)
    blk_shape = blocked._block_shape(CR, nb, pd, yz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(np.prod(nb)),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk_shape, blocked._block_index_map(D, nb)),
        scratch_shapes=[
            pltpu.VMEM((CR * pd[0], yz), jnp.float32),
            pltpu.VMEM((2, 8, 128), jnp.float32),
            pltpu.VMEM((2, CRP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        blocked._spread_kernel, plan=plan, CR=CR, nb=nb, pd=pd, yz=yz, P=128
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(plan.block_starts, jnp.zeros((D,), jnp.int32), plan.points_slotted,
      vals, cs)


report("spread kernel only (current)", timed(kernel_only, v_ch))

# --- variant: one batch per program, out-block revisiting accumulation ---
nslots = int(plan.points_slotted.shape[1])
P = 128
nbatches = nslots // P
DP = int(plan.points_slotted.shape[0])

# batch -> flat block id (host-computable from block_starts? data-dependent;
# compute on device once, pass as scalar prefetch)
bs = plan.block_starts
bidx = jnp.arange(nbatches, dtype=jnp.int32)
batch_blk = (
    jnp.searchsorted(bs, bidx, side="right").astype(jnp.int32) - 1
)  # (nbatches,)


def _decomp(blk, nb):
    out = []
    rem = blk
    for d in range(len(nb)):
        stride = int(np.prod(nb[d + 1 :], dtype=np.int64)) if d + 1 < len(nb) else 1
        out.append(rem // stride)
        rem = rem % stride
    return out


def revisit_kernel(bb_ref, pts_ref, vals_ref, cs_ref, out_ref, *, CR):
    b = pl.program_id(0)
    blk = bb_ref[b]
    bids = _decomp(blk, nb)
    origins = [bids[d] * bdims[d] for d in range(D)]
    first = jnp.logical_or(b == 0, bb_ref[jnp.maximum(b - 1, 0)] != blk)

    wts = blocked._build_batch_wts(plan, cs_ref, pts_ref[...], origins, None, pd, P)
    qt = blocked._qt_matrix(wts, yz, P)
    row_c = jax.lax.broadcasted_iota(jnp.int32, (CR * pd[0], CR), 0) // pd[0]
    col_c = jax.lax.broadcasted_iota(jnp.int32, (CR * pd[0], CR), 1)
    b_sel = (row_c == col_c).astype(jnp.float32)
    w_tiled = jnp.concatenate([wts[0]] * CR, axis=0)
    v_rows = jax.lax.dot_general(
        b_sel, vals_ref[:CR, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    wv = w_tiled * v_rows
    prod = jax.lax.dot_general(
        wv, qt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (CR*p0, yz)

    for c in range(CR):
        piece = jax.lax.slice_in_dim(prod, c * pd[0], (c + 1) * pd[0], axis=0)
        idx = (c,) + (0,) * len(nb)

        @pl.when(first)
        def _():
            out_ref[idx] = piece

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[idx] = out_ref[idx] + piece


def spread_revisit(v):
    CR = 2
    CRP = common.round_up(CR, 8)
    vals = gather_slots(v, plan.slot_to_point, plan.slot_valid, rows=CRP)
    cs = common.coefficient_stack(plan.kernel_data).astype(jnp.float32)
    out_shape = blocked._blocks_buffer_shape(CR, nb, pd, yz)
    blk_shape = blocked._block_shape(CR, nb, pd, yz)

    def out_index(b, bb_ref):
        blk = bb_ref[b]
        return (0,) + tuple(_decomp(blk, nb)) + (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbatches,),
        in_specs=[
            pl.BlockSpec((DP, P), lambda b, bb: (0, b)),
            pl.BlockSpec((CRP, P), lambda b, bb: (0, b)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk_shape, out_index),
        scratch_shapes=[],
    )
    kern = functools.partial(revisit_kernel, CR=CR)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(batch_blk, plan.points_slotted, vals, cs)


try:
    out_rv = spread_revisit(v_ch)
    out_cur = kernel_only(v_ch)
    err = float(
        jnp.linalg.norm(out_rv - out_cur) / jnp.linalg.norm(out_cur)
    )
    print(f"   revisit-vs-current rel diff: {err:.3e}")
    report("spread kernel revisit (1 batch/program)", timed(spread_revisit, v_ch))
except Exception as e:  # noqa: BLE001
    print("revisit variant failed:", repr(e))
