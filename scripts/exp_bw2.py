"""Follow-up probes: XLA interleave transpose, HBM->HBM DMA-only relayout,
and per-dim overlap_add pass costs, at the bench geometry."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from nonuniformffts_tpu.ops.pallas import common  # noqa: E402


def timed(f, *args, k=8, reps=3):
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


def report(name, ms, nbytes):
    print(f"{name:<56}{ms:8.2f} ms  {nbytes/ms/1e6:7.0f} GB/s")


rng = np.random.default_rng(0)
CR = 2
nb = (24, 16, 3)
B = (16, 24, 128)
pd = (24, 32, 136)
m = 4
G = 2 * 0.453e9  # r+w bytes of the 0.45 GB grid

bm = jnp.asarray(
    rng.standard_normal((CR,) + nb + B).astype(np.float32))
f_tr = lambda a: jnp.transpose(a, (0, 1, 4, 2, 5, 3, 6)).reshape(
    CR, nb[0] * B[0], nb[1] * B[1], nb[2] * B[2])
report("XLA block-interleave transpose (to grid)", timed(f_tr, bm), G)

grid_ch = jnp.asarray(
    rng.standard_normal((CR, 384, 384, 384)).astype(np.float32))
f_tr2 = lambda a: jnp.transpose(
    a.reshape(CR, nb[0], B[0], nb[1], B[1], nb[2], B[2]),
    (0, 1, 3, 5, 2, 4, 6),
)
report("XLA block-interleave transpose (to blocks)", timed(f_tr2, grid_ch), G)

# --- DMA-only relayout: one program, many async HBM->HBM copies ---------


def dma_relayout_kernel(src_ref, dst_ref, sems):
    # src: (CR, nb0, nb1, nb2, B0, B1, B2) view of the core region
    # dst: (CR, N0, N1, N2)
    n0, n1, n2 = nb
    b0 = pl.program_id(0)
    copies = []
    for b1 in range(n1):
        for b2 in range(n2):
            c = pltpu.make_async_copy(
                src_ref.at[
                    :, b0, b1, b2, :, :, :
                ],
                dst_ref.at[
                    :,
                    pl.ds(b0 * B[0], B[0]),
                    pl.ds(b1 * B[1], B[1]),
                    pl.ds(b2 * B[2], B[2]),
                ],
                sems.at[b1 * n2 + b2],
            )
            c.start()
            copies.append(c)
    for c in copies:
        c.wait()


def dma_relayout(core):
    return pl.pallas_call(
        dma_relayout_kernel,
        grid=(nb[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((CR, 384, 384, 384), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nb[1] * nb[2],))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(core)


try:
    out = dma_relayout(bm)
    ref = f_tr(bm)
    print("   dma relayout correct:", bool(jnp.all(out == ref)))
    report("DMA-only relayout (to grid)", timed(dma_relayout, bm), G)
except Exception as e:  # noqa: BLE001
    print("dma relayout failed:", repr(e))

# --- per-dim overlap_add passes -----------------------------------------
blocks = jnp.asarray(
    rng.standard_normal((CR,) + nb + pd).astype(np.float32))


def oadd_dim(arr, d):
    nb_ax = 1 + d
    p_ax = 1 + 3 + d
    Bd = B[d]
    left = jax.lax.slice_in_dim(arr, 0, m - 1, axis=p_ax)
    right = jax.lax.slice_in_dim(arr, m - 1 + Bd, m - 1 + Bd + m, axis=p_ax)
    right_sh = jnp.roll(right, 1, axis=nb_ax)
    left_sh = jnp.roll(left, -1, axis=nb_ax)
    lo = jax.lax.slice_in_dim(arr, m - 1, 2 * m - 1, axis=p_ax) + right_sh
    mid = jax.lax.slice_in_dim(arr, 2 * m - 1, Bd, axis=p_ax)
    hi = jax.lax.slice_in_dim(arr, Bd, m - 1 + Bd, axis=p_ax) + left_sh
    return jnp.concatenate([lo, mid, hi], axis=p_ax)


for d in (0, 1, 2):
    shp = list(blocks.shape)
    nbytes = int(np.prod(shp)) * 4
    out_bytes = nbytes // pd[d] * B[d]
    f = functools.partial(oadd_dim, d=d)
    report(f"oadd pass dim{d} alone", timed(f, blocks), nbytes + out_bytes)

f_all = lambda a: common.overlap_add(a, B, pd, m)
report("overlap_add full (current)", timed(f_all, blocks), 0.96e9 + 0.45e9)
f_hg = lambda g: common.halo_gather(g, B, pd, m)
report("halo_gather full (current)", timed(f_hg, grid_ch), 0.96e9 + 0.45e9)
