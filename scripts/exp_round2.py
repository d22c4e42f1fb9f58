"""Round-2 device microbenchmarks guiding the kernel redesign.

Questions:
1. MXU shape scaling inside a Mosaic kernel loop: how does the window
   contraction's cost scale with M (output rows) and N (output lanes) at
   HIGHEST precision?  Settles whether narrowing the accumulator window in
   rows (M = CR*W0) and/or lanes (N = W1*pd2) actually buys wall-clock, or
   whether quantisation (128-row / 128-lane tiles) eats the gain.
2. Multi-operand lax.sort cost at 1M elements: can set_points carry the
   point payload (fracs, cells) through the sort instead of the 8.4 ms
   slot gather?
3. Strided multi-dim HBM->VMEM DMA rate (for reading the backward blockform
   DFT's interleaved output directly, skipping the 9 ms relayout transpose).
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
    print(f"{name:<56}{ms:8.3f} ms  {extra}", flush=True)


rng = np.random.default_rng(0)

# --------------------------------------------------------------------------
# 1. MXU shape scaling: loop of dots inside one Mosaic program.
#    Mimics the spread inner loop: wv (M, P) * qt -> acc (M, N) += dot.
#    qt is rebuilt per iteration from a rolled buffer so the dot cannot be
#    hoisted; the build is one roll + multiply (cheap VPU), constant across
#    configs, so differences are MXU time.
# --------------------------------------------------------------------------
ITERS = 2048
P = 128


def mxu_kernel(wv_ref, qt_ref, out_ref, acc_ref, *, iters, prec):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, c):
        wv = wv_ref[...] + c
        qt = qt_ref[...]
        prod = jax.lax.dot_general(
            wv, qt, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_ref.dtype, precision=prec,
        )
        acc_ref[...] = acc_ref[...] + prod
        return c * 0.5

    jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    out_ref[...] = acc_ref[...]


def run_mxu(M, N, prec_name, iters=ITERS, p=P):
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[prec_name]
    wv = jnp.asarray(rng.standard_normal((M, p)), jnp.float32)
    qt = jnp.asarray(rng.standard_normal((N, p)), jnp.float32)
    f = pl.pallas_call(
        functools.partial(mxu_kernel, iters=iters, prec=prec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
    )
    ms = timed(f, wv, qt, k=3)
    macs = M * N * p * iters
    report(
        f"dot M={M:<4} N={N:<5} P={p} {prec_name}", ms,
        f"{macs / (ms * 1e-3) / 1e12:6.2f} Tmac/s  "
        f"{ms * 1e6 / iters:7.2f} ns/it",
    )
    return ms


print("== 1. MXU shape scaling (HIGHEST unless noted) ==", flush=True)
run_mxu(128, 4352, "default")
run_mxu(128, 4352, "highest")
for M in (16, 32, 64, 128, 256):
    run_mxu(M, 4352, "highest")
for N in (136, 256, 512, 1088, 2176):
    run_mxu(64, N, "highest")
run_mxu(32, 2176, "highest")
run_mxu(32, 1088, "highest")
run_mxu(16, 1088, "highest")
# K scaling: P=256 batches
run_mxu(64, 4352, "highest", iters=ITERS // 2, p=256)
run_mxu(64, 2176, "highest", iters=ITERS // 2, p=256)

# --------------------------------------------------------------------------
# 2. Sort / gather costs at 1M
# --------------------------------------------------------------------------
print("== 2. sort & gather at Np=1M ==", flush=True)
NP_ = 1_000_000
keys = jnp.asarray(rng.integers(0, 1 << 26, NP_), jnp.int32)
iota = jnp.arange(NP_, dtype=jnp.int32)
fvals = [jnp.asarray(rng.standard_normal(NP_), jnp.float32) for _ in range(6)]

for nops in (1, 2, 3, 4, 5, 6):
    ops = (keys, iota) + tuple(fvals[: nops - 1])

    def sort_n(*a):
        return jax.lax.sort(a, num_keys=1)

    ms = timed(sort_n, *ops, k=3)
    report(f"lax.sort key + {nops} operands", ms)

arr8 = jnp.asarray(rng.standard_normal((8, NP_)), jnp.float32)
idx115 = jnp.asarray(rng.integers(0, NP_, 1_150_000), jnp.int32)


def take8(a, i):
    return jnp.take(a, i, axis=1)


report("jnp.take (8, 1M) with 1.15M idx", timed(take8, arr8, idx115, k=3))

arr2 = jnp.asarray(rng.standard_normal((8, NP_)), jnp.float32)[:2]
report("jnp.take (2, 1M) with 1.15M idx", timed(take8, arr2, idx115, k=3))

ss = jnp.sort(keys)
q = jnp.arange(0, 1 << 26, (1 << 26) // 1152, dtype=jnp.int32)


def searchsorted(s, qq):
    return jnp.searchsorted(s, qq)


report("searchsorted 1152 in 1M", timed(searchsorted, ss, q, k=3))

# --------------------------------------------------------------------------
# 3. Strided 4-D HBM->VMEM DMA (interleaved blockform layout read)
#    Layout (nb0, pd0, nb1, pd1, nb2, pd2) = (24, 24, 16, 32, 3, 136), f32
#    (the c64 bench-point backward buffer without the channel axis; read the
#    whole thing, one program per (b0, b1), DMA-ing nb2 slabs).
# --------------------------------------------------------------------------
print("== 3. strided interleaved reads ==", flush=True)
nb0, pd0, nb1, pd1, nb2, pd2 = 24, 24, 16, 32, 3, 136
buf = jnp.asarray(
    rng.standard_normal((nb0, pd0, nb1, pd1, nb2, pd2)), jnp.float32
)


def interleaved_kernel(hbm_ref, out_ref, vmem, sem):
    b0 = pl.program_id(0)
    b1 = pl.program_id(1)

    def body(b2, c):
        cp = pltpu.make_async_copy(
            hbm_ref.at[b0, :, b1, :, b2, :], vmem, sem
        )
        cp.start()
        cp.wait()
        return c + jnp.sum(vmem[...])

    s = jax.lax.fori_loop(0, nb2, body, jnp.float32(0))
    out_ref[0, 0] = s


def run_interleaved(x):
    return pl.pallas_call(
        interleaved_kernel,
        grid=(nb0, nb1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nb0, nb1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((pd0, pd1, pd2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)


gb = buf.size * 4 / 1e9
try:
    ms = timed(run_interleaved, buf, k=3)
    report("4-D strided DMA read (one slab per DMA)", ms,
           f"{gb / (ms * 1e-3):6.1f} GB/s")
except Exception as e:
    print(f"strided DMA failed: {type(e).__name__}: {e}", flush=True)


def big_transpose(x):
    return jnp.transpose(x, (0, 2, 4, 1, 3, 5))


report("XLA interleave->blockmajor transpose", timed(big_transpose, buf, k=3),
       f"(2x {gb:.2f} GB)")
print("done", flush=True)
