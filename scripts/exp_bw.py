"""HBM bandwidth probes: XLA elementwise vs Pallas copy kernels at several
block shapes, with robust anti-hoist measurement. Decides whether the merge
stages' ~110 GB/s is a Pallas artifact or the machine's streaming limit.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")


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
    print(f"{name:<52}{ms:8.2f} ms  {nbytes/ms/1e6:7.0f} GB/s")


rng = np.random.default_rng(0)
R, L = 36864, 4352
NB = R * L * 4
x = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))

# XLA elementwise: read + write.
report("XLA x*2.0000001 (r+w)", timed(lambda a: a * 2.0000001, x), 2 * NB)
# XLA add two arrays: 2 reads + 1 write.
y = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
report("XLA x+y (2r+w)", timed(lambda a, b: a + b, x, y), 3 * NB)
# XLA sum reduce: 1 read.
report("XLA sum(x) (r)", timed(lambda a: jnp.sum(a), x), NB)


def copy_kernel(src_ref, dst_ref):
    dst_ref[...] = src_ref[...]


def pallas_copy(shape, blk):
    g = tuple(s // b for s, b in zip(shape, blk))

    def idx(*bids):
        return bids

    return functools.partial(
        pl.pallas_call,
        copy_kernel,
        grid=g,
        in_specs=[pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )()


for blk in ((256, 4352), (512, 4352), (1024, 4352)):
    if blk[0] * blk[1] * 4 * 4 > 14e6:
        continue
    f = pallas_copy((R, L), blk)
    report(f"pallas copy blk={blk}", timed(f, x), 2 * NB)

xw = x.reshape(2304, 69632)
for blk in ((8, 69632), (16, 69632), (32, 69632)):
    if blk[0] * blk[1] * 4 * 4 > 14e6:
        continue
    f = pallas_copy((2304, 69632), blk)
    report(f"pallas copy wide blk={blk}", timed(f, xw), 2 * NB)

xn = x.reshape(9216, 17408)
for blk in ((64, 17408), (128, 17408)):
    f = pallas_copy((9216, 17408), blk)
    report(f"pallas copy blk={blk}", timed(f, xn), 2 * NB)

# Pallas copy with grid over lanes instead of rows (strided blocks).
f = pallas_copy((R, L), (R // 64, L))
report("pallas copy tall blk", timed(f, x), 2 * NB)

# XLA "relayout-like": block-interleave transpose of the real merge shape.
CR, nb0, nb1, nb2 = 2, 24, 16, 3
B = (16, 24, 128)
bm = jnp.asarray(
    rng.standard_normal((CR, nb0, nb1, nb2, B[0], B[1], B[2])).astype(np.float32)
)
f_tr = lambda a: jnp.transpose(a, (0, 1, 4, 2, 5, 3, 6)).reshape(
    CR, nb0 * B[0], nb1 * B[1], nb2 * B[2]
)
report("XLA block-interleave transpose 0.45GB", timed(f_tr, bm), 2 * 0.45e9)
