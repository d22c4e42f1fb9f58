"""Micro-profile of the block-form DFT's per-axis dots at the bench shapes.

Where does forward_dft_blockform's ~25 ms go, given an ~9 ms MAC floor?
Times, per axis: (a) the paired-dims dot_general as emitted, (b) the same
contraction on a pre-flattened minor-contiguous 2D layout (isolates XLA's
internal relayout cost), (c) a bare f32-highest matmul of the same MNK
(isolates MXU efficiency at these shapes).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("PROF_ITERS", 6))
PREC = jax.lax.Precision.HIGHEST


def timed(f, *args, k=K, reps=2):
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
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


rng = np.random.default_rng(0)

# Bench geometry: nb=(12,12,6), pd=(40,40,72), keep=256.
nb = (12, 12, 6)
pd = (40, 40, 72)
KEEP = 256

# Axis-0 contraction as emitted: x (1, nb0, nb1, nb2, pd0, pd1, pd2)
# contracted over (1, 4) with F (nb0, pd0, 256).
x = jnp.asarray(rng.standard_normal((1,) + nb + pd).astype(np.float32))
f0 = jnp.asarray(rng.standard_normal((nb[0], pd[0], KEEP)).astype(np.float32))

dn = (((1, 4), (0, 1)), ((), ()))
t = timed(
    lambda a, b: jax.lax.dot_general(a, b, dn, precision=PREC), x, f0
)
macs = np.prod(nb) * np.prod(pd) * KEEP / nb[0] / pd[0] * nb[0] * pd[0]
rows = nb[1] * nb[2] * pd[1] * pd[2]
macs = rows * (nb[0] * pd[0]) * KEEP
print(f"paired dot axis0 (rows={rows}, K={nb[0]*pd[0]}, N={KEEP}):"
      f" {t*1e3:7.2f} ms  {macs/t/1e12:5.1f} Tmac/s", flush=True)

# Same contraction, pre-flattened 2D minor-contiguous.
x2 = jnp.asarray(rng.standard_normal((rows, nb[0] * pd[0])).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((nb[0] * pd[0], KEEP)).astype(np.float32))
t = timed(lambda a, b: jnp.matmul(a, b, precision=PREC), x2, f2)
print(f"flat 2D matmul same MNK:    {t*1e3:7.2f} ms  {macs/t/1e12:5.1f} Tmac/s",
      flush=True)

# The relayout alone: transpose x to put (nb0, pd0) minor.
t = timed(lambda a: jnp.transpose(a, (0, 2, 3, 5, 6, 1, 4)), x)
gb = 2 * x.size * 4 / 1e9
print(f"transpose to minor pair:    {t*1e3:7.2f} ms  {gb/t:5.0f} GB/s", flush=True)

# Axis-1-shaped contraction (after axis 0): x (1, nb1, nb2, pd1, pd2, 256)
# contracted over (1, 3).
xa = jnp.asarray(
    rng.standard_normal((1, nb[1], nb[2], pd[1], pd[2], KEEP)).astype(np.float32)
)
f1 = jnp.asarray(rng.standard_normal((nb[1], pd[1], KEEP)).astype(np.float32))
dn1 = (((1, 3), (0, 1)), ((), ()))
t = timed(lambda a, b: jax.lax.dot_general(a, b, dn1, precision=PREC), xa, f1)
rows1 = nb[2] * pd[2] * KEEP
macs1 = rows1 * nb[1] * pd[1] * KEEP
print(f"paired dot axis1 (rows={rows1}): {t*1e3:7.2f} ms  {macs1/t/1e12:5.1f} Tmac/s",
      flush=True)

# Axis-2-shaped contraction: x (1, nb2, pd2, 256, 256) over (1, 2).
xb = jnp.asarray(
    rng.standard_normal((1, nb[2], pd[2], KEEP, KEEP)).astype(np.float32)
)
f2b = jnp.asarray(rng.standard_normal((nb[2], pd[2], KEEP)).astype(np.float32))
dn2 = (((1, 2), (0, 1)), ((), ()))
t = timed(lambda a, b: jax.lax.dot_general(a, b, dn2, precision=PREC), xb, f2b)
rows2 = KEEP * KEEP
macs2 = rows2 * nb[2] * pd[2] * KEEP
print(f"paired dot axis2 (rows={rows2}): {t*1e3:7.2f} ms  {macs2/t/1e12:5.1f} Tmac/s",
      flush=True)

# Calibration: big square matmul at highest.
a = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
t = timed(lambda u: jnp.matmul(u, u, precision=PREC), a, k=20)
print(f"4096^3 highest:             {t*1e3:7.2f} ms  {4096**3/t/1e12:5.1f} Tmac/s",
      flush=True)
