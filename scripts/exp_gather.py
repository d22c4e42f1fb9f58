"""Experiment: lane-dim gather vs row-gather+transpose for the slot layouts.

``gather_slots`` lays per-point rows (R, Np) into (R, Nslots) with
``jnp.take(x, idx, axis=1)`` — a gather along the minor (lane) dimension,
which XLA lowers ~15x below HBM rate on TPU (measured 5.05 ms for 36 MB at
the bench point).  Candidate: gather rows of the transposed layout (fast,
rows are contiguous) and pay one dense transpose instead.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NP_PTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NSLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_146_368
R = 8
K = int(os.environ.get("PROF_ITERS", 10))


def timed(f, *args, k=K, reps=3):
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
x = jnp.asarray(rng.standard_normal((R, NP_PTS)).astype(np.float32))
xt = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
idx = jnp.asarray(rng.integers(0, NP_PTS, NSLOTS).astype(np.int32))
valid = jnp.asarray(rng.random(NSLOTS) < 0.9)

mb = R * NSLOTS * 4 / 1e6

t = timed(lambda a, i, v: jnp.take(a, i, axis=1) * v[None, :].astype(a.dtype), x, idx, valid)
print(f"lane take (R, Ns):            {t*1e3:7.2f} ms  {mb/t/1e3:6.1f} GB/s out")

t = timed(
    lambda a, i, v: (jnp.take(a, i, axis=0) * v[:, None].astype(a.dtype)).T,
    xt, idx, valid,
)
print(f"row take (Ns, R) + transpose: {t*1e3:7.2f} ms  {mb/t/1e3:6.1f} GB/s out")


def from_rows(a, i, v):
    at = jax.lax.optimization_barrier(a.T)  # force materialised (Np, R)
    out = jnp.take(at, i, axis=0) * v[:, None].astype(a.dtype)
    return out.T


t = timed(from_rows, x, idx, valid)
print(f"transp + row take + transp:   {t*1e3:7.2f} ms  {mb/t/1e3:6.1f} GB/s out")

# Inverse direction (type-2 un-permute): (CR, Nslots) -> (CR, Np)
sv = jnp.asarray(rng.standard_normal((R, NSLOTS)).astype(np.float32))
pidx = jnp.asarray(rng.integers(0, NSLOTS, NP_PTS).astype(np.int32))
mb2 = 2 * NP_PTS * 4 / 1e6
t = timed(lambda a, i: jnp.take(a[:2], i, axis=1), sv, pidx)
print(f"unperm lane take:             {t*1e3:7.2f} ms  {mb2/t/1e3:6.1f} GB/s out")
t = timed(lambda a, i: jnp.take(jax.lax.optimization_barrier(a.T), i, axis=0)[:, :2].T, sv, pidx)
print(f"unperm via rows:              {t*1e3:7.2f} ms  {mb2/t/1e3:6.1f} GB/s out")
