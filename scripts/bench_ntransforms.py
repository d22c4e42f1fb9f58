"""Device benchmark: batched simultaneous transforms (ntransforms = C).

The reference amortises the point sort and window evaluation over C
components (C17; CHANGELOG v0.9.3/v0.9.4 fixed C >= 32 performance); here
the channel-stacked kernels put all CR = 2C components into the MXU M
dimension of one contraction, so throughput in point-values/s should rise
with C until the MXU row tiles saturate.

Usage: python scripts/bench_ntransforms.py [Np] [N]
Prints one line per C in (1, 2, 4, 8): full iteration time and Mvals/s.
"""

import sys
import time

import numpy as np

NP_PTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K = 4

import jax
import jax.numpy as jnp

import nonuniformffts_tpu as nufft
from nonuniformffts_tpu.callbacks import NUFFTCallbacks
from nonuniformffts_tpu.execution import _exec_type1_ch_impl, _exec_type2_ch_impl

cbs = NUFFTCallbacks()
shape = (N_GRID,) * 3
rng = np.random.default_rng(42)
pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)


def timeit(fn, *args, reps=2):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(jax.tree.map(
                lambda x: x + (c * jnp.asarray(1e-30, x.dtype)).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            s = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(out))
            return jax.lax.optimization_barrier(s), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    _ = float(loop(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


for C in (1, 2, 4, 8):
    plan = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5, ntransforms=C,
        spread_method="blocked", fft_method="matmul", precision="highest",
        np_hint=NP_PTS,
    )
    v_np = rng.standard_normal((C, 2, NP_PTS)).astype(np.float32)
    pts = jax.device_put(pts_np)
    v = jax.device_put(v_np)

    def full(a):
        pts_a, v_a = a[0]
        p = nufft.set_points(plan, pts_a)
        u = _exec_type1_ch_impl(p, v_a, cbs)
        v2 = _exec_type2_ch_impl(p, u, cbs)
        return jnp.sum(u) + jnp.sum(v2)

    try:
        t = timeit(full, (pts, v))
    except Exception as e:  # HBM limit: C=8 at 256^3 needs ~7 GB of padded
        # block buffers alone; run large C at a smaller grid, or exec in
        # component groups against the same (sorted) plan.
        print(f"C={C}: failed ({type(e).__name__}) — grid too large for this "
              f"C on one chip; rerun with N=128", flush=True)
        continue
    print(
        f"C={C}: blocks={plan.block_dims} full={t*1e3:8.1f} ms  "
        f"{C * NP_PTS / t / 1e6:6.2f} Mvals/s  "
        f"({NP_PTS / t / 1e6:5.2f} Mpts/s)",
        flush=True,
    )
