"""Per-stage device profile of the blocked NUFFT pipeline.

Uses the plan Timer's staged execution (one jitted call per stage with
device sync between stages — execution._exec_type1_ch_staged) plus an
explicit scan-chained measurement of set_points and of the two spread
sub-stages (value permutation vs Pallas kernel).  Every stage timing is
dispatch-corrected by the measured per-call overhead of the tunnel.

Run on the real TPU:  python scripts/profile_stages.py [Np]
Env: PROF_N (grid, default 256), PROF_BLOCKS ("a,b,c"), PROF_REAL=1 (r2c).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

NP_PTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_GRID = int(os.environ.get("PROF_N", 256))
REAL = os.environ.get("PROF_REAL", "0") == "1"
BLOCKS = (
    tuple(int(x) for x in os.environ["PROF_BLOCKS"].split(","))
    if os.environ.get("PROF_BLOCKS")
    else None
)
K = int(os.environ.get("PROF_ITERS", 4))


def main():
    import jax
    import jax.numpy as jnp

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.callbacks import NUFFTCallbacks
    from nonuniformffts_tpu.execution import (
        _exec_type1_ch_staged,
        _exec_type2_ch_staged,
        _exec_type1_ch_impl,
        _exec_type2_ch_impl,
    )
    from nonuniformffts_tpu.utils.timer import Timer

    cbs = NUFFTCallbacks()
    rng = np.random.default_rng(42)
    shape = (N_GRID,) * 3
    pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
    vshape = (1, NP_PTS) if REAL else (1, 2, NP_PTS)
    v_np = rng.standard_normal(vshape).astype(np.float32)

    @jax.jit
    def _noop(x):
        return x * 2.0

    _ = float(_noop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(_noop(jnp.float32(1.0)))
    overhead = (time.perf_counter() - t0) / 5
    print(f"dispatch overhead ~{overhead*1e3:.1f} ms")

    timer = Timer(synchronise=True)
    plan = nufft.PlanNUFFT(
        np.float32 if REAL else np.complex64,
        shape,
        m=4,
        sigma=1.5,
        spread_method="blocked",
        fft_method="matmul",
        np_hint=NP_PTS,
        block_dims=BLOCKS,
        timer=timer,
    )
    print(
        f"blocks={plan.block_dims} pd={plan.padded_dims} form="
        f"{plan.kernel_form} layout={plan.layout} W={plan.window_rows} "
        f"variant={plan.fft_variant}"
    )
    pts = jax.device_put(pts_np)
    v_ch = jax.device_put(v_np)

    # Warm (compiles): one staged pass.
    p = nufft.set_points(plan, pts)
    u = _exec_type1_ch_staged(p, v_ch, cbs)
    v2 = _exec_type2_ch_staged(p, u, cbs)
    jax.block_until_ready(v2)
    timer.reset()

    # Timed passes.
    for _ in range(K):
        p = nufft.set_points(plan, pts)
        u = _exec_type1_ch_staged(p, v_ch, cbs)
        v2 = _exec_type2_ch_staged(p, u, cbs)
        jax.block_until_ready(v2)

    print(f"\n== staged stage times (avg of {K}, dispatch-corrected) ==")
    for name in sorted(timer.times):
        t = timer.times[name] / timer.counts[name] - overhead
        if "/" in name or name == "set_points":
            print(f"  {name:<38}{t*1e3:8.2f} ms")

    # Fused end-to-end (the bench iteration) for cross-checking.
    plan_f = nufft.PlanNUFFT(
        np.float32 if REAL else np.complex64,
        shape,
        m=4,
        sigma=1.5,
        spread_method="blocked",
        fft_method="matmul",
        np_hint=NP_PTS,
        block_dims=BLOCKS,
    )

    def full(pts_a, v_a):
        p = nufft.set_points(plan_f, pts_a)
        u = _exec_type1_ch_impl(p, v_a, cbs)
        return _exec_type2_ch_impl(p, u, cbs)

    jfull = jax.jit(full)
    jax.block_until_ready(jfull(pts, v_ch))
    t0 = time.perf_counter()
    for _ in range(K):
        jax.block_until_ready(jfull(pts, v_ch))
    t_full = (time.perf_counter() - t0) / K - overhead
    print(
        f"\nfused full iteration: {t_full*1e3:.1f} ms "
        f"({NP_PTS/t_full/1e6:.2f} Mpts/s)"
    )


if __name__ == "__main__":
    main()
