"""Experiment: scan-chained per-piece timing of the blocked pipeline across
geometries and batch sizes.

Each piece runs K iterations chained inside ONE jitted scan (carry-dependent
non-zero input perturbation + full-output reduction through an
optimization_barrier — the bench.py anti-hoist recipe), so the ~30 ms tunnel
dispatch latency is amortised and the numbers are trustworthy, unlike the
staged (per-call) profile whose compute overlaps the dispatch pipeline.

Pieces: value-gather, spread kernel (pre-gathered values), forward
blockform-z DFT, backward DFT, interp kernel (pre-built buffer), un-permute
sort, set_points.  Run: python scripts/exp_stages2.py "64,16,96" "64,24,96"
Env: EXP_NP (default 1e6), EXP_BATCH (comma list, default 128).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NP_PTS = int(os.environ.get("EXP_NP", 1_000_000))
K = int(os.environ.get("EXP_ITERS", 6))
BATCHES = tuple(
    int(x) for x in os.environ.get("EXP_BATCH", "128").split(",")
)
GEOMS = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [None]


def main():
    import jax
    import jax.numpy as jnp

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.callbacks import NUFFTCallbacks
    from nonuniformffts_tpu.execution import (
        _exec_type1_ch_impl,
        _exec_type2_ch_impl,
        _t1_fft_stage,
        _t1_spread_stage,
        _t2_fft_stage,
        _t2_interp_stage,
    )

    cbs = NUFFTCallbacks()
    rng = np.random.default_rng(42)
    shape = (256, 256, 256)
    pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
    v_np = rng.standard_normal((1, 2, NP_PTS)).astype(np.float32)

    @jax.jit
    def _noop(x):
        return x * 2.0

    _ = float(_noop(jnp.float32(1.0)))
    overhead = min(
        _timeit(lambda: float(_noop(jnp.float32(1.0)))) for _ in range(5)
    )
    print(f"dispatch overhead ~{overhead*1e3:.1f} ms", flush=True)

    def timed_scan(build_body, args, k=K, reps=2):
        @jax.jit
        def loop(*a):
            def body(c, _):
                return jax.lax.optimization_barrier(build_body(c, *a)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        _ = float(loop(*args))
        ts = [_timeit(lambda: float(loop(*args))) for _ in range(reps)]
        return (min(ts) - overhead) / k

    def eps_of(c, x):
        return x + (c * jnp.asarray(1e-30, x.dtype)).astype(x.dtype)

    for blocks in GEOMS:
        for P in BATCHES:
            plan = nufft.PlanNUFFT(
                np.complex64, shape, m=4, sigma=1.5,
                spread_method="blocked", fft_method="matmul",
                np_hint=NP_PTS, block_dims=blocks, batch_size=P,
            )
            print(
                f"\n== blocks={plan.block_dims} pd={plan.padded_dims} "
                f"P={P} W={plan.window_rows} form={plan.kernel_form}",
                flush=True,
            )
            pts = jax.device_put(pts_np)
            v = jax.device_put(v_np)
            p = nufft.set_points(plan, pts)
            buf = _t1_spread_stage(p, v)
            spec = _t1_fft_stage(p, buf)
            halos = _t2_fft_stage(p, spec)
            jax.block_until_ready(halos)

            pieces = {}

            def t_set(c, pts_a):
                pp = nufft.set_points(plan, eps_of(c, pts_a))
                return jnp.sum(pp.points_packed)

            pieces["set_points"] = timed_scan(t_set, (pts,))

            def t_gather(c, v_a):
                vals = jnp.take(
                    eps_of(c, v_a).reshape(2, -1), p.sort_perm, axis=1
                )
                return jnp.sum(vals)

            pieces["value gather"] = timed_scan(t_gather, (v,))

            def t_spread(c, v_a):
                return jnp.sum(_t1_spread_stage(p, eps_of(c, v_a)))

            pieces["spread stage (gather+kernel)"] = timed_scan(t_spread, (v,))

            def t_fwd(c, b_a):
                return jnp.sum(_t1_fft_stage(p, eps_of(c, b_a)))

            pieces["forward DFT"] = timed_scan(t_fwd, (buf,))

            def t_bwd(c, s_a):
                return jnp.sum(_t2_fft_stage(p, eps_of(c, s_a)))

            pieces["backward DFT"] = timed_scan(t_bwd, (spec,))

            def t_interp(c, h_a):
                return jnp.sum(_t2_interp_stage(p, eps_of(c, h_a)))

            pieces["interp stage (kernel+unperm)"] = timed_scan(
                t_interp, (halos,)
            )

            def t_t1(c, v_a):
                return jnp.sum(_exec_type1_ch_impl(p, eps_of(c, v_a), cbs))

            pieces["type-1 total"] = timed_scan(t_t1, (v,))

            def t_t2(c, s_a):
                return jnp.sum(_exec_type2_ch_impl(p, eps_of(c, s_a), cbs))

            spec_t = spec  # channel-form truncated spectrum
            pieces["type-2 total"] = timed_scan(t_t2, (spec_t,))

            for k_, v_ in pieces.items():
                print(f"  {k_:<34}{v_*1e3:8.2f} ms", flush=True)


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
