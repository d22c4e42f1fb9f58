"""Experiment: is the spread/interp kernel MXU-bound?  Time the kernel
stages at precision='default' (1-pass bf16 dots) vs 'highest' (6-pass).
If the stage time scales with the pass count, the windowed contraction MACs
are the binding cost; if not, the overhead is elsewhere (VPU weights/DMA).
Also sweeps window_rows to separate the W-proportional MXU term.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NP_PTS = int(os.environ.get("EXP_NP", 1_000_000))
K = int(os.environ.get("EXP_ITERS", 6))


def main():
    import jax
    import jax.numpy as jnp

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        _t1_spread_stage,
        _t2_fft_stage,
        _t1_fft_stage,
        _t2_interp_stage,
    )

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

    cases = [
        dict(precision="highest"),
        dict(precision="default"),
        dict(precision="highest", window_rows=None),
        dict(precision="default", window_rows=None),
    ]
    for kw in cases:
        plan = nufft.PlanNUFFT(
            np.complex64, shape, m=4, sigma=1.5, spread_method="blocked",
            fft_method="matmul", np_hint=NP_PTS, block_dims=(64, 16, 96),
            **kw,
        )
        pts = jax.device_put(pts_np)
        v = jax.device_put(v_np)
        p = nufft.set_points(plan, pts)
        buf = _t1_spread_stage(p, v)
        spec = _t1_fft_stage(p, buf)
        halos = _t2_fft_stage(p, spec)
        jax.block_until_ready(halos)

        def t_spread(c, v_a):
            return jnp.sum(_t1_spread_stage(p, eps_of(c, v_a)))

        def t_interp(c, h_a):
            return jnp.sum(_t2_interp_stage(p, eps_of(c, h_a)))

        ts = timed_scan(t_spread, (v,))
        ti = timed_scan(t_interp, (halos,))
        print(
            f"prec={kw.get('precision'):<8} W={plan.window_rows} "
            f"spread={ts*1e3:7.2f} ms  interp={ti*1e3:7.2f} ms",
            flush=True,
        )


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
