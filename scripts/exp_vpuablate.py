"""Ablate the spread/interp kernels' in-kernel VPU stages to locate the
non-MXU overhead (measured: ~15 of 20 ms at the bench point).

Variants (monkeypatched at trace time; results numerically WRONG for B/C/D
— timing only):
  A baseline
  B wlast build skipped (constant (pdL, P) matrix)
  C all wt-matrix builds skipped (constant matrices, real Horner kept)
  D C + window evaluation skipped (constant tap values)

Run on the TPU: python scripts/exp_vpuablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NP_PTS = int(os.environ.get("EXP_NP", 1_000_000))
K = int(os.environ.get("EXP_ITERS", 6))


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import (
        _t1_spread_stage,
        _t1_fft_stage,
        _t2_fft_stage,
        _t2_interp_stage,
    )
    from nonuniformffts_tpu.ops.pallas import common

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

    pts = jax.device_put(pts_np)
    v = jax.device_put(v_np)

    plan = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5, spread_method="blocked",
        fft_method="matmul", np_hint=NP_PTS,
    )
    p = nufft.set_points(plan, pts)

    orig_wt = common.build_wt_matrix
    orig_wtw = common.build_wt_matrix_window
    orig_ww = common.window_weights

    def wt_const(vals, c, block_origin, m, pd, P, B):
        base = vals[0] * 0.5 + vals[1] * 0.25  # keep inputs live
        return jnp.broadcast_to(base, (pd, P)) * 1e-3

    def wtw_const(vals, c, block_origin, m, W, P, r0):
        base = vals[0] * 0.5 + vals[1] * 0.25
        return jnp.broadcast_to(base, (W, P)) * 1e-3

    def ww_const(kd, evalmode, X, cs, *, ds=False):
        # Trivial affine taps (no Horner chain; dead original is never
        # traced so Mosaic cannot keep it alive).  Tap-major (2M, P) form
        # (window_weights' current contract).
        t_col = jax.lax.broadcasted_iota(  # int iota: Mosaic has no f32 iota
            jnp.int32, (2 * kd.m, 1), 0
        ).astype(X.dtype)
        return X * 1e-3 + t_col

    def wt_const_last_only(vals, c, block_origin, m, pd, P, B):
        if pd == plan.padded_dims[-1]:
            return wt_const(vals, c, block_origin, m, pd, P, B)
        return orig_wt(vals, c, block_origin, m, pd, P, B)

    variants = [
        ("A baseline", {}),
        ("B wlast const", {"build_wt_matrix": wt_const_last_only}),
        (
            "C all wt const",
            {
                "build_wt_matrix": wt_const,
                "build_wt_matrix_window": wtw_const,
            },
        ),
        (
            "D C + taps const",
            {
                "build_wt_matrix": wt_const,
                "build_wt_matrix_window": wtw_const,
                "window_weights": ww_const,
            },
        ),
    ]
    buf = _t1_spread_stage(p, v)
    spec = _t1_fft_stage(p, buf)
    halos = _t2_fft_stage(p, spec)
    jax.block_until_ready(halos)

    for name, patches in variants:
        for attr, fn in patches.items():
            setattr(common, attr, fn)
        try:

            def t_sp(c, v_a):
                return jnp.sum(jnp.abs(_t1_spread_stage(p, eps_of(c, v_a))))

            def t_it(c, h_a):
                return jnp.sum(jnp.abs(_t2_interp_stage(p, eps_of(c, h_a))))

            t_spread = timed_scan(t_sp, (v,))
            t_interp = timed_scan(t_it, (halos,))
            print(
                f"{name:18s}: spread={t_spread*1e3:7.2f} ms "
                f"interp={t_interp*1e3:7.2f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            common.build_wt_matrix = orig_wt
            common.build_wt_matrix_window = orig_wtw
            common.window_weights = orig_ww


if __name__ == "__main__":
    main()
