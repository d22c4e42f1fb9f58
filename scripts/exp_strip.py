"""Device experiment: per-batch stage attribution of the z-form kernels.

Times the spread and interp stages with one named stage replaced by a cheap
stand-in (plan.debug_strip), so each stage's cost falls out by differencing:

  baseline - strip('weights')  = decode + Horner + wt-matrix builds + Khatri
  baseline - strip('horner')   = the three Horner chains alone
  baseline - strip('dot')      = the MXU contraction (minus one VPU pass)
  baseline - strip('acc')      = the spread accumulator RMW (dynamic offsets)
  baseline - strip('rowsum')   = the interp channel row-reduction

Results are numerically WRONG with a strip set — timing only.
EXP_NP / EXP_N select the point; defaults 1M @ 256^3 (the bench headline).
EXP_KPREC sets plan kernel_precision (e.g. 'fxp') so the int8 fixed-point
contraction can be stage-laddered at the same geometry (the round-4/5
"kernel-fxp rho=1 ladder").  EXP_BATCH / EXP_BLOCKS override geometry.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NP_PTS = int(os.environ.get("EXP_NP", 1_000_000))
N_GRID = int(os.environ.get("EXP_N", 256))
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

    rng = np.random.default_rng(42)
    shape = (N_GRID,) * 3
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

    kw = {}
    if os.environ.get("EXP_KPREC"):
        kw["kernel_precision"] = os.environ["EXP_KPREC"]
    if os.environ.get("EXP_BATCH"):
        b = os.environ["EXP_BATCH"]
        kw["batch_size"] = b if b == "auto" else int(b)
    if os.environ.get("EXP_BLOCKS"):
        kw["block_dims"] = tuple(
            int(x) for x in os.environ["EXP_BLOCKS"].split(",")
        )
    if os.environ.get("EXP_WROWS"):
        kw["window_rows"] = int(os.environ["EXP_WROWS"])
    base = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5,
        spread_method="blocked", fft_method="matmul", np_hint=NP_PTS, **kw,
    )
    p0 = nufft.set_points(base, pts)
    buf = _t1_spread_stage(p0, v)
    spec = _t1_fft_stage(p0, buf)
    halos = _t2_fft_stage(p0, spec)
    jax.block_until_ready(halos)
    print(
        f"geometry blocks={base.block_dims} batch={base.batch_size} "
        f"W={base.window_rows} W1={base.window_rows_y} "
        f"super={base.dma_super}",
        flush=True,
    )

    # 'dma' / 'nodma' are the PROFILE.md round-4 DMA/compute split — part
    # of the default set so a default run reproduces the documented result.
    default = "none,weights,horner,dot,acc,rowsum,loop,branch,stack,dma,nodma"
    names = os.environ.get("EXP_STRIPS", default).split(",")
    strips = [None if n in ("none", "") else n for n in names]
    for s in strips:
        p = dataclasses.replace(p0, debug_strip=s)
        try:
            def t_sp(c, p_a, v_a):
                return jnp.sum(_t1_spread_stage(p_a, eps_of(c, v_a)))

            def t_it(c, p_a, h_a):
                return jnp.sum(_t2_interp_stage(p_a, eps_of(c, h_a)))

            t_spread = (
                timed_scan(t_sp, (p, v))
                if s not in ("rowsum",)
                else float("nan")
            )
            t_interp = (
                timed_scan(t_it, (p, halos))
                if s not in ("acc", "stack")
                else float("nan")
            )
            print(
                f"strip={str(s):8s}: spread={t_spread*1e3:7.2f} ms "
                f"interp={t_interp*1e3:7.2f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"strip={s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
