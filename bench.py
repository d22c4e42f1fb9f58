"""Benchmark: 3D NUFFT throughput on one TPU chip.

Replicates the reference's benchmark protocol (docs/src/benchmarks.md:5-27,
BASELINE.md): 3D grid 256^3, tolerance ~1e-6 (sigma = 1.5, m = 4, backwards
Kaiser-Bessel), non-uniform points uniformly random in [0, 2pi)^3, complex
data, Np = 1e6 (the BASELINE.json north-star operating point).  The timed
unit is one full pipeline iteration: set_points (device bin-sort) +
exec_type1 + exec_type2, matching the reference's "set_points! + exec"
convention (both transforms share one sort, as in the reference's benchmark
loop).

Timing methodology: the remote-tunnel runtime used here has ~30 ms dispatch
latency per call and a no-op block_until_ready, so per-call wall timing is
meaningless.  Instead K iterations are chained *inside one jitted scan*
(each iteration's inputs depend on the previous carry, preventing CSE /
hoisting) and a scalar result is fetched, which forces full execution; the
measured time minus the dispatch overhead, divided by K, is the per-
iteration device time.

Metric: points/sec = Np / t_iteration.
Baseline: cuFINUFFT on H100 at the nearest committed density point
(Np = 1,677,722: type-1 0.0230 s + type-2 0.0074 s, global-memory method,
ComplexF64 — BASELINE.md), i.e. 55.2e6 points/sec.  The baseline runs f64 on
an H100; we run f32 (the TPU-native precision) at matched ~1e-6 tolerance.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "points/sec", "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

N_GRID = int(os.environ.get("BENCH_N", 256))
NP_PTS = int(os.environ.get("BENCH_NP", 1_000_000))
K_ITERS = int(os.environ.get("BENCH_ITERS", 10))
PRECISION = os.environ.get("BENCH_PRECISION", "highest")
BASELINE_PTS_PER_SEC = 1_677_722 / (0.0230 + 0.0074)  # cuFINUFFT H100, rho=0.1


def main():
    import jax
    import jax.numpy as jnp
    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.callbacks import NUFFTCallbacks
    from nonuniformffts_tpu.execution import (
        _exec_type1_ch_impl,
        _exec_type2_ch_impl,
    )

    on_tpu = jax.default_backend() in ("tpu", "axon")
    shape = (N_GRID,) * 3
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
    v_ch = rng.standard_normal((1, 2, NP_PTS)).astype(np.float32)

    plan = nufft.PlanNUFFT(
        np.complex64,
        shape,
        m=4,
        sigma=1.5,
        spread_method="blocked" if on_tpu else "reference",
        fft_method=None,  # auto: matmul-DFT on TPU, XLA FFT elsewhere
        chunk_size=None if on_tpu else 65536,
        precision=PRECISION,
    )
    cbs = NUFFTCallbacks()

    pts_d = jax.device_put(pts)
    v_d = jax.device_put(v_ch)

    def one_iteration(plan0, pts_in, v_in, carry):
        eps = carry * jnp.float32(0.0)
        p = nufft.set_points(plan0, pts_in + eps)
        u = _exec_type1_ch_impl(p, v_in + eps, cbs)
        v2 = _exec_type2_ch_impl(p, u, cbs)
        return jnp.sum(v2[0, :, :8])

    @jax.jit
    def full_loop(pts_in, v_in):
        def body(c, _):
            return one_iteration(plan, pts_in, v_in, c), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_ITERS)
        return c

    # Stage loops (sorted plan prepared once, outside the timed loop).
    p_sorted = nufft.set_points(plan, pts_d)

    @jax.jit
    def t1_loop(p, v_in):
        def body(c, _):
            u = _exec_type1_ch_impl(p, v_in + c * jnp.float32(0.0), cbs)
            return jnp.sum(u[0, :, :2, 0, 0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_ITERS)
        return c

    @jax.jit
    def t2_loop(p, u_in):
        def body(c, _):
            v2 = _exec_type2_ch_impl(p, u_in + c * jnp.float32(0.0), cbs)
            return jnp.sum(v2[0, :, :8]), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_ITERS)
        return c

    @jax.jit
    def set_loop(pts_in):
        def body(c, _):
            p = nufft.set_points(plan, pts_in + c * jnp.float32(0.0))
            return jnp.sum(p.points[:, :8]) + c * 0, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_ITERS)
        return c

    @jax.jit
    def empty(x):
        return x * 2.0

    u_in = _exec_type1_ch_impl(p_sorted, v_d, cbs)

    def timed(fn, *args):
        _ = float(np.asarray(fn(*args)).ravel()[0])  # warm-up / compile
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args)).ravel()[0])
        return time.perf_counter() - t0

    overhead = min(timed(empty, jnp.float32(1.0)) for _ in range(3))
    t_full = (timed(full_loop, pts_d, v_d) - overhead) / K_ITERS
    t_set = (timed(set_loop, pts_d) - overhead) / K_ITERS
    t_1 = (timed(t1_loop, p_sorted, v_d) - overhead) / K_ITERS
    t_2 = (timed(t2_loop, p_sorted, u_in) - overhead) / K_ITERS

    value = NP_PTS / t_full
    result = {
        "metric": f"3D type-1+type-2 NUFFT points/sec (N={N_GRID}^3, Np={NP_PTS}, "
        f"tol~1e-6: m=4 sigma=1.5 BKB c64; iteration = set_points+type1+type2)",
        "value": value,
        "unit": "points/sec",
        "vs_baseline": value / BASELINE_PTS_PER_SEC,
    }
    print(json.dumps(result))
    print(
        f"# per-iter: full={t_full * 1e3:.2f}ms (set={t_set * 1e3:.2f} t1={t_1 * 1e3:.2f} "
        f"t2={t_2 * 1e3:.2f}) overhead={overhead * 1e3:.1f}ms backend={jax.default_backend()} "
        f"method={plan.spread_method}/{plan.fft_method}/{PRECISION}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
