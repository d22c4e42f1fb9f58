"""Device experiment: spread/interp kernel knob sweep at the bench point.

Times the spread and interp stages (scan-chained, dispatch-corrected) for a
grid of (batch_size, dma_super, window_rows) configurations to find the
per-batch-overhead vs MXU-width tradeoff.  Np/grid via EXP_NP / EXP_N.
"""

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

    if os.environ.get("EXP_KPREC") == "1":
        # Kernel-contraction precision ladder (DFT stays at plan precision):
        # fxp = 6 int8 limb products (probe: 1.87x vs HIGHEST at M=256);
        # high = bf16x3.  Isolates whether the kernels are MXU-pass-bound.
        configs = [
            dict(),
            dict(kernel_precision="fxp"),
            # bf16x1: accuracy-useless, but isolates the MXU pass count
            # (spread_hi - spread_def ~= 5/6 of the HIGHEST dot time).
            dict(kernel_precision="default"),
        ]
    elif os.environ.get("EXP_ONLY_DEFAULT") == "1":
        configs = [dict()]  # quick A/B of the auto default only
    elif os.environ.get("EXP_AUTOPICK") == "1":
        # Round-4 pressure-penalty model A/B: the cap-free auto search now
        # picks batch 384 @ (48,8,96) at rho=1 (unmeasured) where the old
        # hard cap picked 256 @ (64,8,96) (measured 158/181).  Also the
        # low-density geometry moved (24,48,96) -> (32,32,96).
        configs = [
            dict(),  # new auto pick
            dict(block_dims=(64, 8, 96), batch_size=256),  # old rho=1 pick
            dict(block_dims=(48, 8, 96), batch_size=512),  # measured-fine 512
            dict(block_dims=(24, 48, 96), batch_size=128),  # old low-rho pick
        ]
    elif os.environ.get("EXP_RHO1") == "1":
        # High-density attack: at rho=1 the spread kernel runs ~8x over its
        # MXU MAC floor (~131k batches x ~1.5us fixed per-batch cost), so
        # larger point batches and fewer/fatter programs should win even
        # though they widen the per-batch window span.
        configs = [
            dict(),
            dict(batch_size=256),
            dict(batch_size=512),
            # rho=1 ladder round 4: the kprec A/B showed ~60% of the rho=1
            # kernel time is per-batch fixed cost (bf16x1 only -33%), so the
            # lever is batch count, VMEM cliff permitting.
            dict(block_dims=(64, 8, 96), batch_size=1024),
            dict(block_dims=(64, 8, 96), batch_size=512, spread_acc2=True),
            dict(block_dims=(64, 8, 96), batch_size=1024, dma_super=2),
            dict(block_dims=(96, 8, 96), batch_size=1024),
            dict(batch_size=256, spread_acc2=True),
            dict(block_dims=(64, 16, 96), batch_size=256),
            dict(block_dims=(96, 16, 96), batch_size=256),
            dict(block_dims=(64, 16, 192), batch_size=256),
            dict(block_dims=(32, 8, 96), batch_size=256),
            dict(block_dims=(64, 8, 96), batch_size=512),
            dict(dma_super=8, batch_size=256),
            # pd1 = 8 frontier (b1 = 1 is the only width whose padded dim
            # hits the 8-row floor): halves the contraction's rm redundancy
            # (M = CR*W0*8) against an 8x axis-1 DFT inflation (L1 = 384*8)
            # and ~9k programs.  The calibrated model rejects it; measure.
            dict(block_dims=(64, 1, 96), batch_size=128),
            dict(block_dims=(64, 1, 96), batch_size=256),
            dict(block_dims=(96, 1, 96), batch_size=256),
        ]
    elif os.environ.get("EXP_LOWRHO") == "1":
        # Low-density (rho <= 1e-3) empty-block cost ladder: nearly every
        # program is empty, so the kernel pass cost is nblocks x (program
        # overhead + acc memset + out-block DMA) ~ padded-buffer traffic.
        # Bigger blocks shrink both nblocks and halo-padding inflation
        # until VMEM caps the accumulator.
        configs = [
            dict(),  # auto (round-4 model: (32,32,96) @ 128)
            dict(block_dims=(24, 48, 96), batch_size=128),  # round-3 pick
            dict(block_dims=(48, 48, 96), batch_size=128),
            dict(block_dims=(96, 48, 96), batch_size=128),
            dict(block_dims=(48, 96, 96), batch_size=128),
            dict(block_dims=(96, 16, 96), batch_size=128),
            dict(block_dims=(64, 64, 96), batch_size=128),
        ]
    elif os.environ.get("EXP_PREC") == "1":
        # Kernel contraction precision A/B: bf16x3 (HIGH) vs bf16x6
        # (HIGHEST) at the round-3 measured-winner geometries.  The MXU
        # accumulator is f32 either way; x3 products are f32-exact, so the
        # ladder isolates pure MXU-pass time.
        configs = [
            dict(),
            dict(precision="high"),
            dict(batch_size=256, block_dims=(32, 8, 96)),
            dict(batch_size=256, block_dims=(32, 8, 96), precision="high"),
        ]
    elif os.environ.get("EXP_BLOCKS_SWEEP") == "1":
        # Geometry ladder: fewer/fatter programs (per-program overhead vs
        # VMEM pipelining limits) and dim-1 narrowing (kernel rm vs DFT
        # inflation).
        configs = [
            dict(),
            dict(block_dims=(128, 16, 96)),
            dict(block_dims=(96, 16, 96)),
            dict(block_dims=(64, 8, 96)),
            dict(block_dims=(128, 8, 96)),
            dict(block_dims=(64, 16, 192)),
            dict(block_dims=(96, 24, 96)),
        ]
    else:
        configs = [
            dict(),  # auto baseline (form-aware VMEM model geometry)
            dict(block_dims=(64, 16, 96)),  # round-4 measured default
            dict(block_dims=(48, 24, 96)),  # new-model preference at 1M
            dict(spread_acc2=True),
            dict(batch_size=256),
            dict(batch_size=384),
            dict(batch_size=512),
            dict(dma_super=8),
            dict(batch_size=256, dma_super=8),
            dict(window_rows=None),
        ]
    for cfg in configs:
        try:
            plan = nufft.PlanNUFFT(
                np.complex64, shape, m=4, sigma=1.5,
                spread_method="blocked", fft_method="matmul",
                np_hint=NP_PTS, **cfg,
            )
            p = nufft.set_points(plan, pts)
            buf = _t1_spread_stage(p, v)
            spec = _t1_fft_stage(p, buf)
            halos = _t2_fft_stage(p, spec)
            jax.block_until_ready(halos)

            # The plan pytree rides as a jit ARGUMENT: closing over it ships
            # its device arrays (points_packed is ~600 MB at rho=1) inside
            # the remote-compile request -> HTTP 413 on the axon tunnel.
            def t_sp(c, p_a, v_a):
                return jnp.sum(_t1_spread_stage(p_a, eps_of(c, v_a)))

            def t_it(c, p_a, h_a):
                return jnp.sum(_t2_interp_stage(p_a, eps_of(c, h_a)))

            def t_fwd(c, p_a, b_a):
                return jnp.sum(jnp.abs(_t1_fft_stage(p_a, eps_of(c, b_a))))

            def t_bwd(c, p_a, s_a):
                return jnp.sum(jnp.abs(_t2_fft_stage(p_a, eps_of(c, s_a))))

            t_spread = timed_scan(t_sp, (p, v))
            t_interp = timed_scan(t_it, (p, halos))
            t_f = timed_scan(t_fwd, (p, buf))
            t_b = timed_scan(t_bwd, (p, spec))
            print(
                f"cfg={cfg} blocks={plan.block_dims} W={plan.window_rows} "
                f"W1={plan.window_rows_y} batch={plan.batch_size} "
                f"super={plan.dma_super}: spread={t_spread*1e3:7.2f} ms "
                f"interp={t_interp*1e3:7.2f} ms fwd={t_f*1e3:7.2f} ms "
                f"bwd={t_b*1e3:7.2f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"cfg={cfg}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
