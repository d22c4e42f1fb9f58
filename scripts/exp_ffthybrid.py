"""Experiment: is XLA's native TPU FFT now faster than the blockform
matmul-DFT at the 256^3 bench point?

The matmul engine won its place in round 1 when the spread/interp kernels
cost ~25 ms each and the DFT's fold-in of halo merge + truncation +
deconvolution saved whole passes.  The kernels have since halved; the
forward+backward block-DFTs (15.3 + 12.5 ms) are now the largest combined
stage, so re-measure the alternatives:

  a) blockform z DFT (current default),
  b) fft_method='xla' end-to-end (yz kernels + halo merge + fftn),
  c) raw fftn / ifftn on the oversampled grid (floor for (b)).
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
        _t1_fft_stage,
        _t1_spread_stage,
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

    from nonuniformffts_tpu.callbacks import NUFFTCallbacks
    from nonuniformffts_tpu.execution import _t1_deconv_stage, _t2_pad_stage

    cbs = NUFFTCallbacks()
    methods = tuple(
        os.environ.get("EXP_METHODS", "matmul,xla").split(",")
    )
    for fft_method in methods:
        plan = nufft.PlanNUFFT(
            np.complex64, shape, m=4, sigma=1.5, spread_method="blocked",
            fft_method=fft_method, np_hint=NP_PTS,
            block_dims=(64, 16, 96) if N_GRID == 256 else None,
        )
        p = nufft.set_points(plan, pts)
        buf = _t1_spread_stage(p, v)
        spec = _t1_fft_stage(p, buf)
        # The stage interfaces differ per engine: blockform t1-fft output is
        # directly consumable by the t2 backward; the xla engine needs the
        # channel-form spectrum routed through deconvolve + pad.
        uhat_ch = _t1_deconv_stage(p, spec, cbs)
        spec2 = _t2_pad_stage(p, uhat_ch, cbs)
        halos = _t2_fft_stage(p, spec2)
        jax.block_until_ready(halos)

        def t_sp(c, v_a):
            return jnp.sum(jnp.abs(_t1_spread_stage(p, eps_of(c, v_a))))

        def t_fwd(c, b_a):
            return jnp.sum(jnp.abs(_t1_fft_stage(p, eps_of(c, b_a))))

        def t_bwd(c, s_a):
            h = _t2_fft_stage(p, eps_of(c, s_a))
            if isinstance(h, tuple):
                return sum(jnp.sum(jnp.abs(x)) for x in h)
            return jnp.sum(jnp.abs(h))

        def t_it(c, h_a):
            return jnp.sum(jnp.abs(_t2_interp_stage(p, eps_of(c, h_a))))

        print(f"== fft_method={fft_method} form={p.kernel_form}", flush=True)
        print(f"  spread  {timed_scan(t_sp, (v,))*1e3:7.2f} ms", flush=True)
        print(f"  fwd     {timed_scan(t_fwd, (buf,))*1e3:7.2f} ms", flush=True)
        print(f"  bwd     {timed_scan(t_bwd, (spec2,))*1e3:7.2f} ms", flush=True)
        print(f"  interp  {timed_scan(t_it, (halos,))*1e3:7.2f} ms", flush=True)

    # Floor: raw fftn/ifftn on the oversampled grid.
    over = tuple(int(round(1.5 * n)) for n in shape)
    g = jnp.asarray(
        rng.standard_normal(over) + 1j * rng.standard_normal(over),
        jnp.complex64,
    )

    def t_fft(c, g_a):
        gp = jax.lax.complex(eps_of(c, g_a.real), g_a.imag)
        return jnp.sum(jnp.abs(jnp.fft.fftn(gp)))

    def t_ifft(c, g_a):
        gp = jax.lax.complex(eps_of(c, g_a.real), g_a.imag)
        return jnp.sum(jnp.abs(jnp.fft.ifftn(gp)))

    print(f"raw fftn  {timed_scan(t_fft, (g,))*1e3:7.2f} ms", flush=True)
    print(f"raw ifftn {timed_scan(t_ifft, (g,))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
