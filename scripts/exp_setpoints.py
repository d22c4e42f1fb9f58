"""Device experiment: set_points stage attribution.

Decomposes the packed set_points pass (plan.py:_pack_points_jit ->
blocking.packed_layout) into its pipeline stages and times each cumulative
prefix (scan-chained, dispatch-corrected), so the committed set_points
number is attributable: cell/frac split, the multi-operand sort, the
searchsorted block ranges, the per-batch window metadata (r0/r1), and the
row stack.  Np via EXP_NP (default 1e6), grid via EXP_N (default 256).

The stages share no state across timings (each prefix recomputes), so the
deltas between successive rows are the marginal stage costs.
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
    from nonuniformffts_tpu import blocking

    rng = np.random.default_rng(42)
    shape = (N_GRID,) * 3
    pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)

    plan = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5, spread_method="blocked",
        fft_method="matmul", np_hint=NP_PTS,
    )
    print(f"blocks={plan.block_dims} batch={plan.batch_size} "
          f"W={plan.window_rows} W1={plan.window_rows_y}", flush=True)

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
    kd = plan.kernel_data
    bdims = plan.block_dims
    P = plan.batch_size
    D = 3

    def s_cells(c, pts_a):
        cells, fracs = blocking.cells_and_fracs(kd, eps_of(c, pts_a))
        return jnp.sum(fracs) + jnp.sum(cells.astype(jnp.float32))

    def _keyed(pts_a):
        cells, fracs = blocking.cells_and_fracs(kd, pts_a)
        nb = [k.n // b for k, b in zip(kd, bdims)]
        bid = None
        lcell = None
        for d in range(D):
            bd = cells[d] // bdims[d]
            ld = cells[d] - bd * bdims[d]
            bid = bd if bid is None else bid * jnp.int32(nb[d]) + bd
            lcell = (
                ld if lcell is None else lcell * jnp.int32(bdims[d]) + ld
            )
        sub = 1
        for b in bdims:
            sub *= int(b)
        return bid * jnp.int32(sub) + lcell, fracs

    def s_sort(c, pts_a):
        key, fracs = _keyed(eps_of(c, pts_a))
        iota = jnp.arange(NP_PTS, dtype=jnp.int32)
        ops = jax.lax.sort(
            (key,) + tuple(fracs[d] for d in range(D)) + (iota,), num_keys=1
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in ops)

    def s_full(c, pts_a):
        out = blocking.packed_layout(kd, bdims, eps_of(c, pts_a), P,
                                     window=(plan.m, plan.window_rows,
                                             plan.padded_dims[0],
                                             plan.window_align)
                                     if plan.window_rows else None)
        acc = jnp.sum(out[0])
        for o in out[1:]:
            if o is not None:
                acc = acc + jnp.sum(o.astype(jnp.float32))
        return acc

    def s_setpoints(c, pts_a):
        p = nufft.set_points(plan, eps_of(c, pts_a))
        return jnp.sum(p.points_packed)

    for name, body in (("cells+fracs", s_cells), ("+key+sort", s_sort),
                       ("packed_layout", s_full),
                       ("set_points (public)", s_setpoints)):
        t = timed_scan(body, (pts,))
        print(f"{name:22s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
