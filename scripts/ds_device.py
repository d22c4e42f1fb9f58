"""On-device certification of the extended-precision (ds) pipeline.

Runs the complex128 + precision='double' blocked pipeline COMPILED on the
real TPU (no interpret mode) and measures achieved relative error against
f64 host oracles — the device twin of tests/test_ds.py's interpret-mode
checks, and the row the round-3 verdict asked for: tolerances below the
f32 pipeline's ~2e-7 storage ceiling, delivered on the chip.

- type 1: exact f64 sums over a random mode subsample (bench.py protocol);
- type 2: rank-1 separable spectrum -> closed-form exact values per point;
- also times one full iteration (set_points + type1 + type2).

With DS_BENCH=1 the last complex m's timing row (plus a stage split and
the f32-pipeline time at the identical operating point) is merged into
BENCH_SWEEP.json under the "ds" key — the committed price of
precision='double' (VERDICT round-4 #4).

Run: python scripts/ds_device.py   (env: DS_N grid, DS_NP points, DS_M m)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_GRID = int(os.environ.get("DS_N", 64))
NP_PTS = int(os.environ.get("DS_NP", 200_000))
M_LIST = [int(x) for x in os.environ.get("DS_M", "4,6,8,10").split(",")]
ERR_MODES = int(os.environ.get("DS_MODES", 384))


def main():
    import jax

    import nonuniformffts_tpu as nufft

    shape = (N_GRID,) * 3
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 2 * np.pi, (3, NP_PTS))  # float64, stays f64
    vc = rng.standard_normal(NP_PTS) + 1j * rng.standard_normal(NP_PTS)
    v = vc[None, :]

    # --- type-1 oracle: exact sums at a mode subsample (f64 host) --------
    mrng = np.random.default_rng(7)
    kidx = mrng.integers(0, N_GRID, (ERR_MODES, 3))
    kval = np.where(kidx >= (N_GRID + 1) // 2, kidx - N_GRID, kidx).astype(
        np.float64
    )
    exact1 = np.zeros(ERR_MODES, np.complex128)
    chunk = 131072
    for s in range(0, NP_PTS, chunk):
        ph = (
            kval[:, 0:1] * pts[0:1, s : s + chunk]
            + kval[:, 1:2] * pts[1:2, s : s + chunk]
            + kval[:, 2:3] * pts[2:3, s : s + chunk]
        )
        exact1 += (np.exp(-1j * ph) * vc[None, s : s + chunk]).sum(axis=1)

    # --- type-2 oracle: rank-1 separable spectrum -------------------------
    a = [
        (mrng.standard_normal(N_GRID) + 1j * mrng.standard_normal(N_GRID))
        for _ in range(3)
    ]
    uhat_sep = np.einsum("i,j,k->ijk", a[0], a[1], a[2])
    ks = np.fft.fftfreq(N_GRID, 1.0 / N_GRID).astype(np.float64)
    exact2 = np.ones(NP_PTS, np.complex128)
    for d in range(3):
        exact2 *= (
            a[d][None, :] * np.exp(1j * pts[d][:, None] * ks[None, :])
        ).sum(axis=1)

    ds_row = None
    for m in M_LIST:
        try:
            plan = nufft.PlanNUFFT(
                np.complex128, shape, m=m, sigma=2.0, precision="double",
                spread_method="blocked", np_hint=NP_PTS,
            )
            t0 = time.perf_counter()
            p = nufft.set_points(plan, pts)
            u = np.asarray(nufft.exec_type1(p, v))
            v2 = np.asarray(nufft.exec_type2(p, uhat_sep[None]))
            t_first = time.perf_counter() - t0  # includes compile

            got1 = u[0][kidx[:, 0], kidx[:, 1], kidx[:, 2]]
            e1 = np.linalg.norm(got1 - exact1) / np.linalg.norm(exact1)
            e2 = np.linalg.norm(v2[0] - exact2) / np.linalg.norm(exact2)

            t0 = time.perf_counter()
            p = nufft.set_points(plan, pts)
            u = nufft.exec_type1(p, v)
            v2 = nufft.exec_type2(p, uhat_sep[None])
            t_iter = time.perf_counter() - t0
            print(
                f"m={m:2d} sigma=2.0 N={N_GRID}^3 Np={NP_PTS}: "
                f"err1={e1:.3e} err2={e2:.3e} iter={t_iter*1e3:.1f} ms "
                f"(first {t_first:.1f} s) blocks={plan.block_dims} "
                f"batch={plan.batch_size}",
                flush=True,
            )
            # Stage split (host-walltime per stage, device-synced through
            # the host conversions) for the committed ds row.
            t0 = time.perf_counter()
            p = nufft.set_points(plan, pts)
            import jax as _jax

            _jax.block_until_ready(p.points_packed)
            t_set = time.perf_counter() - t0
            t0 = time.perf_counter()
            u = nufft.exec_type1(p, v)
            t_t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            v2 = nufft.exec_type2(p, uhat_sep[None])
            t_t2 = time.perf_counter() - t0
            ds_row = {
                "mode": "complex128 precision='double' (ds)",
                "N": N_GRID, "Np": NP_PTS, "m": m, "sigma": 2.0,
                "err_type1": float(e1), "err_type2": float(e2),
                "t_iter_s": t_iter, "t_set_s": t_set,
                "t_type1_s": t_t1, "t_type2_s": t_t2,
                "pts_per_sec": NP_PTS / t_iter,
                "blocks": list(plan.block_dims),
                "batch": plan.batch_size,
            }
        except Exception as e:
            print(f"m={m}: FAILED {type(e).__name__}: {e}", flush=True)

    if ds_row is not None and os.environ.get("DS_BENCH") == "1":
        # f32-pipeline time at the IDENTICAL operating point (same m/sigma
        # for a like-for-like price; accuracy differs by construction).
        try:
            p32 = nufft.PlanNUFFT(
                np.complex64, shape, m=ds_row["m"], sigma=2.0,
                spread_method="blocked", np_hint=NP_PTS,
            )
            pts32 = pts.astype(np.float32)
            v32 = np.stack([vc.real, vc.imag]).astype(np.float32)[None]
            from nonuniformffts_tpu.execution import (
                exec_type1_channels, exec_type2_channels,
            )
            import jax as _jax

            ps = nufft.set_points(p32, _jax.device_put(pts32))
            u32 = exec_type1_channels(ps, _jax.device_put(v32))
            v232 = exec_type2_channels(ps, u32)  # warm BOTH directions
            _jax.block_until_ready(v232)
            t0 = time.perf_counter()
            ps = nufft.set_points(p32, _jax.device_put(pts32))
            u32 = exec_type1_channels(ps, _jax.device_put(v32))
            v232 = exec_type2_channels(ps, u32)
            _jax.block_until_ready(v232)
            ds_row["t_iter_f32_s"] = time.perf_counter() - t0
            ds_row["slowdown_vs_f32"] = (
                ds_row["t_iter_s"] / ds_row["t_iter_f32_s"]
            )
        except Exception as e:
            print(f"f32 baseline: FAILED {type(e).__name__}: {e}", flush=True)
        import json

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SWEEP.json",
        )
        doc = {}
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
        doc["ds"] = ds_row
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"ds row committed to BENCH_SWEEP.json: {ds_row}", flush=True)

    # --- float64 REAL-data ds pipeline (r2c) ------------------------------
    # The extended-precision twin of the reference's flagship Float64
    # real-data transforms (src/plan.jl:3-16 RealNUFFTData).
    vr = np.ascontiguousarray(vc.real)
    exact1r = np.zeros(ERR_MODES, np.complex128)
    kidxr = mrng.integers(0, N_GRID, (ERR_MODES, 3))
    kidxr[:, 2] = mrng.integers(0, N_GRID // 2 + 1, ERR_MODES)
    kvalr = np.where(kidxr >= (N_GRID + 1) // 2, kidxr - N_GRID, kidxr).astype(
        np.float64
    )
    kvalr[:, 2] = kidxr[:, 2]  # halved axis stores k = 0..+N/2
    for s in range(0, NP_PTS, chunk):
        ph = (
            kvalr[:, 0:1] * pts[0:1, s : s + chunk]
            + kvalr[:, 1:2] * pts[1:2, s : s + chunk]
            + kvalr[:, 2:3] * pts[2:3, s : s + chunk]
        )
        exact1r += (np.exp(-1j * ph) * vr[None, s : s + chunk]).sum(axis=1)
    # c2r type-2 rank-1 oracle (convention pinned by tests/test_accuracy.py
    # ::test_c2r_type2_rank1_oracle_convention): Hermitian full-axis factors
    # with zero Nyquist; halved-axis factor doubled-realified for k2 > 0.
    H = N_GRID // 2 + 1

    def herm_full(n):
        x = (mrng.standard_normal(n) + 1j * mrng.standard_normal(n)) / n
        x[0] = x[0].real
        x[n // 2] = 0.0
        x[n // 2 + 1 :] = np.conj(x[1 : n // 2][::-1])
        return x

    a0, a1 = herm_full(N_GRID), herm_full(N_GRID)
    a2h = (mrng.standard_normal(H) + 1j * mrng.standard_normal(H)) / N_GRID
    a2h[0] = a2h[0].real
    uhat_r = np.einsum("i,j,k->ijk", a0, a1, a2h)
    exact2r = np.ones(NP_PTS, np.float64)
    for d, af in ((0, a0), (1, a1)):
        exact2r *= (
            np.exp(1j * np.outer(pts[d], ks)) @ af.astype(np.complex128)
        ).real
    kh = np.arange(H, dtype=np.float64)
    terms = np.exp(1j * np.outer(pts[2], kh)) * a2h
    exact2r *= terms[:, 0].real + 2.0 * np.sum(terms[:, 1:].real, axis=1)

    for m in M_LIST:
        try:
            plan = nufft.PlanNUFFT(
                np.float64, shape, m=m, sigma=2.0, precision="double",
                spread_method="blocked", np_hint=NP_PTS,
            )
            p = nufft.set_points(plan, pts)
            u = np.asarray(nufft.exec_type1(p, vr[None]))
            v2 = np.asarray(nufft.exec_type2(p, uhat_r[None]))
            got1 = u[0][kidxr[:, 0], kidxr[:, 1], kidxr[:, 2]]
            e1 = np.linalg.norm(got1 - exact1r) / np.linalg.norm(exact1r)
            e2 = np.linalg.norm(v2[0] - exact2r) / np.linalg.norm(exact2r)
            t0 = time.perf_counter()
            p = nufft.set_points(plan, pts)
            u = nufft.exec_type1(p, vr[None])
            v2 = nufft.exec_type2(p, uhat_r[None])
            t_iter = time.perf_counter() - t0
            print(
                f"REAL m={m:2d} sigma=2.0 N={N_GRID}^3 Np={NP_PTS}: "
                f"err1={e1:.3e} err2={e2:.3e} iter={t_iter*1e3:.1f} ms "
                f"blocks={plan.block_dims} batch={plan.batch_size}",
                flush=True,
            )
        except Exception as e:
            print(f"REAL m={m}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
