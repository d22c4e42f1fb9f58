"""On-device accuracy certification of high-accuracy operating points.

Measures the achieved relative L2 error of the compiled TPU pipeline
(blocked Pallas kernels + blockform matmul-DFT) at tolerance-ladder
operating points: m = 4/6/8, sigma = 1.5/2, precision = 'highest' (bf16x6,
exact-f32-ish products) and 'double' (chunked double-single accumulation,
matmul_fft._mm_ds) — the counterpart of the reference's f64 accuracy ladder
(test/accuracy.jl:7-27), with the f32-storage ceiling measured honestly.

Oracle: exact f64 DFT sums over a random mode subsample on the host
(same protocol as bench.py).  Run on the TPU: python scripts/accuracy_device.py
Env: ACC_N (grid, default 128), ACC_NP (points, default 200000).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_GRID = int(os.environ.get("ACC_N", 128))
NP_PTS = int(os.environ.get("ACC_NP", 200_000))
ERR_MODES = int(os.environ.get("ACC_MODES", 384))


def main():
    import jax
    import jax.numpy as jnp

    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.callbacks import NUFFTCallbacks
    from nonuniformffts_tpu.execution import (
        _exec_type1_ch_impl,
        _exec_type2_ch_impl,
    )

    cbs = NUFFTCallbacks()
    shape = (N_GRID,) * 3
    rng = np.random.default_rng(42)
    pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
    v_np = rng.standard_normal((1, 2, NP_PTS)).astype(np.float32)
    pts = jax.device_put(pts_np)
    v = jax.device_put(v_np)

    # Exact type-1 sums at a mode subsample (f64 host).
    mrng = np.random.default_rng(7)
    kidx = mrng.integers(0, N_GRID, (ERR_MODES, 3))
    kval = np.where(
        kidx >= (N_GRID + 1) // 2, kidx - N_GRID, kidx
    ).astype(np.float64)
    vc = (v_np[0, 0] + 1j * v_np[0, 1]).astype(np.complex128)
    x64 = pts_np.astype(np.float64)
    exact = np.zeros(ERR_MODES, np.complex128)
    chunk = 131072
    for s in range(0, NP_PTS, chunk):
        ph = (
            kval[:, 0:1] * x64[0:1, s : s + chunk]
            + kval[:, 1:2] * x64[1:2, s : s + chunk]
            + kval[:, 2:3] * x64[2:3, s : s + chunk]
        )
        exact += np.exp(-1j * ph) @ vc[s : s + chunk]

    # Exact type-2 values via a rank-1 spectrum.
    arng = np.random.default_rng(8)
    a = [
        (arng.standard_normal(N_GRID) + 1j * arng.standard_normal(N_GRID))
        / N_GRID
        for _ in range(3)
    ]
    u_r1 = np.einsum("a,b,c->abc", *a).astype(np.complex64)
    u_ch = np.stack([u_r1.real, u_r1.imag])[None]
    sel = np.random.default_rng(9).integers(0, NP_PTS, 4096)
    kfull = np.fft.fftfreq(N_GRID, 1.0 / N_GRID).astype(np.float64)
    exact2 = np.ones(4096, np.complex128)
    for d in range(3):
        exact2 *= np.exp(1j * np.outer(x64[:, sel][d], kfull)) @ a[d].astype(
            np.complex128
        )

    points = [
        (4, 1.5, "highest"),
        (4, 2.0, "highest"),
        (6, 1.5, "double"),
        (6, 2.0, "double"),
        (8, 2.0, "double"),
        (6, 2.0, "highest"),  # ablation: how much does 'double' buy
    ]
    for m, sigma, prec in points:
        try:
            plan = nufft.PlanNUFFT(
                np.complex64, shape, m=m, sigma=sigma,
                spread_method="blocked", fft_method="matmul",
                precision=prec, np_hint=NP_PTS,
            )
            p = nufft.set_points(plan, pts)
            t0 = time.perf_counter()
            u_dev = np.asarray(_exec_type1_ch_impl(p, v, cbs))
            t1 = time.perf_counter() - t0
            u_c = u_dev[0, 0] + 1j * u_dev[0, 1]
            got = u_c[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
            err1 = float(
                np.linalg.norm(got - exact) / np.linalg.norm(exact)
            )
            v_dev = np.asarray(
                _exec_type2_ch_impl(p, jnp.asarray(u_ch), cbs)
            )
            v_c = (v_dev[0, 0] + 1j * v_dev[0, 1])[sel]
            err2 = float(
                np.linalg.norm(v_c - exact2) / np.linalg.norm(exact2)
            )
            print(
                f"m={m} sigma={sigma} prec={prec:8s}: err1={err1:.3e} "
                f"err2={err2:.3e} (t1 first-call {t1:.2f}s, "
                f"blocks={plan.block_dims})",
                flush=True,
            )
        except Exception as e:
            print(
                f"m={m} sigma={sigma} prec={prec}: FAILED "
                f"{type(e).__name__}: {e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
