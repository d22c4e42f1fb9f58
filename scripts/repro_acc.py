"""Reproduce the device accuracy-ladder failures (m=6/8, sigma=2) on CPU.

Device run (/tmp/accuracy_device_r03.log) showed:
  m=6 sigma=2 (double & highest): err1 ok, err2 ~1e-2  -> type-2 broken
  m=8 sigma=2 double:             err1 nan, err2 1.0   -> type-1 broken too
Runs the same plans in interpret mode (CPU) at reduced Np to decide whether
the bug is in the lowered Mosaic kernels (interpret passes) or in the
geometry/plan math (interpret fails too).
Env: REPRO_N (default 128), REPRO_NP (default 20000).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

N_GRID = int(os.environ.get("REPRO_N", 128))
NP_PTS = int(os.environ.get("REPRO_NP", 20_000))
ERR_MODES = 256


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

    mrng = np.random.default_rng(7)
    kidx = mrng.integers(0, N_GRID, (ERR_MODES, 3))
    kval = np.where(
        kidx >= (N_GRID + 1) // 2, kidx - N_GRID, kidx
    ).astype(np.float64)
    vc = (v_np[0, 0] + 1j * v_np[0, 1]).astype(np.complex128)
    x64 = pts_np.astype(np.float64)
    ph = (
        kval[:, 0:1] * x64[0:1]
        + kval[:, 1:2] * x64[1:2]
        + kval[:, 2:3] * x64[2:3]
    )
    exact = np.exp(-1j * ph) @ vc

    arng = np.random.default_rng(8)
    a = [
        (arng.standard_normal(N_GRID) + 1j * arng.standard_normal(N_GRID))
        / N_GRID
        for _ in range(3)
    ]
    u_r1 = np.einsum("a,b,c->abc", *a).astype(np.complex64)
    u_ch = np.stack([u_r1.real, u_r1.imag])[None]
    sel = np.random.default_rng(9).integers(0, NP_PTS, 2048)
    kfull = np.fft.fftfreq(N_GRID, 1.0 / N_GRID).astype(np.float64)
    exact2 = np.ones(2048, np.complex128)
    for d in range(3):
        exact2 *= np.exp(1j * np.outer(x64[:, sel][d], kfull)) @ a[d].astype(
            np.complex128
        )

    points = [
        (4, 2.0, "highest", None),
        (6, 2.0, "highest", None),
        (6, 2.0, "highest", (64, 16, 64)),  # device-chosen geometry
        (8, 2.0, "double", (64, 16, 64)),
        (8, 2.0, "highest", (64, 16, 64)),
    ]
    for m, sigma, prec, blocks in points:
        try:
            plan = nufft.PlanNUFFT(
                np.complex64, shape, m=m, sigma=sigma,
                spread_method="blocked", fft_method="matmul",
                precision=prec, np_hint=200_000, block_dims=blocks,
            )
            p = nufft.set_points(plan, pts)
            u_dev = np.asarray(_exec_type1_ch_impl(p, v, cbs))
            u_c = u_dev[0, 0] + 1j * u_dev[0, 1]
            got = u_c[kidx[:, 0], kidx[:, 1], kidx[:, 2]]
            err1 = float(np.linalg.norm(got - exact) / np.linalg.norm(exact))
            v_dev = np.asarray(_exec_type2_ch_impl(p, jnp.asarray(u_ch), cbs))
            v_c = (v_dev[0, 0] + 1j * v_dev[0, 1])[sel]
            err2 = float(
                np.linalg.norm(v_c - exact2) / np.linalg.norm(exact2)
            )
            print(
                f"m={m} sigma={sigma} prec={prec:8s} blocks={plan.block_dims}"
                f" W={plan.window_rows}/{plan.window_rows_y}: "
                f"err1={err1:.3e} err2={err2:.3e}",
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
