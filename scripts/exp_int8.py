"""Device microbenchmark: int8 fixed-point matmul vs bf16x6 ('highest').

Motivation: every hot contraction in the pipeline (axis DFT factors,
window-weight contractions) is pinned to f32-grade accuracy, which on TPU
means 6 bf16 MXU passes (jax.lax.Precision.HIGHEST) at ~1/6 of peak.  The
v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate, and int32
accumulation is EXACT.  Splitting each operand into three 7-bit limbs
(scales 2^-7 / 2^-14 / 2^-22) and keeping the six limb products whose
magnitude exceeds ~2^-24 reproduces f32-grade results at twice the
'highest' throughput -- if XLA actually lowers int8 dots to the MXU.

This script measures, on the real chip:
  1. peak rates: 4096^3 matmul at default/high/highest, bf16, int8->int32
  2. the DFT-shaped contraction (rows ~ 147k, K=448, N=256):
     'highest' vs the 6-product fixed-point scheme (runtime limb split)
  3. accuracy of the fixed-point scheme vs float64 numpy

Usage: python scripts/exp_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHIFTS = (7, 14, 22)


def split3_np(m):
    """Static-side limb split (numpy, plan time). Returns limbs + scale."""
    s = float(np.max(np.abs(m))) or 1.0
    s = s / (1.0 - 2.0**-7)  # keep |mn| <= 127/128 so limb0 never clips
    r = (m / s).astype(np.float64)
    limbs = []
    for sh in SHIFTS:
        l = np.clip(np.rint(r * 2.0**sh), -127, 127)
        r = r - l * 2.0**-sh
        limbs.append(l.astype(np.int8))
    return limbs, s, float(np.max(np.abs(r)))


def split3_jnp(x):
    """Dynamic-side limb split (on device). Returns limbs + scale."""
    s = jnp.max(jnp.abs(x)) / (1.0 - 2.0**-7)
    s = jnp.where(s == 0, 1.0, s)
    r = x / s
    limbs = []
    for sh in SHIFTS:
        l = jnp.clip(jnp.round(r * 2.0**sh), -127, 127)
        r = r - l * 2.0**-sh
        limbs.append(l.astype(jnp.int8))
    return limbs, s


def fxp_matmul(x, m_limbs, m_scale):
    """x @ M via six int8 MXU products, int32 exact accumulation."""
    xl, xs = split3_jnp(x)
    m0, m1, m2 = m_limbs

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    p00 = dot(xl[0], m0)
    p01 = dot(xl[0], m1)
    p10 = dot(xl[1], m0)
    p11 = dot(xl[1], m1)
    p02 = dot(xl[0], m2)
    p20 = dot(xl[2], m0)
    acc = (
        p00.astype(jnp.float32) * 2.0 ** -(SHIFTS[0] + SHIFTS[0])
        + (p01 + p10).astype(jnp.float32) * 2.0 ** -(SHIFTS[0] + SHIFTS[1])
        + p11.astype(jnp.float32) * 2.0 ** -(SHIFTS[1] + SHIFTS[1])
        + (p02 + p20).astype(jnp.float32) * 2.0 ** -(SHIFTS[0] + SHIFTS[2])
    )
    return acc * (xs * m_scale)


def timeit(fn, *args, iters=48, reps=3):
    """Scan-chained timing with input perturbation + output reduction.

    Same anti-hoist measures as scripts/profile_stages.py: without the
    perturbation XLA hoists the loop-invariant work out of the scan, and
    without the reduction it deletes it entirely (both observed on the
    axon tunnel, where naive per-call timing also under-reports).
    """
    @jax.jit
    def loop(*a):
        def body(c, _):
            def perturb(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (c * jnp.asarray(1e-30, x.dtype)).astype(x.dtype)
                return x

            y = fn(*jax.tree.map(perturb, a))
            s = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(y))
            return jax.lax.optimization_barrier(s), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    _ = float(loop(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    rng = np.random.default_rng(42)

    # --- 1. peak rates at 4096^3 ---
    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    flops = 2.0 * n**3
    for prec in ("default", "high", "highest"):
        f = lambda a, b, p=prec: jnp.matmul(
            a, b, precision=dict(default=jax.lax.Precision.DEFAULT,
                                 high=jax.lax.Precision.HIGH,
                                 highest=jax.lax.Precision.HIGHEST)[p])
        t = timeit(f, a, b)
        print(f"f32 {prec:8s}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} Tflop/s")
    a8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    f8 = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    t8 = timeit(f8, a8, b8)
    print(f"int8->int32   : {t8*1e3:7.2f} ms  {flops/t8/1e12:6.1f} Top/s")

    # --- 2/3. DFT-shaped contraction ---
    rows, K, N = 147456, 448, 256
    x_np = rng.standard_normal((rows, K)).astype(np.float32)
    th = 2 * np.pi * rng.random((K, N))
    m_np = np.cos(th).astype(np.float32)
    x = jnp.asarray(x_np)
    m = jnp.asarray(m_np)
    m_limbs, m_scale, m_resid = split3_np(m_np)
    m_limbs = tuple(jnp.asarray(l) for l in m_limbs)
    print(f"static split residual: {m_resid:.2e} (of scale {m_scale:.3f})")

    ref = np.asarray(x_np, np.float64) @ np.asarray(m_np, np.float64)
    scale = np.max(np.abs(ref))

    f_hi = lambda x, m: jnp.matmul(x, m, precision=jax.lax.Precision.HIGHEST)
    f_fxp = lambda x: fxp_matmul(x, m_limbs, m_scale)

    t_hi = timeit(f_hi, x, m)
    t_fxp = timeit(f_fxp, x)
    flops2 = 2.0 * rows * K * N
    err_hi = np.max(np.abs(np.asarray(f_hi(x, m), np.float64) - ref)) / scale
    err_fxp = np.max(np.abs(np.asarray(f_fxp(x), np.float64) - ref)) / scale
    print(f"DFT-shape highest: {t_hi*1e3:7.2f} ms  "
          f"{flops2/t_hi/1e12:6.1f} Tflop/s  max rel err {err_hi:.2e}")
    print(f"DFT-shape fxp    : {t_fxp*1e3:7.2f} ms  "
          f"{flops2/t_fxp/1e12:6.1f} Tflop/s  max rel err {err_fxp:.2e}  "
          f"speedup {t_hi/t_fxp:.2f}x")

    # split cost alone (how much of fxp time is the VPU limb split)
    f_split = lambda x: split3_jnp(x)[0]
    t_split = timeit(f_split, x)
    print(f"  dynamic limb split alone: {t_split*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
