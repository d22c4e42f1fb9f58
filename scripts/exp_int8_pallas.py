"""Mosaic probe: int8 vs f32-HIGHEST MXU dot issue rate at the spread
kernel's per-batch shape.

The spread/interp kernels' measured per-batch cost (~1.2-1.6 us at
batch P=128-256, PROFILE.md) matches one HIGHEST dot's 6 bf16 passes over
K=P cycles -- the kernels are K-pass-bound, independent of M.  If Mosaic
issues int8 x int8 -> int32 dots at the v5e's 2x int8 rate (277 Top/s
measured at the XLA level, scripts/exp_int8.py), the 3-limb fixed-point
scheme (ops/pallas/blocked.py:_fxp_dot) halves exactly this cost.

Times a fori_loop of NITER dots at the real kernel shape (M = CR*W*rm ~ 32
rows, K = P = 256, N = pdL = 104), operands resident in VMEM; NITER is
large enough that the ~30 ms tunnel dispatch floor (also measured and
subtracted) stays small against the loop:
  a) f32 HIGHEST          (current scheme, 6 bf16 passes: ~6*K cyc/dot)
  b) single int8 dot      (pure issue rate; 7-bit products)
  c) 6-product fxp        (in-VMEM limb splits + 6 int8 dots)

Rounding inside the splits uses the f32 magic-number nearest round -- the
first probe used jnp.round, whose device lowering left full-ulp residuals
that overflowed the next limb (1.8e-5 error floor).

Usage: python scripts/exp_int8_pallas.py [interpret]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = "interpret" in sys.argv[1:]

M, K, N = int(__import__("os").environ.get("PROBE_M", 32)), 256, 104
NRES = 8       # resident operand batches, cycled
NITER = 32768  # dots per kernel invocation (f32 HIGHEST ~ 6*K*NITER cyc ~ 54 ms)




def _rn(x):
    # floor(x+0.5): executor-precision-independent nearest round (the
    # magic-number add folds to identity under the pallas interpreter)
    return jnp.floor(x + 0.5)


def _loop(body_fn):
    def kern(a_ref, b_ref, o_ref):
        def body(i, acc):
            j = i % NRES
            return acc + body_fn(a_ref[j], b_ref[j])
        o_ref[...] = jax.lax.fori_loop(
            0, NITER, body, jnp.zeros((M, N), jnp.float32))
    return kern


def dot_hi(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def dot_i8_f32(a, b):
    a8 = a.astype(jnp.int8)
    b8 = b.astype(jnp.int8)
    p = jax.lax.dot_general(
        a8, b8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return p.astype(jnp.float32)


def split3(x):
    limbs = []
    r = x
    for sh in (7, 14, 22):
        l = jnp.clip(_rn(r * 2.0**sh), -127.0, 127.0)
        r = r - l * 2.0**-sh
        limbs.append(l.astype(jnp.int8))
    return limbs


MARGIN = 1.0 - 2.0**-6  # keep limb0 = rn(x*128) <= 127 at the range peak


def dot_fxp(a, b):
    al = split3(a * MARGIN)
    bl = split3(b * MARGIN)

    def d8(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    p00 = d8(al[0], bl[0])
    p1 = d8(al[0], bl[1]) + d8(al[1], bl[0])
    p2 = d8(al[1], bl[1])
    p3 = d8(al[0], bl[2]) + d8(al[2], bl[0])
    return (1.0 / (MARGIN * MARGIN)) * (p00.astype(jnp.float32) * 2.0**-14
            + p1.astype(jnp.float32) * 2.0**-21
            + p2.astype(jnp.float32) * 2.0**-28
            + p3.astype(jnp.float32) * 2.0**-29)




def dot_i8_direct(a8, b8):
    p = jax.lax.dot_general(
        a8, b8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return p.astype(jnp.float32)


def dot_bf16(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

def timeit(fn, *args, reps=3):
    # float() pull is the only reliable device sync on the axon tunnel.
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((NRES, M, K)) * 2 - 1, jnp.float32)
    b = jnp.asarray(rng.random((NRES, K, N)) * 2 - 1, jnp.float32)
    a_i = jnp.asarray(rng.integers(-100, 100, (NRES, M, K)), jnp.float32)
    b_i = jnp.asarray(rng.integers(-100, 100, (NRES, K, N)), jnp.float32)

    # dispatch floor
    f0 = jax.jit(lambda x: x * 2.0)
    _ = float(f0(jnp.float32(1.0)))
    disp = min(
        timeit(lambda x: f0(x), jnp.float32(1.0), reps=1)[0] for _ in range(4)
    )
    print(f"dispatch floor ~{disp*1e3:.1f} ms")

    a8 = jnp.asarray(rng.integers(-100, 100, (NRES, M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-100, 100, (NRES, K, N)), jnp.int8)
    for name, body, (aa, bb) in (
        ("f32 HIGHEST", dot_hi, (a, b)),
        ("bf16 1-pass", dot_bf16, (a, b)),
        ("int8 cast  ", dot_i8_f32, (a_i, b_i)),
        ("int8 direct", dot_i8_direct, (a8, b8)),
        ("fxp 6-dot  ", dot_fxp, (a, b)),
    ):
        try:
            f = jax.jit(pl.pallas_call(
                _loop(body),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                interpret=INTERPRET,
            ))
            t, out = timeit(f, aa, bb)
            per = (t - disp) / NITER
            print(f"{name}: {t*1e3:8.2f} ms total  {per*1e9:8.1f} ns/dot "
                  f"({per*940e6:7.0f} cyc @940MHz)")
            if body is dot_fxp:
                ref = np.einsum(
                    "bmk,bkn->mn",
                    np.asarray(a, np.float64),
                    np.asarray(b, np.float64),
                ) * (NITER // NRES)
                got = np.asarray(out, np.float64)
                err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
                print(f"  fxp rel err vs f64: {err:.2e}")
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:300]})")


if __name__ == "__main__":
    main()
