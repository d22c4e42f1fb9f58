"""Microbench: lax.sort cost vs payload operand count/width at Np=16.7M.

Question (round-4, VERDICT #5/#6): the type-2 un-permute is one masked
sort of (i32 key + CR f32 payload rows) over ~16.7M lanes (~22 ms at
rho=1), and set_points runs two 5-operand sorts (~76 ms).  If TPU sort
cost scales with the NUMBER of operands (per-operand passes) rather than
total bytes, packing f32 payload pairs into i64 rows halves the operand
count at equal bytes.  This measures both scalings directly.

Run on the TPU: python scripts/exp_sortpack.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("EXP_N", 16_777_216))
K = int(os.environ.get("EXP_ITERS", 4))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # real u64 for the packed rows
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    keys_np = rng.permutation(N).astype(np.int32)
    keys = jax.device_put(jnp.asarray(keys_np))
    payloads = [
        jax.device_put(jnp.asarray(rng.standard_normal(N).astype(np.float32)))
        for _ in range(4)
    ]

    @jax.jit
    def _noop(x):
        return x * 2.0

    _ = float(_noop(jnp.float32(1.0)))
    t0 = time.perf_counter()
    _ = float(_noop(jnp.float32(1.0)))
    overhead = time.perf_counter() - t0
    print(f"dispatch overhead ~{overhead*1e3:.1f} ms", flush=True)

    def timeit(fn, *args):
        @jax.jit
        def loop(k, *a):
            def body(c, _):
                out = fn(k + c.astype(jnp.int32), *a)
                return jax.lax.optimization_barrier(
                    jnp.sum(out[1] if isinstance(out, tuple) else out)
                ).astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c

        _ = float(loop(keys, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(keys, *args))
            ts.append(time.perf_counter() - t0)
        return (min(ts) - overhead) / K

    # 1) operand-count scaling: key + n f32 payload rows
    for n in range(0, 5):
        def f(k, *ps):
            return jax.lax.sort((k,) + ps, num_keys=1)

        t = timeit(f, *payloads[:n])
        print(f"key + {n} f32 rows : {t*1e3:7.2f} ms", flush=True)

    # 2) packed: key + 1 i64 row (two f32 rows bit-packed)
    def f_pack1(k, a, b):
        hi = jax.lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
        lo = jax.lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
        packed = jax.lax.shift_left(hi, jnp.uint64(32)) | lo
        out = jax.lax.sort((k, packed), num_keys=1)
        v = out[1]
        a2 = jax.lax.bitcast_convert_type(
            jax.lax.shift_right_logical(v, jnp.uint64(32)).astype(jnp.uint32),
            jnp.float32,
        )
        return out[0], a2

    try:
        t = timeit(f_pack1, payloads[0], payloads[1])
        print(f"key + 1 i64 row (2xf32 packed, incl pack/unpack): {t*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"i64 pack FAILED: {type(e).__name__}: {e}", flush=True)

    # 3) packed: key + 2 i64 rows (four f32 rows)
    def f_pack2(k, a, b, c, d):
        def pk(x, y):
            hi = jax.lax.bitcast_convert_type(x, jnp.uint32).astype(jnp.uint64)
            lo = jax.lax.bitcast_convert_type(y, jnp.uint32).astype(jnp.uint64)
            return jax.lax.shift_left(hi, jnp.uint64(32)) | lo

        out = jax.lax.sort((k, pk(a, b), pk(c, d)), num_keys=1)
        return out[0], jax.lax.bitcast_convert_type(
            jax.lax.shift_right_logical(out[1], jnp.uint64(32)).astype(jnp.uint32),
            jnp.float32,
        )

    try:
        t = timeit(f_pack2, *payloads)
        print(f"key + 2 i64 rows (4xf32 packed, incl pack/unpack): {t*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"i64 pack2 FAILED: {type(e).__name__}: {e}", flush=True)

    # 4) fused single-operand: (key<<32 | f32-bits) as one i64 KEY sort —
    # for CR=1 r2c un-permutes (key monotone in high bits).
    def f_fused(k, a):
        hi = k.astype(jnp.uint64)
        lo = jax.lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
        fused = jax.lax.shift_left(hi, jnp.uint64(32)) | lo
        out = jax.lax.sort((fused,), num_keys=1)[0]
        return (k, jax.lax.bitcast_convert_type(
            out.astype(jnp.uint32), jnp.float32
        ))

    try:
        t = timeit(f_fused, payloads[0])
        print(f"fused i64 single-operand (key<<32|f32): {t*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"fused i64 FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
