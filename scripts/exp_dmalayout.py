"""Device microbenchmark: HBM->VMEM DMA cost vs operand layout.

The round-4 strip ladder measured the z-form kernels' stripped-empty
pipeline at ~6.7 us per super-batch (rho=1 geometry: (16, SB=1536) f32
windows of a (16, 67M)-lane row-major array) — ~13 GB/s effective, ~2% of
HBM peak.  Hypothesis: a (R, Np) row-major operand makes every descriptor
R strided ~6 KB runs (row stride = 4*Np bytes), and the DMA engine pays
per-run latency, not bandwidth.  A batch-major layout (nb, R, P) makes the
same logical window ONE contiguous R*SB*4-byte run.

This kernel isolates that: grid of NPROG programs, each pipelines NSUP
super-batch copies from its contiguous share of the operand and reduces a
token into a tiny output (no compute).  Layouts:

  rowmajor   src (R, L)            window (R, SB)       R strided runs
  batchmajor src (L//P * R, P)     window (SUPER*R, P)  1 contiguous run

Run on device:  python scripts/exp_dmalayout.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = int(os.environ.get("EXP_R", 16))
P = int(os.environ.get("EXP_P", 384))
SUPER = int(os.environ.get("EXP_SUPER", 4))
NB = int(os.environ.get("EXP_NBUF", 2))
NPROG = int(os.environ.get("EXP_NPROG", 1536))
NSUP = int(os.environ.get("EXP_NSUP", 8))  # super-batches per program
K = int(os.environ.get("EXP_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SB = SUPER * P
    L = NPROG * NSUP * SB  # total lanes
    nbytes = R * L * 4
    print(
        f"R={R} P={P} SUPER={SUPER} NB={NB} NPROG={NPROG} NSUP={NSUP} "
        f"-> {nbytes/1e9:.2f} GB, {NPROG*NSUP} descriptors of {R*SB*4/1024:.0f} KiB",
        flush=True,
    )

    def kernel_rm(src_ref, out_ref, buf, sem):
        b = pl.program_id(0)
        base = b * NSUP * SB

        def dma(slot, j):
            off = pl.multiple_of(base + j * SB, P)
            dst = pl.multiple_of(slot * SB, P)
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(off, SB)],
                buf.at[:, pl.ds(dst, SB)],
                sem.at[slot],
            )

        for j in range(NB - 1):
            @pl.when(j < NSUP)
            def _(j=j):
                dma(j, j).start()

        def body(i, carry):
            slot = i % NB

            @pl.when(i + NB - 1 < NSUP)
            def _():
                dma((i + NB - 1) % NB, i + NB - 1).start()

            dma(slot, i).wait()
            return carry + buf[0, 0]

        tok = jax.lax.fori_loop(0, NSUP, body, jnp.float32(0))
        out_ref[0, 0] = tok

    def kernel_bm(src_ref, out_ref, buf, sem):
        b = pl.program_id(0)
        base = b * NSUP * SUPER * R

        def dma(slot, j):
            off = pl.multiple_of(base + j * SUPER * R, 8)
            dst = pl.multiple_of(slot * SUPER * R, 8)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(off, SUPER * R), :],
                buf.at[pl.ds(dst, SUPER * R), :],
                sem.at[slot],
            )

        for j in range(NB - 1):
            @pl.when(j < NSUP)
            def _(j=j):
                dma(j, j).start()

        def body(i, carry):
            slot = i % NB

            @pl.when(i + NB - 1 < NSUP)
            def _():
                dma((i + NB - 1) % NB, i + NB - 1).start()

            dma(slot, i).wait()
            return carry + buf[0, 0]

        tok = jax.lax.fori_loop(0, NSUP, body, jnp.float32(0))
        out_ref[0, 0] = tok

    def build(layout):
        if layout == "rowmajor":
            shape = (R, L)
            kern = kernel_rm
            buf = pltpu.VMEM((R, NB * SB), jnp.float32)
        else:
            shape = (L // P * R, P)
            kern = kernel_bm
            buf = pltpu.VMEM((NB * SUPER * R, P), jnp.float32)
        f = pl.pallas_call(
            kern,
            grid=(NPROG,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((NPROG, 128), jnp.float32),
            scratch_shapes=[buf, pltpu.SemaphoreType.DMA((NB,))],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )
        return jax.jit(f), shape

    for layout in ("rowmajor", "batchmajor"):
        f, shape = build(layout)
        x = jnp.ones(shape, jnp.float32)
        r = f(x)
        jax.block_until_ready(r)
        ts = []
        for _ in range(K):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"{layout:11s}: {t*1e3:8.2f} ms  {nbytes/t/1e9:7.1f} GB/s  "
            f"{t/ (NPROG*NSUP) *1e6:6.2f} us/descriptor",
            flush=True,
        )


if __name__ == "__main__":
    main()
