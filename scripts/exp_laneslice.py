"""Mosaic capability probe: dynamic (traced) lane-dim offsets on VMEM refs.

The super-batched kernels want ONE pv/res VMEM buffer with the DMA slot as a
128-aligned lane offset (pv_buf[:, pl.ds(slot*SB + k*P, P)]), removing the
static per-slot branch replication.  This probe checks Mosaic accepts
(a) DMA into a traced 128-aligned lane window, (b) value loads at traced
128-aligned lane offsets, (c) stores at traced lane offsets.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 128
NBUF = 2
SUPER = 4
SB = SUPER * P


def kernel(x_hbm, out_ref, buf, sem):
    nsuper = 2

    def dma(slot, j):
        off = pl.multiple_of(j * SB, P)
        dst_off = pl.multiple_of(slot * SB, P)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(off, SB)],
            buf.at[:, pl.ds(dst_off, SB)],
            sem.at[slot],
        )

    @pl.when(0 < nsuper)
    def _():
        dma(0, 0).start()

    def body(i, c):
        slot = i % NBUF

        @pl.when(i + 1 < nsuper)
        def _():
            dma((i + 1) % NBUF, i + 1).start()

        dma(slot, i).wait()
        for k in range(SUPER):
            src = pl.multiple_of(slot * SB + k * P, P)
            v = buf[:, pl.ds(src, P)]  # traced lane-offset load
            gi = i * SUPER + k
            dsto = pl.multiple_of(gi * P, P)
            out_ref[:, pl.ds(dsto, P)] = v * 2.0  # traced lane-offset store
        return c

    jax.lax.fori_loop(0, nsuper, body, 0)


def main():
    x = jnp.arange(8 * 2 * SB, dtype=jnp.float32).reshape(8, 2 * SB)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, 2 * SB), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 2 * SB), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, NBUF * SB), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("lane-slice probe OK")


if __name__ == "__main__":
    main()
