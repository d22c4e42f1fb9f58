"""Experiment: pruned-direct (deconvolution-fused) matmul DFT vs the current
split four-step engine, plus XLA native FFT and halo-merge timings, at the
bench operating point (N=256^3, oversampled 384^3, c64 channel form).

Throwaway measurement script guiding the round's DFT/merge rework.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import nonuniformffts_tpu as nufft
from nonuniformffts_tpu.ops import matmul_fft
from nonuniformffts_tpu.ops.pallas import common

N = 256
NOV = 384
C = 1
HI = jax.lax.Precision.HIGHEST


def timed(f, *args, k=5, reps=3):
    """Min wall time of one application, scan-chained to amortise dispatch.
    Operands are real jit arguments (closure constants would be embedded in
    the HLO proto and blow past the compile relay's request-size limit)."""

    @jax.jit
    def loop(*a):
        def body(c, _):
            def perturb(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (c * jnp.asarray(1e-30, x.dtype)).astype(x.dtype)
                return x

            y = f(*jax.tree.map(perturb, a))
            s = sum(
                jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(y)
            )
            return jax.lax.optimization_barrier(s), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    _ = float(loop(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        ts.append((time.perf_counter() - t0) / k)
    return min(ts) * 1e3  # ms


def report(name, ms, extra=""):
    print(f"{name:<46}{ms:8.2f} ms  {extra}")


rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal((C, NOV, NOV, NOV)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((C, NOV, NOV, NOV)).astype(np.float32))
x_ch = jnp.stack([xr, xi], axis=1)  # (C, 2, NOV, NOV, NOV)

# --- current engine (split four-step, fused truncation) ---
plan = nufft.PlanNUFFT(np.complex64, (N, N, N), m=4, sigma=1.5,
                       spread_method="blocked", fft_method="matmul",
                       fft_variant="split")
axes = plan.fft_axes
index_ranges = plan.index_ranges
phihat_inv = plan.phihat_inv
normfactor = plan.normfactor

fwd_cur2 = lambda g, ax: matmul_fft.forward_fft_deconv(
    g, ax, index_ranges, phihat_inv, normfactor, real=False, prec="highest")
fwd_cur = lambda g: fwd_cur2(g, axes)
spec = fwd_cur(x_ch)
report("fwd split+deconv (current, highest)", timed(fwd_cur2, x_ch, axes))

bwd_cur2 = lambda s, ax: matmul_fft.backward_fft_pad(
    s, ax, index_ranges, (NOV, NOV, NOV), real=False, prec="highest")
bwd_cur = lambda s: bwd_cur2(s, axes)
report("bwd split+pad (current, highest)", timed(bwd_cur2, spec, axes))

# (XLA native FFT / complex dtypes: unimplemented on this backend)

# --- pruned direct matmul DFT (prototype) ---
# Per axis: W (NOV, N) with W[j, kcol] = e^{-i 2pi j k / NOV} for the kept
# modes k (order = the plan's spectral order), columns scaled by
# phihat_inv (and normfactor on axis 0).


def pruned_mats(d):
    nov = NOV
    # index_ranges[d]: (start, length) segments into the oversampled
    # spectrum, in output order.
    ks = np.concatenate([np.arange(s, s + l) for s, l in index_ranges[d]])
    j = np.arange(nov)
    ang = 2.0 * np.pi * np.outer(j, ks % nov) / nov
    ph = np.asarray(phihat_inv[d])
    cosm = np.cos(ang) * ph[None, :]
    sinm = np.sin(ang) * ph[None, :]
    if d == 0:
        cosm = cosm * normfactor
        sinm = sinm * normfactor
    return jnp.asarray(cosm, jnp.float32), jnp.asarray(sinm, jnp.float32)


try:
    PM = [pruned_mats(d) for d in range(3)]
except Exception as e:  # noqa: BLE001
    print("index_ranges layout mismatch, inspect:", index_ranges)
    raise


def karatsuba_last(ar, ai, cm, sm, sign):
    # out = (ar + i ai) @ (cm - i sign sm)
    t1 = jnp.matmul(ar, cm, precision=HI)
    t2 = jnp.matmul(ai, sm, precision=HI)
    t3 = jnp.matmul(ar + ai, cm - sign * sm, precision=HI)
    return t1 + sign * t2, t3 - t1 + sign * t2  # (re, im); sign=+1 fwd


def fwd_pruned(g, pm=None):
    pm = pm if pm is not None else PM
    ar, ai = g[:, 0], g[:, 1]
    for d in (2, 1, 0):
        ar = jnp.moveaxis(ar, 1 + d, -1)
        ai = jnp.moveaxis(ai, 1 + d, -1)
        cm, sm = pm[d]
        ar, ai = karatsuba_last(ar, ai, cm, sm, 1.0)
        ar = jnp.moveaxis(ar, -1, 1 + d)
        ai = jnp.moveaxis(ai, -1, 1 + d)
    return jnp.stack([ar, ai], axis=1)


spec_p = fwd_pruned(x_ch)
report("fwd pruned direct (highest, karatsuba)", timed(fwd_pruned, x_ch, PM))

# correctness vs current
err = float(jnp.linalg.norm(spec_p - spec) / jnp.linalg.norm(spec))
print(f"   pruned-vs-split relative diff: {err:.3e}")


def fwd_pruned4(g, pm):
    """4-matmul variant (no karatsuba) for comparison."""
    ar, ai = g[:, 0], g[:, 1]
    for d in (2, 1, 0):
        ar = jnp.moveaxis(ar, 1 + d, -1)
        ai = jnp.moveaxis(ai, 1 + d, -1)
        cm, sm = pm[d]
        r2 = jnp.matmul(ar, cm, precision=HI) + jnp.matmul(ai, sm, precision=HI)
        i2 = jnp.matmul(ai, cm, precision=HI) - jnp.matmul(ar, sm, precision=HI)
        ar, ai = r2, i2
        ar = jnp.moveaxis(ar, -1, 1 + d)
        ai = jnp.moveaxis(ai, -1, 1 + d)
    return jnp.stack([ar, ai], axis=1)


report("fwd pruned direct (highest, 4-matmul)", timed(fwd_pruned4, x_ch, PM))


# backward: transpose scheme (N keep -> NOV), rows scaled.
def bwd_pruned(s, pm=None):
    pm = pm if pm is not None else PM
    ar, ai = s[:, 0], s[:, 1]
    for d in (0, 1, 2):
        ar = jnp.moveaxis(ar, 1 + d, -1)
        ai = jnp.moveaxis(ai, 1 + d, -1)
        cm, sm = pm[d]
        # backward: multiply by conj -> sign=-1; matrices transposed.
        ar, ai = karatsuba_last(ar, ai, cm.T, sm.T, -1.0)
        ar = jnp.moveaxis(ar, -1, 1 + d)
        ai = jnp.moveaxis(ai, -1, 1 + d)
    return jnp.stack([ar, ai], axis=1)


g_b = bwd_pruned(spec)
report("bwd pruned direct (highest, karatsuba)", timed(bwd_pruned, spec, PM))
# correctness vs current backward (note: current bwd expects deconv-scaled
# input; ours bakes the scaling into the matrices so feed raw spec and
# compare structure only via adjoint-ish check below instead).
gb_cur = bwd_cur(spec)
# the two differ by the deconv scaling (applied once more in ours); compare
# against applying scaling manually:
from nonuniformffts_tpu.ops.deconvolve import pad_axis  # noqa: E402

sc = spec
for d, ph in enumerate(phihat_inv):
    shape = [1] * sc.ndim
    shape[2 + d] = ph.shape[0]
    sc = sc * ph.reshape(shape)
sc = sc * normfactor
gb_ref = bwd_cur(sc)
errb = float(jnp.linalg.norm(g_b - gb_ref) / jnp.linalg.norm(gb_ref))
print(f"   bwd pruned-vs-split relative diff: {errb:.3e}")

# --- halo merge timings ---
plan2 = plan
bdims = plan2.block_dims
from nonuniformffts_tpu.blocking import num_blocks  # noqa: E402

nb = num_blocks(plan2.shape_over, bdims)
pd = common.padded_block_dims(bdims, plan2.m)
CR = 2
blocks = jnp.asarray(
    rng.standard_normal((CR,) + tuple(nb) + tuple(pd)).astype(np.float32))
f_oadd = lambda b: common.overlap_add(b, bdims, pd, plan2.m)
report("overlap_add (current)", timed(f_oadd, blocks),
       f"nb={nb} pd={pd}")

grid_ch = jnp.asarray(
    rng.standard_normal((CR, NOV, NOV, NOV)).astype(np.float32))
f_hg = lambda g: common.halo_gather(g, bdims, pd, plan2.m)
report("halo_gather (current)", timed(f_hg, grid_ch))

f_r2g = lambda b: common.relayout_to_grid(b, bdims)
bm = jnp.asarray(rng.standard_normal((CR,) + tuple(nb) + tuple(bdims)).astype(np.float32))
report("relayout_to_grid alone", timed(f_r2g, bm))
f_r2b = lambda g: common.relayout_to_blocks(g, bdims)
report("relayout_to_blocks alone", timed(f_r2b, grid_ch))
