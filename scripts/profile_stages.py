"""Per-stage device profile of the blocked NUFFT pipeline on the bench point.

Times each pipeline stage in isolation (scan-chained inside one jit so the
~30 ms tunnel dispatch latency is amortised and nothing is CSE'd away),
plus machine calibration numbers (matmul throughput per precision, HBM
copy bandwidth).  This is the breakdown VERDICT.md round-1 task 1 demands.

Usage: python scripts/profile_stages.py [N] [Np]
"""

import os
import sys
import time

import numpy as np

N_GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NP_PTS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
K = int(os.environ.get("PROF_ITERS", 5))

import jax
import jax.numpy as jnp

import nonuniformffts_tpu as nufft
from nonuniformffts_tpu.callbacks import NUFFTCallbacks
from nonuniformffts_tpu.ops import matmul_fft
from nonuniformffts_tpu.ops.deconvolve import deconvolve_pad, deconvolve_truncate
from nonuniformffts_tpu.ops.pallas import blocked, common


def timed_scan(f, x, k=K, reps=2):
    """Min wall time of one application of f, chained k times in a scan.
    f: x -> y (pytrees).  Anti-hoist: float inputs are perturbed by a
    carry-dependent *non-zero* epsilon (a ``c * 0`` perturbation gets
    constant-folded, after which XLA hoists the loop-invariant body — the
    round-1 profile measured 1537 "Tflop/s" that way), and the body output
    passes through an optimization_barrier."""

    def body(c, _):
        def perturb(a):
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a + (c * jnp.asarray(1e-30, a.dtype)).astype(a.dtype)
            return a

        y = f(jax.tree.map(perturb, x))
        # Reduce over the FULL output: a partial slice lets XLA dead-code
        # eliminate most of the stage (slicing a matmul output keeps only
        # the sliced rows of the contraction).  The full-sum reduction adds
        # one bandwidth-bound pass over the output, which is noted when
        # interpreting bandwidth-bound stages.
        s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(y))
        return jax.lax.optimization_barrier(s), None

    @jax.jit
    def loop():
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    _ = float(loop())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop())
        ts.append(time.perf_counter() - t0)
    return (min(ts) - OVERHEAD) / k


@jax.jit
def _noop(x):
    return x * 2.0


_ = float(_noop(jnp.float32(1.0)))
_t = []
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(_noop(jnp.float32(1.0)))
    _t.append(time.perf_counter() - t0)
OVERHEAD = min(_t)
print(f"dispatch overhead: {OVERHEAD*1e3:.1f} ms")


def report(name, t, extra=""):
    print(f"{name:38s} {t*1e3:9.2f} ms  {extra}")


# ---------------------------------------------------------------------------
# Machine calibration
# ---------------------------------------------------------------------------
if os.environ.get("PROF_CALIB", "1") == "1":
    a = jnp.ones((4096, 4096), jnp.float32)
    for prec in ("default", "high", "highest"):
        pr = {"default": jax.lax.Precision.DEFAULT,
              "high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST}[prec]
        t = timed_scan(lambda x, pr=pr: jnp.matmul(x, x, precision=pr), a, k=30)
        flops = 2 * 4096**3 / t
        report(f"matmul 4096^3 f32 {prec}", t, f"{flops/1e12:.1f} Tflop/s")
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    t = timed_scan(lambda x: x + 1.0, big, k=30)
    report("elementwise 256MB (r+w)", t, f"{2*big.nbytes/t/1e9:.0f} GB/s")
    t = timed_scan(lambda x: jnp.transpose(
        x.reshape(384, 384, 384), (1, 2, 0)), jnp.ones((384**3,), jnp.float32), k=30)
    report("transpose 384^3 f32 (1,2,0)", t, f"{2*4*384**3/t/1e9:.0f} GB/s eff")

# ---------------------------------------------------------------------------
# Pipeline stages at the bench operating point
# ---------------------------------------------------------------------------
shape = (N_GRID,) * 3
rng = np.random.default_rng(42)
pts_np = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
v_np = rng.standard_normal((1, 2, NP_PTS)).astype(np.float32)

plan = nufft.PlanNUFFT(
    np.complex64, shape, m=4, sigma=1.5,
    spread_method="blocked", fft_method="matmul",
    precision=os.environ.get("PROF_PRECISION", "highest"),
)
print(f"\nplan: N={shape} Np={NP_PTS} block_dims={plan.block_dims} "
      f"batch={plan.batch_size} prec={plan.precision} shape_over={plan.shape_over}")

pts = jax.device_put(pts_np)
v_ch = jax.device_put(v_np)
p = nufft.set_points(plan, pts)
nslots = p.points_slotted.shape[1]
print(f"nslots={nslots} nblocks={int(np.prod([s//b for s,b in zip(plan.shape_over, plan.block_dims)]))}")

# --- set_points ---
t_set = timed_scan(lambda x: nufft.set_points(plan, x).points_slotted, pts)
report("set_points (fold+sort+gather)", t_set)

# --- spread: kernel only (monkeypatch-free: call internals) ---
from nonuniformffts_tpu.blocking import gather_slots

D, m, bdims, nb, pd, yz = blocked._geometry(p)
C = 1
CR = 2
rdt = p.real_dtype

vals_in = v_np.reshape(2, NP_PTS)
DP = common.round_up(2 * D, 8)
CRP = common.round_up(CR, 8)

def slot_vals_gather(v):
    return gather_slots(v.reshape(2, -1), p.slot_to_point, p.slot_valid, rows=CRP)

t_scat = timed_scan(slot_vals_gather, v_ch)
report("value gather into slots", t_scat)

full_spread = lambda v: blocked.spread_blocked(p, v, channel_input=True, channel_output=True)
t_spread_full = timed_scan(full_spread, v_ch)
report("spread_blocked total", t_spread_full)

# pieces: pallas kernel alone vs overlap_add alone
import functools
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

pts_pad = p.points_slotted
vals_slotted = slot_vals_gather(v_ch)
cs = common.coefficient_stack(p.kernel_data).astype(rdt)

def kernel_only(args):
    pts_k, vals_k = args
    pv = jnp.concatenate([pts_k.astype(rdt), vals_k], axis=0)
    nblocks = int(np.prod(nb))
    out_shape = blocked._blocks_buffer_shape(CR, nb, pd, yz)
    blk_shape = blocked._block_shape(CR, nb, pd, yz)
    out_index = blocked._block_index_map(D, nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk_shape, out_index),
        scratch_shapes=[
            pltpu.VMEM((CR * pd[0], yz), rdt),
            pltpu.VMEM((blocked.NBUF, DP + CRP, plan.batch_size), rdt),
            pltpu.SemaphoreType.DMA((blocked.NBUF,)),
        ],
    )
    Wk = p.window_rows if p.batch_r0 is not None else None
    r0s = p.batch_r0 if Wk else jnp.zeros((1,), jnp.int32)
    kern = functools.partial(blocked._spread_kernel, plan=p, CR=CR, DP=DP, nb=nb, pd=pd, yz=yz, P=plan.batch_size, W=Wk)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, rdt),
    )(p.block_starts, jnp.zeros((D,), jnp.int32), r0s, pv, cs)

t_kernel = timed_scan(kernel_only, (pts_pad, vals_slotted))
nbl = int(np.prod(nb))
bufGB = nbl * CR * pd[0] * yz * 4 / 1e9
report("spread pallas kernel only", t_kernel, f"{nbl} programs, out buf {bufGB:.2f} GB")

blocks_buf = jnp.zeros((CR,) + tuple(nb) + tuple(pd), rdt)
t_oadd = timed_scan(lambda b: common.overlap_add(b, bdims, pd, m), blocks_buf)
report("overlap_add only", t_oadd)

# --- forward matmul FFT (pruned: deconvolution+truncation fused) ---
grid_r = jnp.zeros((C, 2) + plan.shape_over, rdt)
pruned = plan.fft_axes[0].kind.startswith("pruned")
if pruned:
    t_ffwd = timed_scan(
        lambda g: matmul_fft.forward_dft_pruned(
            g, plan.fft_axes, real=False, prec=plan.precision),
        grid_r,
    )
else:
    t_ffwd = timed_scan(
        lambda g: matmul_fft.forward_fft_matmul(
            g, plan.fft_axes, real=False, prec=plan.precision),
        grid_r,
    )
report(f"forward matmul-DFT ({plan.precision})", t_ffwd)

spec_ch = jnp.zeros((C, 2) + plan.shape, rdt)

# --- type 2 stages ---
if pruned:
    t_fbwd = timed_scan(
        lambda s: matmul_fft.backward_dft_pruned(
            s, plan.fft_axes, real=False, prec=plan.precision),
        spec_ch,
    )
else:
    t_fbwd = timed_scan(
        lambda s: matmul_fft.backward_fft_matmul(
            s, plan.fft_axes, real=False, prec=plan.precision),
        spec_ch,
    )
report(f"backward matmul-DFT ({plan.precision})", t_fbwd)

grid_full = jnp.zeros((C, 2) + plan.shape_over, rdt)
t_interp_full = timed_scan(
    lambda g: blocked.interpolate_blocked(p, g, channel_input=True, channel_output=True),
    grid_full,
)
report("interpolate_blocked total", t_interp_full)

gp = grid_full.reshape((2 * C,) + plan.shape_over)
t_hgather = timed_scan(
    lambda g: common.halo_gather(g, bdims, pd, m), gp
)
report("halo_gather only", t_hgather)

def sort_unperm(sv):
    keys = jnp.where(p.slot_valid, p.slot_to_point, jnp.int32(nslots)).astype(jnp.int32)
    ops = jax.lax.sort((keys, sv[0], sv[1]), num_keys=1)
    return jnp.stack([o[:NP_PTS] for o in ops[1:]], axis=0)

t_take = timed_scan(sort_unperm, jnp.zeros((CR, nslots), rdt))
report("slot un-permute (masked sort)", t_take)

print("\nsum t1 pieces: scatter+kernel+oadd+fft+deconv =",
      f"{(t_scat+t_kernel+t_oadd+t_ffwd)*1e3:.1f} ms")
print("sum t2 pieces: pad+bfft+interp =",
      f"{(t_fbwd+t_interp_full)*1e3:.1f} ms")
