"""Experiment: block-form DFT — fold the halo merge + block-interleave
relayout into the DFT factor matrices.

Every row (b, i) of the spread kernel's padded core-first block buffer maps
to a known global grid row g(b, i) (common.build_wt_matrix): i in [0, B) ->
b*B + i; i in [B, B+2M-1) -> b*B + (i if i < B+M else i - (B+2M-1)), all
mod N; alignment rows map nowhere (zero factor rows).  The periodic
overlap-add is therefore a *linear* map, and since the DFT is linear too,
DFT(overlap_add(buf)) == contract(buf, F') with F'[(b,i), k] =
F[g(b,i) mod N, k].  The MXU absorbs the entire halo merge + relayout for
~1.5x extra (cheap) MACs, replacing the bandwidth-bound overlap_add /
halo_gather passes (measured 51.7 / 22 ms at the bench point).

This script checks numerical equality against overlap_add + pruned DFT and
times both on the device.
"""

import os
import sys
import time

import numpy as np

ONLY_CHECK = os.environ.get("EXP_CHECK_ONLY", "0") == "1"
if ONLY_CHECK:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if ONLY_CHECK:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import nonuniformffts_tpu as nufft
from nonuniformffts_tpu.ops import matmul_fft
from nonuniformffts_tpu.ops.pallas import common

N_GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(os.environ.get("PROF_ITERS", 4))


def timed_scan(f, x, k=K, reps=2):
    # x is a jit ARGUMENT (the axon tunnel ships closure constants inside
    # the remote-compile request, which stalls for GB-sized operands).
    @jax.jit
    def loop(xa):
        def body(c, _):
            def perturb(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + (c * jnp.asarray(1e-30, a.dtype)).astype(a.dtype)
                return a

            y = f(jax.tree.map(perturb, xa))
            s = sum(
                jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(y)
            )
            return jax.lax.optimization_barrier(s), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    _ = float(loop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


def expand_rows(n_over: int, B: int, nb: int, pd: int, m: int) -> np.ndarray:
    """g(b, i) global-row map for the core-first padded layout; -1 for
    alignment rows."""
    g = np.full((nb, pd), -1, dtype=np.int64)
    H = 2 * m - 1
    for b in range(nb):
        for i in range(pd):
            if i < B + m:
                off = i
            elif i < B + H:
                off = i - (B + H)
            else:
                continue
            g[b, i] = (b * B + off) % n_over
    return g


def blockform_factors(ax, g):
    """Expand pruned-axis factor matrices to block-form: rows g(b,i) of the
    (n_over, n_keep) forward factors; zero rows where g == -1.  Returns
    (pcos', psin', bcos', bsin') with forward shape (nb*pd, n_keep) and
    backward (n_keep, nb*pd)."""
    gf = g.reshape(-1)
    valid = gf >= 0
    gc = np.where(valid, gf, 0)

    def fwd(mat):
        out = np.asarray(mat)[gc, :]
        out[~valid] = 0.0
        return jnp.asarray(out)

    def bwd(mat):
        out = np.asarray(mat)[:, gc]
        out[:, ~valid] = 0.0
        return jnp.asarray(out)

    return fwd(ax.pcos_t), fwd(ax.psin_t), bwd(ax.bcos_t), bwd(ax.bsin_t)


def cplx_pair_dot(ar, ai, cm, sm, sign, lhs_dims, prec):
    """(ar + i ai) contracted over ``lhs_dims`` with (cm - i*sign*sm) whose
    contracting dims are the leading ones; Karatsuba (3 real dots)."""
    p = matmul_fft.PRECISIONS[prec]
    rdims = tuple(range(len(lhs_dims)))
    dn = ((lhs_dims, rdims), ((), ()))
    t1 = jax.lax.dot_general(ar, cm, dn, precision=p)
    t2 = jax.lax.dot_general(ai, sm, dn, precision=p)
    t3 = jax.lax.dot_general(ar + ai, cm - sign * sm, dn, precision=p)
    return t1 + sign * t2, t3 - t1 + sign * t2


def forward_blockform(buf, facs, prec):
    """buf: (CR=2, nb0, nb1, nb2, pd0, pd1, pd2) core-first padded blocks.
    facs[d] = (pcos', psin') shaped (nb_d, pd_d, n_keep).  Returns channel
    (1, 2, k0, k1, k2)."""
    xr, xi = buf[0], buf[1]
    D = 3
    # contract axis 0 pair (nb0, pd0) = dims (0, D)=(0,3); output appends k0.
    for d in range(D):
        nd = xr.ndim
        rem = nd - 2  # dims remaining after contraction (before append)
        lhs = (0, (nd + 1) // 2)  # (nb_d, pd_d) positions: see loop invariant
        # Loop invariant: before step d the array is
        # (nb_d..nb_{D-1}, pd_d..pd_{D-1}, k_0..k_{d-1}); nb_d at 0 and
        # pd_d at (D - d).
        lhs = (0, D - d)
        cm, sm = facs[d]
        xr, xi = cplx_pair_dot(xr, xi, cm, sm, 1.0, lhs, prec)
    return jnp.stack([xr, xi])[None]


def backward_blockform(spec_ch, facs, prec):
    """spec_ch: (1, 2, k0, k1, k2).  facs[d] = (bcos', bsin') shaped
    (n_keep, nb_d, pd_d).  Returns buf (2, nb0, pd0, nb1, pd1, nb2, pd2)
    INTERLEAVED; caller transposes to kernel layout."""
    xr, xi = spec_ch[0, 0], spec_ch[0, 1]
    for d in range(3):
        xr, xi = cplx_pair_dot(xr, xi, facs[d][0], facs[d][1], -1.0, (0,), prec)
    return jnp.stack([xr, xi])


def main():
    shape = (N_GRID,) * 3
    prec = "highest" if not ONLY_CHECK else "highest"
    plan = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5,
        spread_method="blocked", fft_method="matmul", precision=prec,
        interpret=ONLY_CHECK,
    )
    m = plan.m
    bdims = plan.block_dims
    pd = common.padded_block_dims(bdims, m)
    nb = tuple(n // b for n, b in zip(plan.shape_over, bdims))
    print(f"shape_over={plan.shape_over} blocks={bdims} pd={pd} nb={nb}")

    rng = np.random.default_rng(0)
    CR = 2
    buf_np = rng.standard_normal((CR,) + nb + pd).astype(np.float32)
    # zero the alignment rows (kernel guarantees this)
    for d in range(3):
        H = 2 * m - 1
        sl = [slice(None)] * (1 + 3 + 3)
        sl[1 + 3 + d] = slice(bdims[d] + H, None)
        buf_np[tuple(sl)] = 0.0
    buf = jnp.asarray(buf_np)

    gs = [expand_rows(plan.shape_over[d], bdims[d], nb[d], pd[d], m) for d in range(3)]
    ffacs, bfacs = [], []
    for d in range(3):
        pc, ps, bc, bs = blockform_factors(plan.fft_axes[d], gs[d])
        ffacs.append((pc.reshape(nb[d], pd[d], -1), ps.reshape(nb[d], pd[d], -1)))
        bfacs.append((bc.reshape(bc.shape[0], nb[d], pd[d]),
                      bs.reshape(bs.shape[0], nb[d], pd[d])))

    # ---------------- reference: overlap_add + pruned forward --------------
    def ref_fwd(b):
        grid = common.overlap_add(b, bdims, pd, m, interpret=plan.interpret)
        g = grid.reshape((1, 2) + grid.shape[1:])
        return matmul_fft.forward_dft_pruned(g, plan.fft_axes, real=False, prec=prec)

    def new_fwd(b):
        return forward_blockform(b, ffacs, prec)

    if os.environ.get("EXP_SKIP_CHECK", "0") == "1":
        spec_t = jnp.asarray(
            rng.standard_normal((1, 2) + shape).astype(np.float32)
        )

        def ref_bwd_t(s_):
            g = matmul_fft.backward_dft_pruned(
                s_, plan.fft_axes, real=False, prec=prec
            )
            gp = g.reshape((2,) + g.shape[2:])
            return common.halo_gather(gp, bdims, pd, m, interpret=plan.interpret)

        t = timed_scan(new_fwd, buf)
        print(f"blockform fwd:           {t*1e3:8.2f} ms", flush=True)
        t = timed_scan(lambda s_: backward_blockform(s_, bfacs, prec), spec_t)
        print(f"blockform bwd (interlv): {t*1e3:8.2f} ms", flush=True)
        t = timed_scan(
            lambda s_: jnp.transpose(
                backward_blockform(s_, bfacs, prec), (0, 1, 3, 5, 2, 4, 6)
            ),
            spec_t,
        )
        print(f"blockform bwd (+transp): {t*1e3:8.2f} ms", flush=True)
        t = timed_scan(ref_fwd, buf)
        print(f"ref fwd (oadd+pruned):   {t*1e3:8.2f} ms", flush=True)
        t = timed_scan(ref_bwd_t, spec_t)
        print(f"ref bwd (pruned+gather): {t*1e3:8.2f} ms", flush=True)
        return

    r = np.asarray(jax.jit(ref_fwd)(buf))
    n = np.asarray(jax.jit(new_fwd)(buf))
    err = np.linalg.norm(r - n) / np.linalg.norm(r)
    print(f"forward blockform vs overlap_add+pruned rel err: {err:.3e}")
    assert err < 2e-5, err

    # ---------------- backward: pruned + halo_gather -----------------------
    spec_np = rng.standard_normal((1, 2) + shape).astype(np.float32)
    spec = jnp.asarray(spec_np)

    def ref_bwd(s):
        g = matmul_fft.backward_dft_pruned(s, plan.fft_axes, real=False, prec=prec)
        gp = g.reshape((2,) + g.shape[2:])
        return common.halo_gather(gp, bdims, pd, m, interpret=plan.interpret)

    def new_bwd(s):
        il = backward_blockform(s, bfacs, prec)
        # interleaved (2, nb0, pd0, nb1, pd1, nb2, pd2) -> kernel layout
        return jnp.transpose(il, (0, 1, 3, 5, 2, 4, 6))

    rb = np.asarray(jax.jit(ref_bwd)(spec))
    nbv = np.asarray(jax.jit(new_bwd)(spec))
    errb = np.linalg.norm(rb - nbv) / max(np.linalg.norm(rb), 1e-30)
    print(f"backward blockform vs pruned+halo_gather rel err: {errb:.3e}")
    assert errb < 2e-5, errb

    if ONLY_CHECK:
        print("CHECK OK")
        return

    # ---------------- timings ---------------------------------------------
    t = timed_scan(lambda b: common.overlap_add(b, bdims, pd, m), buf)
    print(f"overlap_add only:        {t*1e3:8.2f} ms")
    t = timed_scan(ref_fwd, buf)
    print(f"ref fwd (oadd+pruned):   {t*1e3:8.2f} ms")
    t = timed_scan(new_fwd, buf)
    print(f"blockform fwd:           {t*1e3:8.2f} ms")
    t = timed_scan(ref_bwd, spec)
    print(f"ref bwd (pruned+gather): {t*1e3:8.2f} ms")
    t = timed_scan(new_bwd, spec)
    print(f"blockform bwd (+transp): {t*1e3:8.2f} ms")
    t = timed_scan(lambda s: backward_blockform(s, bfacs, prec), spec)
    print(f"blockform bwd (interlv): {t*1e3:8.2f} ms")


main()
