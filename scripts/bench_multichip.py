"""Multi-chip (SpatialNUFFT) throughput line on the virtual CPU mesh.

Runs the spatially-sharded pipeline (all_to_all point routing, per-chip
z-form blocked kernels in interpret mode, distributed blockform matmul-DFT:
local factor-slice contraction + one psum on type 1, collective-free type 2)
over an 8-device virtual CPU mesh and records wall-clock per full iteration
(set_points + type1 + type2) to MULTICHIP_BENCH.json.

The absolute numbers are CPU-emulation (Pallas interpret mode) and NOT TPU
throughput — the artifact exists so multi-chip-path regressions are visible
round over round, as a complement to the correctness dryrun
(__graft_entry__.dryrun_multichip).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/bench_multichip.py
(self-provisions the flags in a subprocess if launched without them)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DEV = int(os.environ.get("MB_DEVICES", 8))
N_GRID = int(os.environ.get("MB_N", 64))
NP_PTS = int(os.environ.get("MB_NP", 131072))
K = int(os.environ.get("MB_ITERS", 3))


def _reexec():
    env = dict(os.environ)
    env["_MB_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={N_DEV}".strip()
    )
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, check=True)


def main():
    if os.environ.get("_MB_CHILD") != "1":
        # Parent never touches jax: the pinned axon backend would have to
        # initialise (and the tunnel may be down) just to count devices.
        return _reexec()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= N_DEV, (
        f"need {N_DEV} virtual devices, have {len(jax.devices())}"
    )

    import jax.numpy as jnp

    from nonuniformffts_tpu.parallel import SpatialNUFFT, make_mesh

    mesh = make_mesh(N_DEV)
    shape = (N_GRID,) * 3
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 2 * np.pi, (3, NP_PTS)).astype(np.float32)
    v = rng.standard_normal((1, 2, NP_PTS)).astype(np.float32)

    def run(spectrum):
        sp = SpatialNUFFT(
            np.complex64, shape, mesh=mesh, m=4, sigma=1.5,
            spectrum=spectrum, interpret=jax.default_backend() == "cpu",
        )

        def full_iter():
            st = sp.set_points(pts)
            u = sp.exec_type1(st, v)
            vb = sp.exec_type2(st, u)
            jax.block_until_ready((u, vb))
            return u, vb

        u, vb = full_iter()  # compile + warm
        ts = []
        for _ in range(K):
            t0 = time.perf_counter()
            full_iter()
            ts.append(time.perf_counter() - t0)
        if spectrum == "sharded":
            # Gather the dim-0-sharded spectrum for the correctness check.
            # addressable_shards iteration order is NOT guaranteed to be
            # shard-index order (advisor finding, round 3): sort by each
            # shard's dim-2 start offset before concatenating.
            shards = sorted(
                u.addressable_shards, key=lambda s: s.index[2].start or 0
            )
            u = jnp.concatenate(
                [np.asarray(s.data) for s in shards], axis=2
            )
        return sp, u, min(ts)

    sp, u, t = run("replicated")

    # Correctness cross-check vs the single-chip reference-path library.
    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.execution import exec_type1_channels

    single = nufft.PlanNUFFT(
        np.complex64, shape, m=4, sigma=1.5, fft_method="xla"
    )
    u_ref = exec_type1_channels(nufft.set_points(single, pts), v)
    err = float(jnp.linalg.norm(u - u_ref) / jnp.linalg.norm(u_ref))

    # O(N^3/n)-memory spectrum layout: same pipeline with the type-1 psum
    # replaced by a reduce_scatter and type-2 consuming the sharded layout.
    sp_sh, u_sh, t_sh = run("sharded")
    err_sh = float(jnp.linalg.norm(u_sh - u_ref) / jnp.linalg.norm(u_ref))

    out = {
        "n_devices": N_DEV,
        "backend": jax.default_backend(),
        "grid": N_GRID,
        "np_points": NP_PTS,
        "t_full_iter_s": t,
        "pts_per_sec": NP_PTS / t,
        "pts_per_sec_per_chip": NP_PTS / t / N_DEV,
        "err_vs_single_chip": err,
        # Back-of-envelope ICI model for the engine choice: bytes one chip
        # sends per step, by collective (SpatialNUFFT.collective_bytes),
        # plus the implied seconds on a v5e ICI ring (~45 GB/s/link axis).
        "collective_bytes_per_step": sp.collective_bytes(),
        "ici_seconds_estimate": {
            k: v / 45e9
            for k, v in sp.collective_bytes().items()
            if isinstance(v, int) and k != "n"  # n = chip count, not bytes
        },
        "sharded_spectrum": {
            "t_full_iter_s": t_sh,
            "err_vs_single_chip": err_sh,
            "collective_bytes_per_step": sp_sh.collective_bytes(),
            "ici_seconds_estimate": {
                k: v / 45e9
                for k, v in sp_sh.collective_bytes().items()
                if isinstance(v, int) and k != "n"
            },
        },
        "note": "CPU virtual mesh, Pallas interpret mode — regression "
        "tracking only, not TPU throughput",
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "MULTICHIP_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    assert err < 1e-4


if __name__ == "__main__":
    main()
