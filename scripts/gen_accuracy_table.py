"""Generate docs/accuracy.md: measured NUFFT accuracy vs (kernel, m, sigma).

The analogue of the reference's docs/src/accuracy.md (err ~ 10^{-1.2M} at
sigma=1.25 ... 10^{-2M} at sigma=2, plateau ~2e-14): a 1-D type-1 transform
against the exact DFT oracle, f64, relative L2 error over all modes.

Run on CPU: PYTHONPATH=. python scripts/gen_accuracy_table.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import nonuniformffts_tpu as nufft

N = 256
NP = 4096
SIGMAS = (1.25, 1.5, 2.0)
MS = (2, 3, 4, 5, 6, 8)
KERNELS = [
    ("BackwardsKaiserBessel (default)", nufft.BackwardsKaiserBesselKernel),
    ("KaiserBessel", nufft.KaiserBesselKernel),
    ("Gaussian", nufft.GaussianKernel),
    ("BSpline", nufft.BSplineKernel),
]

rng = np.random.default_rng(42)
x = rng.uniform(0, 2 * np.pi, NP)
v = rng.standard_normal(NP) + 1j * rng.standard_normal(NP)

# Exact DFT oracle: uhat(k) = sum_j v_j e^{-i k x_j}, k = -N/2 .. N/2-1.
k = np.fft.fftfreq(N, 1.0 / N)
exact = np.exp(-1j * np.outer(k, x)) @ v


def err_for(kernel_cls, m, sigma):
    try:
        plan = nufft.PlanNUFFT(
            np.complex128, (N,), m=m, sigma=sigma, kernel=kernel_cls(),
            spread_method="reference", fft_method="xla",
        )
    except ValueError:
        return None
    plan = nufft.set_points(plan, (x,))
    got = np.asarray(nufft.exec_type1(plan, v))
    return float(np.linalg.norm(got - exact) / np.linalg.norm(exact))


lines = [
    "# Accuracy (measured)",
    "",
    "Relative L2 error of a 1-D type-1 transform (N = 256, Np = 4096, f64)",
    "against the exact DFT, per kernel / half-support M / oversampling sigma —",
    "the counterpart of the reference's docs/src/accuracy.md tables, measured",
    "by `scripts/gen_accuracy_table.py` (re-run it to regenerate).",
    "",
    "Rules of thumb carried over from the reference (and confirmed below):",
    "err ~ 10^{-1.2M} at sigma = 1.25, ~10^{-1.6M} at sigma = 1.5,",
    "~10^{-2M} at sigma = 2 for the (backwards) Kaiser-Bessel kernels, with",
    "a ~1e-14 f64 plateau.  On-device f32 accuracy is certified separately",
    "every benchmark run (bench.py: achieved err at m=4, sigma=1.5 is",
    "~1.4e-6, with the double-single coordinate split removing the f32",
    "position-noise floor).",
    "",
]

for name, cls in KERNELS:
    lines.append(f"## {name}")
    lines.append("")
    header = "| M | " + " | ".join(f"sigma={s}" for s in SIGMAS) + " |"
    lines.append(header)
    lines.append("|---|" + "---|" * len(SIGMAS))
    for m in MS:
        row = [f"| {m} "]
        for s in SIGMAS:
            e = err_for(cls, m, s)
            row.append(f"| {e:.2e} " if e is not None else "| n/a ")
        lines.append("".join(row) + "|")
        print(lines[-1], flush=True)
    lines.append("")

out = os.path.join(os.path.dirname(__file__), "..", "docs", "accuracy.md")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}")
