"""nonuniformffts_tpu: a TPU-native non-uniform FFT (NUFFT) library.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
NonuniformFFTs.jl: plan-based type-1 (non-uniform -> uniform) and type-2
(uniform -> non-uniform) transforms in 1-3 dimensions, real-data (r2c/c2r)
fast path, batched simultaneous transforms over shared points, four spreading
windows with FINUFFT-style fast polynomial evaluation, fused user callbacks,
device-side point bin-sorting and atomic-free blocked spread/gather kernels.

Quick start::

    import numpy as np
    import nonuniformffts_tpu as nufft

    plan = nufft.PlanNUFFT(np.complex64, (256, 256), m=4, sigma=2.0)
    plan = nufft.set_points(plan, (xs, ys))        # points in [0, 2pi)
    uhat = nufft.exec_type1(plan, vp)              # sum_j v_j e^{-i k x_j}
    vp2 = nufft.exec_type2(plan, uhat)             # sum_k u_k e^{+i k x_j}
"""

from .plan import Plan, PlanNUFFT, set_points
from .execution import exec_type1, exec_type2
from .callbacks import NUFFTCallbacks
from .chunked import (
    ChunkedPlan,
    ChunkedPlanNUFFT,
    exec_type1_chunked,
    exec_type2_chunked,
    set_points_chunked,
)
from .nfft_compat import NFFTPlan, nfft, nfft_adjoint, plan_nfft
from .ops.windows import (
    BackwardsKaiserBesselKernel,
    BSplineKernel,
    Direct,
    FastApproximation,
    GaussianKernel,
    KaiserBesselKernel,
)

__version__ = "0.1.0"

__all__ = [
    "Plan",
    "PlanNUFFT",
    "set_points",
    "exec_type1",
    "exec_type2",
    "NUFFTCallbacks",
    "KaiserBesselKernel",
    "BackwardsKaiserBesselKernel",
    "GaussianKernel",
    "BSplineKernel",
    "Direct",
    "FastApproximation",
    "NFFTPlan",
    "plan_nfft",
    "nfft",
    "nfft_adjoint",
    "ChunkedPlan",
    "ChunkedPlanNUFFT",
    "set_points_chunked",
    "exec_type1_chunked",
    "exec_type2_chunked",
]
