"""NUFFT plans: static transform configuration + precomputed device tensors.

TPU-native counterpart of the reference's ``PlanNUFFT`` (src/plan.jl).  A plan
is an immutable pytree dataclass: configuration (sizes, kernel choice,
half-support, ...) is static metadata that becomes compile-time constants of
the jitted transforms — the analogue of the reference's type-level parameters
``HalfSupport{M}`` / ``Val(ntransforms)`` — while the precomputed tensors
(piecewise-polynomial coefficients, deconvolution factors, index maps, sorted
points) are array leaves living on device.

``set_points`` is functional: it returns a *new* plan holding the folded
(and, for the blocked method, bin-sorted) points, replacing the reference's
mutating ``set_points!`` (src/set_points.jl).
"""

from __future__ import annotations

import dataclasses
import math
import warnings
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import deconvolve, windows
from .ops.windows import (
    AbstractKernel,
    BackwardsKaiserBesselKernel,
    Direct,
    EvaluationMode,
    FastApproximation,
    KernelData,
)
from .utils.misc import next_fast_len
from .utils.pytree import data_field, register_pytree_dataclass, static_field

TWO_PI = 2.0 * math.pi


def _identity(x):
    return x


@register_pytree_dataclass
class Plan:
    """See :func:`PlanNUFFT` for the user-facing constructor."""

    # --- static configuration -------------------------------------------
    dtype: Any = static_field()  # np.dtype of non-uniform data (real or complex)
    shape: Tuple[int, ...] = static_field()  # output (non-oversampled) dims
    shape_over: Tuple[int, ...] = static_field()  # oversampled grid dims
    m: int = static_field()  # kernel half-support M
    sigma: float = static_field()  # actual oversampling factor (max over dims)
    kernel: AbstractKernel = static_field()
    evalmode: EvaluationMode = static_field()
    ntransforms: int = static_field()
    fftshift: bool = static_field()
    spread_method: str = static_field()  # 'reference' | 'blocked'
    block_dims: Optional[Tuple[int, ...]] = static_field(default=None)
    sort_points: bool = static_field(default=False)
    point_transform: Callable = static_field(default=_identity)
    chunk_size: Optional[int] = static_field(default=None)
    batch_size: int = static_field(default=128)  # points per Pallas batch
    interpret: bool = static_field(default=False)  # Pallas interpreter mode
    fft_method: str = static_field(default="xla")  # 'xla' | 'matmul'
    # matmul-DFT engine variant: 'pruned' = one fused (deconvolution +
    # truncation/padding baked in) direct contraction per axis; 'split' =
    # four-step Cooley-Tukey factor matrices.  Resolved from 'auto' at plan
    # time: pruned wins wall-clock for n_over <= ~1024 because the split
    # engine's digit-reversal / twiddle / swapaxes passes are HBM-bound.
    fft_variant: str = static_field(default="split")
    precision: str = static_field(default="highest")  # TPU matmul precision
    # Contraction precision override for the blocked Pallas kernels only
    # (None = follow ``precision``).  Besides the _PRECS ladder this accepts
    # 'fxp': six int8 MXU products over three 7-bit limbs per operand —
    # f32-grade coverage (~2^-23, same structure as HIGHEST's bf16x6) at
    # the v5e's 2x int8 pass rate (ops/pallas/blocked.py:_fxp_dot).  'high'
    # (bf16x3) also halves pass count but its products carry only ~2^-16.
    # The bench measures achieved error every run; the DFT stays on its own
    # ``precision`` (K ~ L-term oscillatory sums, ops/matmul_fft.py:38-43).
    kernel_precision: Optional[str] = static_field(default=None)
    # Host-side per-stage Timer (utils.timer.Timer) or None.  When set, the
    # execution functions run stage-by-stage with device sync between stages
    # (the analogue of the reference's TimerOutputs + synchronise=true,
    # src/NonuniformFFTs.jl:157-185, src/plan.jl:453-454).
    timer: Optional[Any] = static_field(default=None)
    normfactor_override: Optional[float] = static_field(default=None)
    # Channel-chunk size for the blocked kernels (in CR = real-channel
    # units): large ntransforms are processed cr_chunk components at a time
    # so the VMEM accumulator fits — the counterpart of the reference's
    # serial component loop in its shared-memory method
    # (src/spreading/gpu.jl:293).  None/0 = all channels in one pass.
    cr_chunk: Optional[int] = static_field(default=None)
    # Windowed accumulation (blocked kernels): with points sub-sorted by
    # their dim-0 cell inside each block, a point batch spans a narrow
    # x-window, and the kernels accumulate into only ``window_rows`` rows of
    # the padded block at a per-batch dynamic (8-aligned) offset instead of
    # all pd0 rows — cutting the dominant dense-contraction MACs by
    # ~pd0/window_rows for dense blocks.  None disables (sparse geometries
    # where batches span whole blocks anyway).
    window_rows: Optional[int] = static_field(default=None)
    # Second-level (dim-1) window for the z-form kernels (D >= 3): batches
    # whose points also span a narrow dim-1 cell range contract only
    # window_rows_y of the pd1 middle rows, accumulating into a 2D
    # (dim-0, dim-1) window of the 3D accumulator.  Only effective at high
    # density (a batch must fit within one dim-0 slab for its dim-1 span to
    # be narrow); None disables.
    window_rows_y: Optional[int] = static_field(default=None)
    # Ping-pong double accumulator in the z-form spread kernel: alternate
    # batches accumulate into disjoint VMEM scratch (merged at block write)
    # so a batch's MXU contraction is not serialised behind the previous
    # batch's accumulator read-modify-write.  Costs one extra accumulator
    # of VMEM; off by default pending device A/B.
    spread_acc2: bool = static_field(default=False)
    # Batches per DMA descriptor in the blocked kernels: the scalar core's
    # per-descriptor issue cost (~1-2 us) exceeds a single batch's compute,
    # so descriptors carry dma_super * batch_size lanes and the kernels peel
    # P-wide sub-batches at dynamic 128-aligned lane offsets.  Applied on
    # the packed layout only (the slotted/routed layouts keep one batch per
    # descriptor).
    dma_super: int = static_field(default=4)
    # Per-exec value permutation into sorted order (packed layout):
    # 'gather' = jnp.take by sort_perm; 'sort' = ONE stable payload sort
    # keyed by the saved unsorted bin key (cheaper past a few million
    # points); 'auto' picks by Np at set_points time.
    value_permute: str = static_field(default="auto")
    # Extended-precision (double-single) pipeline: complex128 or float64
    # plans with precision='double' on the blocked method.  Every value-bearing tensor
    # is an (hi, lo) f32 pair; kernels and DFT contract via int8 limb
    # cascades with exact int32 accumulation (ops/ds.py,
    # ops/pallas/blocked_ds.py, matmul_fft.forward_dft_blockform_ds) —
    # the TPU-native replacement for the reference's native-Float64 path.
    ds: bool = static_field(default=False)
    # int8 limbs per ds operand: 6 -> ~2^-42-grade contractions (~1.3x one
    # f32-HIGHEST dot of MXU time), 7 -> ~2^-48 (~1.8x).
    ds_nl: int = static_field(default=6)
    # INTERNAL (scripts/exp_strip.py only): replace a named stage of the
    # z-form kernels' per-batch work with a cheap stand-in so stage cost
    # can be attributed by differencing on device.  Results are WRONG when
    # set.  Values (validated at kernel launch, ops/pallas/blocked.py
    # _check_strip): 'horner' | 'weights' | 'stack' (spread only) | 'dot' |
    # 'acc' (spread only) | 'rowsum' (interp only) | 'branch' (needs the
    # dim-0 window active without a dim-1 window) | 'loop' | 'dma' |
    # 'nodma'.
    debug_strip: Optional[str] = static_field(default=None)

    # --- precomputed tensors --------------------------------------------
    kernel_data: Tuple[KernelData, ...] = data_field(default=())
    phihat_inv: Tuple[jnp.ndarray, ...] = data_field(default=())  # 1/phi_hat per dim
    # ds plans: f32 residuals of the f64 deconvolution factors (hi = the
    # phihat_inv entries themselves, forced f32).
    phihat_inv_lo: Tuple[jnp.ndarray, ...] = data_field(default=())
    # Per-dim (src_start, length) slice ranges mapping output modes into the
    # oversampled FFT axis — static so trunc/pad lower to slices, not gathers.
    index_ranges: Tuple = static_field(default=())
    kvec: Tuple[jnp.ndarray, ...] = data_field(default=())  # output wavenumbers
    fft_axes: Tuple = data_field(default=())  # AxisDFT per dim (matmul FFT)
    # Block-form factors (matmul_fft.BlockAxisDFT per dim): halo merge /
    # gather + relayout folded into the DFT contractions (blocked + pruned
    # single-chip path only; see matmul_fft.forward_dft_blockform).
    fft_axes_block: Tuple = data_field(default=())

    # Point layout for the blocked kernels: 'packed' (default — ONE
    # multi-operand sort, kernels read 128-aligned windows of the sorted
    # array with in-kernel edge masking) or 'slots' (slot-expanded layout
    # with a gathered copy per block segment; used by the spatially-sharded
    # path whose routed points carry invalid lanes).
    layout: str = static_field(default="packed")
    # Kernel buffer form: 'yz' = accumulator (CR*pd0, pd1*..*pd_last) with
    # all trailing dims in lanes; 'z' = (CR*pd0*..*pd_{D-2}, pd_last) with
    # only the last dim in lanes (pd_last 128-aligned) — trailing-dim window
    # cost moves to MXU rows (cheap) and the blockform DFT exchanges buffers
    # with the kernels with zero relayout.
    kernel_form: str = static_field(default="yz")
    padded_dims: Optional[Tuple[int, ...]] = static_field(default=None)

    # --- point state (set by set_points) --------------------------------
    points: Optional[jnp.ndarray] = data_field(default=None)  # (D, Np) folded
    points_slotted: Optional[jnp.ndarray] = data_field(default=None)  # (DP, Nslots)
    # Packed layout state: sorted point rows (8, Np_pad), per-block sorted
    # ranges (nblocks+1,), and the sorted original indices (Np_pad,) used
    # for the per-exec value permutation.
    points_packed: Optional[jnp.ndarray] = data_field(default=None)
    pstarts: Optional[jnp.ndarray] = data_field(default=None)
    sort_perm: Optional[jnp.ndarray] = data_field(default=None)
    # Inverse sort positions (Np,): present when the per-exec value
    # permutation runs as a payload sort instead of a gather (XLA TPU
    # gathers cost ~7 ns/index — a sort is ~3x cheaper past a few million
    # points; below that the gather wins).  Controlled by ``value_permute``.
    sort_key: Optional[jnp.ndarray] = data_field(default=None)
    slot_to_point: Optional[jnp.ndarray] = data_field(default=None)  # (Nslots,)
    slot_valid: Optional[jnp.ndarray] = data_field(default=None)  # (Nslots,) bool
    point_slots: Optional[jnp.ndarray] = data_field(default=None)  # (Np,)
    block_starts: Optional[jnp.ndarray] = data_field(default=None)  # (nblocks+1,) in batches
    num_points_static: Optional[int] = static_field(default=None)  # Np (blocked)
    # Reference-path spatial sort (sort_points=True): points stored in
    # cell-major order for scatter/gather locality (reference:
    # src/blocking/gpu.jl:130-139); values permute in, results permute out.
    point_perm: Optional[jnp.ndarray] = data_field(default=None)  # (Np,)
    point_perm_inv: Optional[jnp.ndarray] = data_field(default=None)  # (Np,)
    # Per-batch accumulator window row starts (windowed kernels); -1 marks
    # full-accumulator fallback batches (left-edge wrap or span > W).
    batch_r0: Optional[jnp.ndarray] = data_field(default=None)  # (nbatches,)
    batch_r1: Optional[jnp.ndarray] = data_field(default=None)  # (nbatches,)

    # --------------------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def is_real(self) -> bool:
        return not np.issubdtype(np.dtype(self.dtype), np.complexfloating)

    @property
    def real_dtype(self):
        return np.dtype(self.dtype).type(0).real.dtype

    @property
    def complex_dtype(self):
        return np.result_type(np.dtype(self.dtype), np.complex64)

    @property
    def spectral_shape(self) -> Tuple[int, ...]:
        """Dimensions of the uniform-data arrays (Fourier space), the
        counterpart of ``size(::PlanNUFFT)`` (src/plan.jl:420-426).  For
        real-data plans the *last* axis is halved (XLA rfft convention)."""
        if self.is_real:
            return self.shape[:-1] + (self.shape[-1] // 2 + 1,)
        return self.shape

    @property
    def spectral_shape_over(self) -> Tuple[int, ...]:
        if self.is_real:
            return self.shape_over[:-1] + (self.shape_over[-1] // 2 + 1,)
        return self.shape_over

    @property
    def num_points(self) -> Optional[int]:
        if self.num_points_static is not None:
            return self.num_points_static
        return None if self.points is None else self.points.shape[1]

    @property
    def normfactor(self) -> float:
        """FFT normalisation ``prod(2pi / N~)`` (NonuniformFFTs.jl:181).
        The spatially-sharded path overrides this on its per-chip local plan
        views (whose shape_over is one grid slab) with the global value."""
        if self.normfactor_override is not None:
            return self.normfactor_override
        out = 1.0
        for n in self.shape_over:
            out *= TWO_PI / n
        return out

    @property
    def dma_super_eff(self) -> int:
        """Effective super-batch factor for the blocked kernels: the packed
        layout pre-pads its arrays for the DMA overhang; other layouts run
        one batch per descriptor."""
        return self.dma_super if self.layout == "packed" else 1

    @property
    def row_shifted(self) -> bool:
        """Halo-first kernel row layout (rows i = lx + t, no wrap): the
        z-form blockform path only.  Core-first everywhere else (the
        overlap_add/halo_gather passes extract the core by aligned
        slicing).  See ops/pallas/common.build_wt_matrix and
        matmul_fft.blockform_row_map."""
        return self.kernel_form == "z"

    @property
    def window_align(self) -> int:
        """Sublane-offset granule for the windowed accumulation's per-batch
        row start r0: the yz-form kernels slice the accumulator at sublane
        offset ``c*pd0 + r0`` (must be 8-aligned); the z-form's offsets are
        ``(c*pd0 + r0) * rm`` with rm = prod(padded mid dims) an 8-multiple
        for D >= 3, so r0 there needs no alignment at all (tighter windows,
        more batches qualify)."""
        if self.kernel_form == "z" and self.ndim >= 3:
            return 1
        return 8

    # Convenience (functional) methods mirroring the reference's API.
    def set_points(self, points) -> "Plan":
        return set_points(self, points)

    def exec_type1(self, vp, callbacks=None):
        from .execution import exec_type1

        return exec_type1(self, vp, callbacks=callbacks)

    def exec_type2(self, uhat, callbacks=None):
        from .execution import exec_type2

        return exec_type2(self, uhat, callbacks=callbacks)

    def __repr__(self):  # mirrors the reference's Base.show (plan.jl:362-392)
        lines = [
            f"{self.ndim}-dimensional PlanNUFFT (TPU) with input type {np.dtype(self.dtype).name}:",
            f"  - kernel: {self.kernel} with half-support M = {self.m}",
            f"  - evaluation mode: {type(self.evalmode).__name__}",
            f"  - oversampling factor: sigma = {self.sigma:.6g}",
            f"  - uniform dimensions: {self.spectral_shape} (oversampled grid {self.shape_over})",
            f"  - simultaneous transforms: {self.ntransforms}",
            f"  - frequency order: {'increasing' if self.fftshift else 'FFTW'} (fftshift = {self.fftshift})",
            f"  - spreading method: {self.spread_method}"
            + (f", block dims {self.block_dims}" if self.block_dims else ""),
            f"  - points set: {self.num_points if self.points is not None else 'no'}",
        ]
        if self.spread_method == "blocked" and self.block_dims:
            nblocks = 1
            for n, b in zip(self.shape_over, self.block_dims):
                nblocks *= n // b
            lines.append(
                f"  - blocked geometry: {nblocks} blocks, point batch "
                f"{self.batch_size}, FFT engine {self.fft_method} "
                f"(precision {self.precision})"
            )
            lines.append(f"  - point layout: {self.layout}")
            if self.points_slotted is not None and self.num_points:
                waste = self.points_slotted.shape[1] / self.num_points
                lines.append(f"  - slot padding waste: {waste:.2f}x")
            elif self.points_packed is not None and self.num_points:
                waste = (
                    self.num_points + 0.5 * min(nblocks, self.num_points) *
                    self.batch_size
                ) / self.num_points
                lines.append(f"  - batch padding waste: ~{waste:.2f}x (est)")
        if self.timer is not None:
            lines.append(f"  - timer attached (synchronise={self.timer.synchronise})")
        return "\n".join(lines)


def _check_nufft_size(n_over: int, m: int):
    if n_over < 2 * m:
        raise ValueError(
            f"data size is too small: sigma*N = {n_over} < {2 * m} = 2M. Try "
            "increasing N or sigma, or decreasing the kernel half-support M."
        )


def PlanNUFFT(
    dtype,
    shape,
    *,
    m: int = 4,
    sigma: float = 2.0,
    kernel: AbstractKernel = None,
    kernel_evalmode: EvaluationMode = None,
    ntransforms: int = 1,
    fftshift: bool = False,
    spread_method: str = "auto",
    block_dims=None,
    sort_points: bool = False,
    point_transform: Callable = _identity,
    chunk_size: Optional[int] = None,
    batch_size="auto",  # points per kernel batch (int or 'auto')
    interpret: bool = False,
    fft_method: Optional[str] = None,
    fft_variant: str = "auto",
    precision: str = "highest",
    kernel_precision: Optional[str] = None,
    np_hint: Optional[int] = None,
    window_rows: Optional[int] = "auto",
    window_rows_y: Optional[int] = "auto",
    layout: str = "packed",
    dma_super: int = 4,
    spread_acc2: bool = False,
    value_permute: str = "auto",
    dft_fold: bool = True,
    timer=None,
) -> Plan:
    """Construct a NUFFT plan (counterpart of ``PlanNUFFT`` in src/plan.jl).

    Parameters mirror the reference: ``dtype`` is the non-uniform data type
    (real dtypes select the r2c fast path), ``shape`` the uniform grid
    dimensions, ``m`` the kernel half-support, ``sigma`` the oversampling
    factor, ``kernel`` one of the four window kernels (default backwards
    Kaiser-Bessel), ``ntransforms`` the number of simultaneous transforms over
    shared points and ``fftshift`` the frequency ordering.

    ``spread_method`` selects the execution path: ``'reference'`` is the
    pure-jnp scatter/gather oracle; ``'blocked'`` is the TPU fast path
    (bin-sorted points + block-owner Pallas kernels); ``'auto'`` (default)
    picks per backend and expected density (``np_hint``).
    """
    if isinstance(shape, int):
        shape = (shape,)
    shape = tuple(int(n) for n in shape)
    D = len(shape)
    if not 1 <= D <= 3:
        raise ValueError(f"only 1-3 dimensions supported, got {D}")
    dtype = np.dtype(dtype)
    if dtype not in (
        np.dtype(np.float32),
        np.dtype(np.float64),
        np.dtype(np.complex64),
        np.dtype(np.complex128),
    ):
        raise TypeError(f"unsupported non-uniform data dtype {dtype}")
    is_real = not np.issubdtype(dtype, np.complexfloating)
    real_dtype = dtype.type(0).real.dtype

    if kernel is None:
        kernel = BackwardsKaiserBesselKernel()
    if kernel_evalmode is None:
        kernel_evalmode = FastApproximation()

    # Extended-precision (double-single) pipeline: 64-bit dtype +
    # precision='double' on the blocked method.  float64 plans run the
    # REAL ds pipeline (r2c factors, CR = C real channel pairs) — the
    # extended-precision twin of the reference's flagship Float64 real-data
    # transforms (src/plan.jl:3-16 RealNUFFTData).  (precision='double' on
    # 32-bit dtypes keeps its existing meaning: compensated f32
    # accumulation.)  Resolved fully after spread_method below.
    ds_requested = precision == "double" and dtype in (
        np.dtype(np.complex128),
        np.dtype(np.float64),
    )

    # Oversampled grid dims: next 5-smooth integer >= sigma*N; for real-data
    # plans the halved (last) axis is forced even (reference: plan.jl:485-498,
    # which applies the rule to its halved *first* axis).
    shape_over = []
    for d, n in enumerate(shape):
        if is_real and d == D - 1:
            n_over = 2 * next_fast_len(int(math.floor(sigma * ((n + 1) // 2))))
        else:
            n_over = next_fast_len(int(math.floor(sigma * n)))
        _check_nufft_size(n_over, m)
        shape_over.append(n_over)
    shape_over = tuple(shape_over)

    sigma_actual = max(no / n for no, n in zip(shape_over, shape))

    if spread_method == "auto":
        pass  # resolved below; ds gating needs the resolved method
    ds_mode = ds_requested and (
        spread_method in ("blocked", "auto")
        # 'auto' resolves to 'blocked' on TPU only; on other backends an
        # explicit spread_method='blocked' opts in (tests run interpret).
        and (spread_method == "blocked" or jax.default_backend() in ("tpu", "axon"))
    )
    if ds_mode and not isinstance(kernel_evalmode, FastApproximation):
        raise ValueError(
            "extended-precision (precision='double' 64-bit) plans "
            "require FastApproximation kernel evaluation (ds coefficient "
            "pairs)"
        )
    if ds_mode and m > 8:
        # The ds kernels carry doubled (hi, lo) working sets; m = 10 blows
        # the v5e scoped-VMEM budget (measured, docs/accuracy.md) and m = 8
        # already saturates the ~2^-48 ds representation floor (5.1e-12 on
        # device) — a larger window cannot buy more accuracy in this mode.
        raise ValueError(
            f"extended-precision plans support m <= 8 (got m={m}); m=8 "
            "already reaches the double-single representation floor "
            "(~5e-12 measured on device, docs/accuracy.md)"
        )

    # Per-dimension kernel data with the per-dim actual oversampling factor
    # (plan.jl:500-505).
    kernel_data = tuple(
        windows.make_kernel_data(
            kernel, m, n_over, n_over / n, real_dtype, ds=ds_mode
        )
        for n, n_over in zip(shape, shape_over)
    )

    # Output wavenumbers, deconvolution factors and slice ranges per dim.
    kvec_np, phinv_np, iranges = [], [], []
    for d, (n, n_over, kd) in enumerate(zip(shape, shape_over, kernel_data)):
        r2c = is_real and d == D - 1
        k = deconvolve.output_wavenumbers(n, r2c=r2c, fftshift=fftshift and not r2c)
        ph = windows.fourier_coefficients_np(kd, k)
        n_over_spec = (n_over // 2 + 1) if r2c else n_over
        iranges.append(
            deconvolve.truncate_ranges(
                len(k), n_over_spec, r2c=r2c, fftshift=fftshift and not r2c
            )
        )
        kvec_np.append(k)
        phinv_np.append(1.0 / ph)

    if spread_method == "auto":
        # Density-adaptive method selection (the analogue of the reference's
        # gpu_method choice, docs/src/benchmarks.md:40-61, picked from our
        # own sweep): on TPU the blocked Pallas path wins at every density
        # the sweep covers (XLA lowers the reference path's scatter/gather
        # serially on TPU), except for tiny problems where the slot
        # machinery's fixed overhead dominates; elsewhere (CPU tests) the
        # vectorised reference path is the sane default.
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # The blocked path wins on TPU at every density measured (XLA lowers
        # the reference path's scatter serially there — ~250k updates/s, so
        # even 1k points x (2M)^3 stencil cells is seconds); density only
        # shifts the geometry (choose_geometry picks coarse blocks at low
        # np_hint).  The reference path remains the default off-TPU.
        spread_method = "blocked" if on_tpu else "reference"
        # Tiny point sets: below the MAC crossover the dense direct NUDFT
        # (ops/direct.py) beats the blocked pipeline's grid-sized DFT floor
        # (~40 ms at N=256^3 regardless of Np, PROFILE.md round-5
        # low-density analysis).  32-bit dtypes only: the direct path's
        # exact phase reduction targets the f32 budget.
        if (
            on_tpu
            and np_hint is not None
            and not ds_requested
            and np.dtype(dtype).itemsize <= 8
        ):
            from .ops.direct import blocked_dft_macs, direct_macs

            spec_shape = (
                shape[:-1] + (shape[-1] // 2 + 1,) if is_real else shape
            )
            if 2 * direct_macs(np_hint, spec_shape) < 2 * blocked_dft_macs(
                shape_over
            ):
                spread_method = "direct"

    # FFT engine decision first — it determines the kernel buffer form.
    # XLA's native FFT where available; MXU matmul-DFT on TPU backends that
    # do not implement the FFT op (ops/matmul_fft.py).
    if ds_mode:
        # The ds pipeline needs the block-form DFT: the halo merge must
        # live inside the ds factor contraction (a separate f32 merge pass
        # would round the hi channels at 2^-24).
        if fft_method not in (None, "matmul") or fft_variant not in (
            "auto", "pruned"
        ):
            raise ValueError(
                "extended-precision plans require the pruned matmul-DFT "
                f"engine; got fft_method={fft_method!r}, "
                f"fft_variant={fft_variant!r}"
            )
        if layout != "packed":
            raise ValueError("extended-precision plans require layout='packed'")
        fft_method, fft_variant = "matmul", "pruned"
        # ds kernels carry double buffers everywhere; one batch per DMA
        # descriptor keeps the scoped-VMEM stack under the chip limit at
        # m >= 8 (measured: m=8 interp overflowed 16 MiB by 36 KB at
        # dma_super=4).
        dma_super = 1
    elif fft_method is None:
        fft_method = "matmul" if jax.default_backend() in ("tpu", "axon") else "xla"
    if spread_method not in ("reference", "blocked", "direct"):
        raise ValueError(f"unknown spread_method {spread_method!r}")
    if spread_method == "direct":
        # The direct NUDFT evaluates the transform sums exactly — no grid,
        # no FFT, no deconvolution.  Forcing the matmul engine makes the
        # (unused) deconvolve stage a structural no-op in execution.py, and
        # sort_points is meaningless (there is no locality to exploit; the
        # value order must match the stored point order).
        if sort_points:
            raise ValueError("sort_points is not supported with spread_method='direct'")
        fft_method = "matmul"
    if fft_method == "matmul":
        if fft_variant == "auto":
            fft_variant = "pruned" if max(shape_over) <= 1024 else "split"
    else:
        fft_variant = "split"
    # Kernel buffer form: 'z' lays the accumulator out as
    # (CR*pd0*..*pd_{D-2}, pd_last) — trailing dims in MXU *rows* (cheap)
    # instead of lanes, pd_last 128-aligned so the blockform DFT reads and
    # writes the kernel layout with zero relayout.  Requires the blockform
    # DFT (pruned matmul engine) and D >= 2.
    if precision not in ("default", "high", "highest", "double"):
        raise ValueError(f"unknown precision {precision!r}")
    if kernel_precision not in (
        None, "default", "high", "highest", "double", "fxp"
    ):
        raise ValueError(f"unknown kernel_precision {kernel_precision!r}")
    if value_permute not in ("auto", "gather", "sort"):
        raise ValueError(f"unknown value_permute {value_permute!r}")
    kernel_form = (
        "z"
        if (
            spread_method == "blocked"
            and fft_method == "matmul"
            and fft_variant == "pruned"
            and D >= 2
            # 'double' uses the plain pruned drivers (single contracted axis)
            # so the compensated accumulation wraps every contraction.
            and precision != "double"
        )
        else "yz"
    )

    cr_chunk = None
    if spread_method == "blocked":
        from .blocking import choose_geometry

        # Pallas DMA slot offsets (start_b + i) * P must be lane-tile (128)
        # aligned on real TPUs; interpret mode would silently accept any
        # value and then crash compiled (advisor finding, round 1).
        if batch_size != "auto" and batch_size % 128 != 0 and not interpret:
            raise ValueError(
                f"batch_size={batch_size} must be a multiple of 128 for the "
                "blocked method on TPU (DMA lane-tile alignment); use "
                "interpret=True for emulation with smaller batches"
            )
        cr_total = ntransforms * (1 if is_real else 2)
        cr_step = 1 if is_real else 2  # keep a component's re/im together
        if ds_mode:
            # ds kernels carry (hi, lo) pairs: the VMEM working set doubles
            # and channel chunking is not supported — geometry must fit the
            # full 2*CR accumulator.
            cr_total *= 2
            cr_step = cr_total

        def _geometry_for(batch):
            # Find the largest channel chunk whose geometry fits VMEM
            # (halving until feasible; the kernels then loop over chunks —
            # reference: serial component loop, src/spreading/gpu.jl:293).
            cr = cr_total
            while True:
                bd, geo_warnings = choose_geometry(
                    shape_over, m, cr=cr, np_hint=np_hint,
                    batch_size=batch, n_keep=shape, form=kernel_form,
                    spread_acc2=spread_acc2, dma_super=dma_super,
                    precision=kernel_precision or precision,
                )
                if not any("VMEM" in w for w in geo_warnings) or cr <= cr_step:
                    break
                cr = max(cr_step, (cr // 2 + cr_step - 1) // cr_step * cr_step)
            return bd, geo_warnings, cr

        if block_dims is None:
            if batch_size == "auto":
                # Per-batch fixed kernel cost makes bigger point batches win
                # at high density; search candidates jointly with geometry
                # under the same cost model (blocking.geometry_cost).
                from .blocking import (
                    SMEM_BUDGET_BYTES, geometry_cost, smem_bytes,
                )

                best = None
                np_eff = np_hint if np_hint else max(
                    int(0.05 * np.prod(shape_over)), 1
                )
                # All batch sizes compete under the same cost model; the
                # measured 384+ VMEM-pipeline cliff (round-3 ladder: 256 ->
                # 384 at identical blocks = +66%) is a threshold penalty in
                # geometry_cost (blocking.VMEM_PRESSURE_BYTES), which is
                # what rejects the large-batch candidates the raw model
                # would otherwise prefer at high density.  1024 survives as
                # the SMEM escalation size: at rho ~ 10 (167.8M points) the
                # per-batch scalar-prefetch metadata overflows SMEM below
                # batch 512.
                for cand in (128, 256, 384, 512, 1024):
                    bd_c, warns_c, cr_c = _geometry_for(cand)
                    if any("VMEM" in w for w in warns_c) and best is not None:
                        continue
                    nblocks_c = int(np.prod(
                        [n // b for n, b in zip(shape_over, bd_c)]
                    ))
                    if smem_bytes(np_eff, nblocks_c, cand) > SMEM_BUDGET_BYTES:
                        continue
                    cost_c, _ = geometry_cost(
                        shape_over, bd_c, m, cr_c, np_eff, cand,
                        n_keep=shape, form=kernel_form,
                        spread_acc2=spread_acc2, dma_super=dma_super,
                        precision=kernel_precision or precision,
                    )
                    if best is None or cost_c < best[0]:
                        best = (cost_c, cand, bd_c, warns_c, cr_c)
                if best is None:  # even 1024-point batches overflow SMEM
                    bd_c, warns_c, cr_c = _geometry_for(1024)
                    best = (float("inf"), 1024, bd_c, warns_c + [
                        f"~{np_eff:,} points need more per-batch SMEM "
                        "metadata than the chip has even at batch_size="
                        "1024; expect a compile failure — shard the points "
                        "over chips (SpatialNUFFT) instead."
                    ], cr_c)
                _, batch_size, block_dims, geo_warnings, cr = best
            else:
                block_dims, geo_warnings, cr = _geometry_for(batch_size)
            cr_chunk = cr if cr < cr_total else None
            for w in geo_warnings:
                warnings.warn(w, stacklevel=2)
        else:
            if batch_size == "auto":
                batch_size = 128  # explicit geometry: keep the default batch
            block_dims = tuple(int(b) for b in block_dims)
            for d, (b, n_over) in enumerate(zip(block_dims, shape_over)):
                if n_over % b != 0:
                    raise ValueError(
                        f"block dim {b} must divide the oversampled grid size {n_over}"
                    )
                if b < m and not (kernel_form == "z" and 0 < d < D - 1):
                    # Middle dims of the z-form/blockform pipeline may go
                    # below M: the halo lives entirely in the DFT factor
                    # row map (blockform_row_map handles any B >= 1 — a
                    # global row simply appears in several blocks' padded
                    # rows and the factor contraction sums/duplicates
                    # them), and block ownership means no cross-block
                    # writes exist.  Every other path merges halos into
                    # immediate neighbours only.
                    raise ValueError(
                        f"block dim {b} must be >= the kernel half-support M={m} "
                        "(halos may only touch immediate neighbour blocks)"
                    )

    # Windowed accumulation: choose the per-batch accumulator window W from
    # the expected x-span of a batch_size-point batch (points sub-sorted by
    # dim-0 cell within blocks).  Enabled when W meaningfully undercuts the
    # full padded extent pd0; fallback batches (span > W, left-edge wrap)
    # use the full accumulator, so W is a tuning knob, not a correctness
    # bound.  ``window_rows``: 'auto' (default) picks W from the expected
    # density; an explicit value is rounded up to the 8-sublane granule;
    # None/0 disables the windowed path.
    padded_dims = None
    if spread_method == "blocked":
        from .ops.pallas.common import (
            padded_block_dims,
            padded_block_dims_z,
            round_up,
        )

        padded_dims = (
            padded_block_dims_z(block_dims, m)
            if kernel_form == "z"
            else padded_block_dims(block_dims, m)
        )
        pd0_ = padded_dims[0]
        nblocks_ = 1
        for n_over, b in zip(shape_over, block_dims):
            nblocks_ *= n_over // b
        total_ = 1
        for n_over in shape_over:
            total_ *= n_over
        avg = (np_hint if np_hint else max(int(0.05 * total_), 1)) / nblocks_
        if ds_mode:
            window_rows = None  # ds kernels run the full-accumulator form
        if window_rows == "auto":
            # Expected dim-0 cell span of one batch + the 2M window rows;
            # batches exceeding W take the full-accumulator fallback, so
            # this is a tuning knob.  The yz form slices the accumulator at
            # an 8-aligned sublane offset (up to 7 rows of slack); the
            # z form's row offsets are pd1-strided (already aligned), so W
            # needs no slack and no rounding.
            span = block_dims[0] * min(1.0, batch_size / max(avg, 1.0))
            if kernel_form == "z" and D >= 3:
                # Halo-first rows need exactly span + 2m - 1; +2 of margin
                # absorbs estimate noise (W = span + 2m + 2 re-measured
                # -4.5 ms/kernel slower at rho=1, PROFILE.md round-5 A/B).
                window_rows = int(span) + 2 * m + 1
            else:
                window_rows = round_up(int(span) + 2 * m + 8, 8)
        elif window_rows:
            if not (kernel_form == "z" and D >= 3):
                window_rows = round_up(int(window_rows), 8)
            window_rows = int(window_rows)
        else:
            window_rows = None
        if window_rows is not None and window_rows >= pd0_:
            window_rows = None

        # Dim-1 window (z-form 3D only): a batch's dim-1 span is narrow
        # only when its points fit inside one dim-0 cell slab, i.e. when
        # the per-x-slab point count well exceeds the batch size.
        if (
            window_rows is not None
            and kernel_form == "z"
            and D >= 3
            and bool(window_rows_y)
        ):
            pd1_ = padded_dims[1]
            if window_rows_y == "auto":
                per_slab = avg / block_dims[0]
                span_y = block_dims[1] * min(
                    1.0, batch_size / max(per_slab, 1.0)
                )
                window_rows_y = round_up(int(span_y) + 2 * m + 8, 8)
            else:
                window_rows_y = round_up(int(window_rows_y), 8)
            if window_rows_y >= pd1_:
                window_rows_y = None
        else:
            window_rows_y = None
    else:
        window_rows = None
        window_rows_y = None

    fft_axes = ()
    fft_axes_np = ()
    if fft_method == "matmul":
        from .ops import matmul_fft

        if fft_variant == "pruned":
            pruned = [
                matmul_fft.make_pruned_axis_dft(
                    n_over,
                    iranges[d],
                    phinv_np[d],
                    "pruned_r2c" if (is_real and d == D - 1) else "pruned_c2c",
                    np.float64 if ds_mode else real_dtype,
                    return_np=True,
                    host_only=ds_mode,  # ds: f64 factors stay host-side
                )
                for d, n_over in enumerate(shape_over)
            ]
            fft_axes = tuple(ax for ax, _ in pruned)
            fft_axes_np = tuple(npf for _, npf in pruned)
        else:
            fft_axes = tuple(
                matmul_fft.make_axis_dft(
                    n_over,
                    "r2c" if (is_real and d == D - 1) else "c2c",
                    real_dtype,
                )
                for d, n_over in enumerate(shape_over)
            )

    fft_axes_block = ()
    if (
        fft_method == "matmul"
        and fft_variant == "pruned"
        and spread_method == "blocked"
        and (precision != "double" or ds_mode)
    ):
        from .ops import matmul_fft

        fft_axes_block = tuple(
            matmul_fft.make_blockform_axis(
                ax,
                block_dims[d],
                shape_over[d] // block_dims[d],
                padded_dims[d],
                m,
                merged=(kernel_form == "z" and d == D - 1),
                np_factors=fft_axes_np[d],
                fold=dft_fold and not ds_mode,
                ds=ds_mode,
                shifted=(kernel_form == "z"),
            )
            for d, ax in enumerate(fft_axes)
        )

    return Plan(
        dtype=dtype,
        shape=shape,
        shape_over=shape_over,
        m=int(m),
        sigma=float(sigma_actual),
        kernel=kernel,
        evalmode=kernel_evalmode,
        ntransforms=int(ntransforms),
        fftshift=bool(fftshift),
        spread_method=spread_method,
        block_dims=tuple(block_dims) if block_dims is not None else None,
        sort_points=bool(sort_points),
        point_transform=point_transform,
        chunk_size=chunk_size,
        batch_size=128 if batch_size == "auto" else int(batch_size),
        interpret=bool(interpret),
        fft_method=fft_method,
        fft_variant=fft_variant,
        fft_axes=fft_axes,
        fft_axes_block=fft_axes_block,
        precision=precision,
        kernel_precision=kernel_precision,
        timer=timer,
        cr_chunk=cr_chunk,
        window_rows=window_rows,
        window_rows_y=window_rows_y,
        layout=layout,
        dma_super=max(int(dma_super), 1),
        spread_acc2=bool(spread_acc2),
        value_permute=value_permute,
        kernel_form=kernel_form,
        padded_dims=padded_dims,
        kernel_data=kernel_data,
        phihat_inv=tuple(
            jnp.asarray(p, dtype=np.float32 if ds_mode else real_dtype)
            for p in phinv_np
        ),
        phihat_inv_lo=tuple(
            jnp.asarray(
                (np.asarray(p, np.float64) - np.asarray(p, np.float32)
                 .astype(np.float64)).astype(np.float32)
            )
            for p in phinv_np
        ) if ds_mode else (),
        index_ranges=tuple(iranges),
        kvec=tuple(
            jnp.asarray(k, dtype=np.float32 if ds_mode else real_dtype)
            for k in kvec_np
        ),
        ds=ds_mode,
    )


# ---------------------------------------------------------------------------
# set_points
# ---------------------------------------------------------------------------


def _canonicalise_points(points, D: int, real_dtype) -> jnp.ndarray:
    """Accept the reference's input formats (src/set_points.jl): a tuple/list
    of D vectors, a 1-D vector (D == 1), an (Np, D) array of point tuples, or
    a (D, Np) matrix.  Returns a (D, Np) array."""
    if isinstance(points, (tuple, list)):
        if len(points) != D:
            raise ValueError(f"expected {D} coordinate arrays, got {len(points)}")
        cols = [jnp.asarray(p, dtype=real_dtype).reshape(-1) for p in points]
        n0 = cols[0].shape[0]
        if any(c.shape[0] != n0 for c in cols):
            raise ValueError("coordinate arrays must have equal lengths")
        return jnp.stack(cols, axis=0)
    arr = jnp.asarray(points, dtype=real_dtype)
    if arr.ndim == 1:
        if D != 1:
            raise ValueError(f"1-D point array given for a {D}-D plan")
        return arr[None, :]
    if arr.ndim == 2:
        if arr.shape[0] == D:  # (D, Np) matrix, reference-style layout
            return arr
        if arr.shape[1] == D:
            return arr.T
        raise ValueError(f"point array shape {arr.shape} incompatible with D={D}")
    raise ValueError(f"point array must be 1- or 2-dimensional, got {arr.ndim}")


def fold_points(x: jnp.ndarray, point_transform: Callable = _identity) -> jnp.ndarray:
    """Apply the optional convention transform, then fold onto [0, 2pi)
    (reference: to_unit_cell, src/blocking/blocking.jl:26-33 — branchless)."""
    if point_transform is not _identity:
        x = point_transform(x)
    L = x.dtype.type(TWO_PI)
    # Non-finite coordinates propagate as NaN (mod(inf) = mod(nan) = nan),
    # matching the reference's to_unit_cell semantics: invalid input points
    # surface as NaN in the output rather than silently folding to 0.
    return jnp.mod(x, L)


# 'auto' value_permute crossover: below this Np the ~7 ns/index gather beats
# the payload sort (plus the extra inverse-position sort in set_points).
_SORT_PERMUTE_MIN_NP = 2_000_000


@jax.jit
def _pack_points_jit(plan: Plan, pts: jnp.ndarray):
    """Packed-layout point preparation: one multi-operand sort carrying the
    fraction/index payload (blocking.packed_layout); no slot expansion and
    no gathers.  ``pts`` are transformed but NOT folded (folding is the
    mod-N built into the high-accuracy cell split)."""
    from .blocking import packed_layout

    window = None
    window_y = None
    if plan.window_rows is not None:
        window = (plan.m, plan.window_rows, plan.padded_dims[0], plan.window_align)
        if plan.window_rows_y is not None:
            window_y = (plan.window_rows_y, plan.padded_dims[1])
    out_pl = packed_layout(
        plan.kernel_data, plan.block_dims, pts, plan.batch_size, window=window,
        window_y=window_y, shifted=plan.row_shifted,
        extra_lanes=(plan.dma_super_eff - 1) * plan.batch_size,
    )
    pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, key_u = out_pl
    # Pad the lane extent for the super-batch DMA overhang: a block's last
    # descriptor may read up to dma_super*P - 1 lanes past its final batch
    # (the kernels skip the excess sub-batches; the padding is never
    # computed on).  perm padding repeats index 0 so the per-exec value
    # gather stays in bounds.
    np_ = pts.shape[1]
    sort_key = None
    if plan.value_permute == "sort" or (
        plan.value_permute == "auto" and np_ >= _SORT_PERMUTE_MIN_NP
    ):
        # Exec-time values permute into sorted order via ONE stable payload
        # sort keyed by the unsorted bin key (identical order to the points
        # sort; cheaper than the ~7 ns/index gather at large Np).  The key
        # already exists — no extra sort in set_points.
        sort_key = key_u[:np_]
    return pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, sort_key


@jax.jit
def _pack_points_ds_jit(plan: Plan, pts_h: jnp.ndarray, pts_l: jnp.ndarray):
    """Extended-precision packed-layout preparation: double-single points
    (two (D, Np) f32 arrays) ride the ONE multi-operand sort with the lo
    fractions as extra payload rows (blocking.packed_layout points_lo)."""
    from .blocking import packed_layout

    out_pl = packed_layout(
        plan.kernel_data, plan.block_dims, pts_h, plan.batch_size,
        points_lo=pts_l,
        extra_lanes=(plan.dma_super_eff - 1) * plan.batch_size,
    )
    pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, key_u = out_pl
    np_ = pts_h.shape[1]
    sort_key = None
    if plan.value_permute == "sort" or (
        plan.value_permute == "auto" and np_ >= _SORT_PERMUTE_MIN_NP
    ):
        sort_key = key_u[:np_]
    return pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, sort_key


def _canonicalise_points_host(points, D: int) -> np.ndarray:
    """Host-side (numpy, float64) twin of _canonicalise_points for ds plans:
    f64 device arrays do not exist on TPU, so the f64 -> (hi, lo) split
    happens on the host."""
    if isinstance(points, (tuple, list)):
        if len(points) != D:
            raise ValueError(f"expected {D} coordinate arrays, got {len(points)}")
        cols = [np.asarray(p, dtype=np.float64).reshape(-1) for p in points]
        n0 = cols[0].shape[0]
        if any(c.shape[0] != n0 for c in cols):
            raise ValueError("coordinate arrays must have equal lengths")
        return np.stack(cols, axis=0)
    arr = np.asarray(points, dtype=np.float64)
    if arr.ndim == 1:
        if D != 1:
            raise ValueError(f"1-D point array given for a {D}-D plan")
        return arr[None, :]
    if arr.ndim == 2:
        if arr.shape[0] == D:
            return arr
        if arr.shape[1] == D:
            return arr.T
        raise ValueError(f"point array shape {arr.shape} incompatible with D={D}")
    raise ValueError(f"point array must be 1- or 2-dimensional, got {arr.ndim}")


@jax.jit
def _sort_points_jit(plan: Plan, pts: jnp.ndarray):
    """Blocked-path point preparation.  ``pts`` are transformed but NOT
    folded: folding is the mod-N built into the high-accuracy cell split
    (windows.point_to_cell_split).  The slot-aligned coordinate array
    carries 2D rows — per-dim integer cells (as exact floats) followed by
    per-dim in-cell fractions — which is what the Pallas kernels consume."""
    import numpy as _np

    from .blocking import (
        block_ids_from_cells,
        cells_and_fracs,
        gather_slots,
        num_blocks,
        slot_layout,
    )

    cells, fracs = cells_and_fracs(plan.kernel_data, pts)
    bid = block_ids_from_cells(cells, plan.kernel_data, plan.block_dims)
    nblocks = int(_np.prod(num_blocks(plan.shape_over, plan.block_dims)))
    # Sub-sort within blocks by the dim-0 cell so each batch spans a narrow
    # x-window; window = per-batch 8-aligned accumulator row starts for the
    # kernels' windowed path (plan.window_rows rows instead of pd0).
    window = None
    window_y = None
    sub_lx = None
    sub_ly = None
    B0 = plan.block_dims[0]
    B1 = plan.block_dims[1] if plan.ndim >= 2 else 1
    if plan.window_rows is not None:
        window = (plan.m, plan.window_rows, plan.padded_dims[0], plan.window_align)
        sub_lx = cells[0] % jnp.int32(B0)
        if plan.window_rows_y is not None:
            window_y = (plan.window_rows_y, plan.padded_dims[1])
            sub_ly = cells[1] % jnp.int32(B1)
    out = slot_layout(
        bid.astype(jnp.int32), nblocks, plan.batch_size,
        sub_lx=sub_lx, sub_range=B0 if sub_lx is not None else 1,
        window=window,
        sub_ly=sub_ly, sub_range_y=B1 if sub_ly is not None else 1,
        window_y=window_y, shifted=plan.row_shifted,
    )
    if window_y is not None:
        s2p, valid, point_slots, batch_starts, batch_r0, batch_r1 = out
    else:
        (s2p, valid, point_slots, batch_starts, batch_r0), batch_r1 = out, None
    comb = jnp.concatenate([cells.astype(plan.real_dtype), fracs], axis=0)
    # Rows padded to the sublane granule for the kernels' DMA slices;
    # padding slots duplicate point 0, which is harmless because their
    # *values* are masked to zero.
    DP = -(-(2 * plan.ndim) // 8) * 8
    pts_slotted = gather_slots(comb, s2p, valid, rows=DP, mask=False)
    return pts_slotted, s2p, valid, point_slots, batch_starts, batch_r0, batch_r1


@jax.jit
def _spatial_sort_jit(plan: Plan, pts_f: jnp.ndarray):
    """Cell-major sort permutation (and its inverse) for the reference path."""
    from .blocking import cells_and_fracs

    cells, _ = cells_and_fracs(plan.kernel_data, pts_f)
    lin = cells[0]
    for d in range(1, plan.ndim):
        lin = lin * plan.kernel_data[d].n + cells[d]
    np_ = pts_f.shape[1]
    iota = jnp.arange(np_, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(lin, iota)
    _, perm_inv = jax.lax.sort_key_val(perm, iota)
    return perm, perm_inv


def set_points(plan: Plan, points) -> Plan:
    """Return a new plan with the non-uniform points set (folded; bin-sorted
    when the blocked method is active)."""
    if plan.ds:
        from .ops.ds import split_array_np

        pts64 = _canonicalise_points_host(points, plan.ndim)
        if plan.point_transform is not _identity:
            pts64 = np.asarray(plan.point_transform(pts64), dtype=np.float64)
        ph, plo = split_array_np(pts64)
        ph_d, plo_d = jnp.asarray(ph), jnp.asarray(plo)
        if plan.timer is not None:
            with plan.timer.section("set_points"):
                out = _pack_points_ds_jit(plan, ph_d, plo_d)
                plan.timer.sync(out)
        else:
            out = _pack_points_ds_jit(plan, ph_d, plo_d)
        pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, sinv = out
        pts_folded = jnp.asarray(
            np.mod(pts64, TWO_PI).astype(np.float32)
        )  # diagnostics / num_points only: the kernels use the ds rows
        return dataclasses.replace(
            plan,
            points=pts_folded,
            points_packed=pts_rows,
            pstarts=pstarts,
            sort_perm=perm,
            sort_key=sinv,
            block_starts=batch_starts,
            batch_r0=batch_r0,
            batch_r1=batch_r1,
            num_points_static=pts64.shape[1],
            points_slotted=None,
            slot_to_point=None,
            slot_valid=None,
            point_slots=None,
            point_perm=None,
            point_perm_inv=None,
        )
    pts = _canonicalise_points(points, plan.ndim, plan.real_dtype)
    if plan.spread_method == "blocked" and plan.layout == "packed":
        pts_t = pts if plan.point_transform is _identity else plan.point_transform(pts)
        np_ = pts.shape[1]
        if plan.timer is not None:
            with plan.timer.section("set_points"):
                out = _pack_points_jit(plan, pts_t)
                plan.timer.sync(out)
        else:
            out = _pack_points_jit(plan, pts_t)
        pts_rows, pstarts, batch_starts, batch_r0, batch_r1, perm, sinv = out
        if np_ > 33_554_432:
            # plan.points is diagnostics-only on the packed path (the
            # kernels read the packed rows); at rho=10 scale the folded
            # copy is 2 GB of dead HBM — keep a non-None empty marker
            # (num_points_static carries the count).
            pts = pts[:, :0]
        else:
            pts = fold_points(pts, plan.point_transform)
        # Low-density diagnostic (reference warns on degenerate shared-memory
        # geometry, src/gpu_common.jl:66-77): expected batch quantisation
        # overhead, estimated statically (each non-empty block wastes ~P/2
        # lanes on average).
        nblocks = 1
        for n_over, b in zip(plan.shape_over, plan.block_dims):
            nblocks *= n_over // b
        if np_ > 0:
            waste = (np_ + 0.5 * min(nblocks, np_) * plan.batch_size) / np_
            wasted = 0.5 * min(nblocks, np_) * plan.batch_size
            total_over = 1
            for n_over in plan.shape_over:
                total_over *= n_over
            # Only warn when the padded-slot work rivals the grid-sized
            # stages: at low density the ratio is necessarily large but the
            # absolute cost is noise next to the O(N^D) DFT/merge work.
            if waste > 2.0 and wasted > 0.02 * total_over:
                warnings.warn(
                    f"expected batch padding waste is ~{waste:.1f}x (Np="
                    f"{np_}, block_dims={plan.block_dims}, batch="
                    f"{plan.batch_size}); point density is low for this "
                    "blocked geometry — pass np_hint to PlanNUFFT so the "
                    "geometry search can coarsen the blocks.",
                    stacklevel=2,
                )
        return dataclasses.replace(
            plan,
            points=pts,
            points_packed=pts_rows,
            pstarts=pstarts,
            sort_perm=perm,
            sort_key=sinv,
            block_starts=batch_starts,
            batch_r0=batch_r0,
            batch_r1=batch_r1,
            num_points_static=np_,
            points_slotted=None,
            slot_to_point=None,
            slot_valid=None,
            point_slots=None,
            point_perm=None,
            point_perm_inv=None,
        )
    if plan.spread_method == "blocked":
        # Transform but do NOT fold: the high-accuracy cell split folds via
        # its mod-N (folding in f32 first would reintroduce the 2pi*2^-24
        # coordinate noise the split exists to avoid).
        pts_t = pts if plan.point_transform is _identity else plan.point_transform(pts)
        np_ = pts.shape[1]
        if plan.timer is not None:
            with plan.timer.section("set_points"):
                out = _sort_points_jit(plan, pts_t)
                plan.timer.sync(out)
        else:
            out = _sort_points_jit(plan, pts_t)
        pts = fold_points(pts, plan.point_transform)
        pts_slotted, s2p, valid, slots, batch_starts, batch_r0, batch_r1 = out
        # Geometry diagnostic (reference warns on degenerate shared-memory
        # geometry, src/gpu_common.jl:66-77): slot padding waste is known
        # statically here because nslots is a static shape.
        nslots = pts_slotted.shape[1]
        total_over = 1
        for n_over in plan.shape_over:
            total_over *= n_over
        if (
            np_ > 0
            and nslots / np_ > 2.0
            and nslots - np_ > 0.02 * total_over  # see the packed-path note
        ):
            warnings.warn(
                f"slot padding waste is {nslots / np_:.1f}x (Np={np_}, "
                f"nslots={nslots}, block_dims={plan.block_dims}, batch="
                f"{plan.batch_size}); point density is low for this blocked "
                "geometry — pass np_hint to PlanNUFFT so the geometry "
                "search can coarsen the blocks.",
                stacklevel=2,
            )
        return dataclasses.replace(
            plan,
            points=pts,
            points_slotted=pts_slotted,
            slot_to_point=s2p,
            slot_valid=valid,
            point_slots=slots,
            block_starts=batch_starts,
            batch_r0=batch_r0,
            batch_r1=batch_r1,
            sort_key=None,
            num_points_static=np_,
            point_perm=None,  # blocked path always sorts physically
            point_perm_inv=None,
        )
    pts_f = fold_points(pts, plan.point_transform)
    perm = perm_inv = None
    if plan.sort_points:
        # Cell-major spatial sort for scatter/gather locality on the
        # reference path (reference: src/blocking/gpu.jl:130-139 physically
        # permutes point data when sort_points is on).  Values are permuted
        # at exec time; type-2 results are un-permuted on output.
        perm, perm_inv = _spatial_sort_jit(plan, pts_f)
        pts_f = jnp.take(pts_f, perm, axis=1)
    return dataclasses.replace(
        plan,
        points=pts_f,
        point_perm=perm,
        point_perm_inv=perm_inv,
        points_slotted=None,
        slot_to_point=None,
        slot_valid=None,
        point_slots=None,
        block_starts=None,
        num_points_static=None,
    )
