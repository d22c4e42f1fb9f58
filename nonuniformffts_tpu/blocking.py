"""Device-side point bin-sorting into spatial blocks.

TPU-native counterpart of the reference's GPU blocking (src/blocking/gpu.jl):
where the reference runs four device kernels (atomic histogram -> prefix sum
-> scatter permutation -> optional point permutation), we compute block ids
from cell indices and use one ``lax.sort_key_val`` plus a scatter-add
histogram — no atomics needed, and the result is a *contiguous* slice of
sorted points per block, which is what lets the Pallas spread/interp kernels
own their output block outright (zero races by construction).

Consistency requirement carried over from the reference
(blocking/gpu.jl:145-160): the block id derives from ``point_to_cell``'s cell
index — the exact same computation the spread/interp kernels use — never from
the block width directly, so a point can never land outside its block's
padded window.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import windows


def _divisors(n: int):
    out = [d for d in range(1, n + 1) if n % d == 0]
    return out


def choose_block_dims(shape_over: Tuple[int, ...], m: int) -> Tuple[int, ...]:
    """Pick per-dimension block sizes.

    Each block dim must divide the oversampled grid size (so the periodic
    overlap-add is a pure roll) and be >= 2M (so halos only touch immediate
    neighbours).  Targets are tuned for the MXU contraction shape: small
    leading dim (it is only sublane-padded), moderate trailing product.
    """
    D = len(shape_over)
    if D == 1:
        targets = (1024,)
    elif D == 2:
        targets = (8, 64)
    else:
        targets = (8, 16, 16)
    dims = []
    for n, t in zip(shape_over, targets):
        lo = min(2 * m, n)
        candidates = [d for d in _divisors(n) if d >= lo]
        if not candidates:
            candidates = [n]
        dims.append(min(candidates, key=lambda d: (abs(d - t), d)))
    return tuple(dims)


def num_blocks(shape_over: Sequence[int], block_dims: Sequence[int]) -> Tuple[int, ...]:
    assert all(n % b == 0 for n, b in zip(shape_over, block_dims))
    return tuple(n // b for n, b in zip(shape_over, block_dims))


def compute_block_ids(kernel_data, block_dims, points: jnp.ndarray) -> jnp.ndarray:
    """Flattened (row-major) block id per point; points (D, Np) folded."""
    D = points.shape[0]
    nb = [kd.n // b for kd, b in zip(kernel_data, block_dims)]
    bid = None
    for d in range(D):
        c, _ = windows.point_to_cell(points[d], kernel_data[d].n)
        b = c // block_dims[d]
        bid = b if bid is None else bid * nb[d] + b
    return bid


def num_slots(np_: int, nblocks: int, batch: int) -> int:
    """Static upper bound on the slotted layout size: every block's segment
    is rounded up to a multiple of the point-batch size."""
    bound = np_ + nblocks * (batch - 1)
    return -(-bound // batch) * batch


def sort_points_into_blocks(plan, points: jnp.ndarray):
    """Bin points into a *slot-aligned* block layout.

    Every block owns a contiguous segment of "slots" whose start is a
    multiple of the point-batch size P, so the Pallas kernels' DMA offsets
    are provably tile-aligned (TPU DMA offsets along the lane dimension must
    be 128-divisible) and no masking is needed: padding slots carry zero
    values/coordinates, which contribute nothing to spreading and whose
    interpolation outputs are never gathered.

    Returns ``(points_slotted, slots, batch_starts)``:

    - ``points_slotted``: (D, Nslots) point coordinates scattered into their
      slots (zeros in padding);
    - ``slots``: (Np,) int32 slot of each original point (for scattering
      values in type-1 and gathering results in type-2 — also serves as the
      un-permutation, reference: interpolation/gpu.jl:196-203);
    - ``batch_starts``: (nblocks + 1,) int32 segment boundaries in units of
      P (the reference's cumulative_npoints_per_block, batch-quantised).
    """
    block_dims = plan.block_dims
    P = plan.batch_size
    bid = compute_block_ids(plan.kernel_data, block_dims, points).astype(jnp.int32)
    np_ = points.shape[1]
    nblocks = int(np.prod(num_blocks(plan.shape_over, block_dims)))
    nslots = num_slots(np_, nblocks, P)

    iota = jnp.arange(np_, dtype=jnp.int32)
    sorted_bid, perm = jax.lax.sort_key_val(bid, iota)

    counts = jnp.zeros(nblocks, dtype=jnp.int32).at[bid].add(1, mode="drop")
    pstarts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    batches = -(-counts // P)  # cdiv
    batch_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(batches, dtype=jnp.int32)]
    )

    rank = iota - jnp.take(pstarts, sorted_bid)
    slot_sorted = jnp.take(batch_starts, sorted_bid) * P + rank
    slots = jnp.zeros(np_, dtype=jnp.int32).at[perm].set(slot_sorted)

    points_slotted = jnp.zeros((points.shape[0], nslots), dtype=points.dtype)
    points_slotted = points_slotted.at[:, slots].set(points)
    return points_slotted, slots, batch_starts
