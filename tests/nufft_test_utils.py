"""Shared test helpers: brute-force DFT oracles and error metrics.

Port of the reference's exact-DFT oracle (test/accuracy.jl:83-125): type-1
reference is the literal sum ``uhat(k) = sum_j v_j exp(-i k . x_j)`` over the
output wavenumbers; errors are L2-relative (l2_error, accuracy.jl:83-89).
"""

from __future__ import annotations

import numpy as np


def direct_type1(points, vp, kvecs) -> np.ndarray:
    """Brute-force type-1 NUFFT (vectorised).

    points: (D, Np); vp: (Np,); kvecs: list of D 1-D wavenumber arrays.
    Returns complex array of shape tuple(len(k) for k in kvecs).
    """
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    vp = np.asarray(vp)
    D = points.shape[0]
    mats = [
        np.exp(-1j * np.asarray(kvecs[d], np.float64)[:, None] * points[d][None, :])
        for d in range(D)
    ]
    if D == 1:
        return mats[0] @ vp.astype(complex)
    if D == 2:
        return np.einsum("aj,bj,j->ab", mats[0], mats[1], vp)
    if D == 3:
        return np.einsum("aj,bj,cj,j->abc", mats[0], mats[1], mats[2], vp)
    raise ValueError(D)


def direct_type2(points, uhat, kvecs) -> np.ndarray:
    """Brute-force type-2 NUFFT: v_j = sum_k uhat(k) exp(+i k x_j)."""
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    uhat = np.asarray(uhat)
    D = points.shape[0]
    mats = [
        np.exp(1j * points[d][:, None] * np.asarray(kvecs[d], np.float64)[None, :])
        for d in range(D)
    ]
    if D == 1:
        return mats[0] @ uhat.astype(complex)
    if D == 2:
        return np.einsum("ja,jb,ab->j", mats[0], mats[1], uhat)
    if D == 3:
        return np.einsum("ja,jb,jc,abc->j", mats[0], mats[1], mats[2], uhat)
    raise ValueError(D)


def direct_type2_real(points, uhat, kvecs, last_n: int) -> np.ndarray:
    """Brute-force type-2 for r2c plans: the stored half-spectrum along the
    last axis is expanded with Hermitian weights (interior modes doubled).

    Matches the library's (and the reference's) c2r convention: the Nyquist
    mode of the *last* axis, when present (even N), is implicitly mirrored by
    the c2r FFT, so callers should zero it in test data (the reference does
    the same: test/uniform_points.jl:26).
    """
    klast = np.asarray(kvecs[-1], np.float64)
    w = np.where((klast > 0), 2.0, 1.0)
    weighted = uhat * w
    return direct_type2(points, weighted, kvecs).real


def l2_error(approx, exact) -> float:
    approx = np.asarray(approx)
    exact = np.asarray(exact)
    return float(
        np.linalg.norm((approx - exact).ravel()) / np.linalg.norm(exact.ravel())
    )


def random_values(rng, dtype, shape):
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        return (
            rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        ).astype(dtype)
    return rng.standard_normal(shape).astype(dtype)
