"""Unit tests for the double-single (ds) arithmetic layer (ops/ds.py).

The ds layer is how the TPU runs the high-accuracy regime the reference
covers with native Float64 (reference: test/accuracy.jl:7-27): (hi, lo)
f32 pairs carrying ~48 significand bits, contracted on the MXU via int8
limb cascades with exact int32 accumulation.  These tests check every
primitive against float64 ground truth on the CPU backend (x64 enabled in
conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonuniformffts_tpu.ops import ds


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _to_f64(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def test_split_array_roundtrip(rng):
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-20, 20, 1000))
    h, l = ds.split_array_np(x)
    # An f64 needs up to 53 bits; (f32 hi, f32 lo) carries ~48 — the
    # roundtrip is accurate to ~2^-48 relative, not exact.
    assert np.max(np.abs(_to_f64(h, l) - x) / np.abs(x)) < 2.0 ** -47
    assert np.all(np.abs(l) <= np.spacing(np.abs(h).astype(np.float32)))


def test_two_sum_two_prod_exact(rng):
    a = jnp.asarray(rng.standard_normal(512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512) * 1e-3, jnp.float32)
    s, e = ds.two_sum(a, b)
    assert np.all(
        np.asarray(s, np.float64) + np.asarray(e, np.float64)
        == np.asarray(a, np.float64) + np.asarray(b, np.float64)
    )
    p, e = ds.two_prod(a, b)
    assert np.all(
        np.asarray(p, np.float64) + np.asarray(e, np.float64)
        == np.asarray(a, np.float64) * np.asarray(b, np.float64)
    )


def test_ds_horner_matches_f64(rng):
    # Tap-major coefficient stack (2M, ncoef) with f64 solve -> ds pairs.
    two_m, ncoef, P = 8, 10, 128
    cs64 = rng.standard_normal((two_m, ncoef))
    z64 = rng.uniform(-1, 1, (1, P))
    ch, cl = ds.split_array_np(cs64)
    zh, zl = ds.split_array_np(z64)
    vh, vl = ds.ds_horner(
        jnp.asarray(ch), jnp.asarray(cl), jnp.asarray(zh), jnp.asarray(zl)
    )
    ref = np.zeros((two_m, P))
    for q in range(ncoef - 1, -1, -1):
        ref = ref * z64 + cs64[:, q : q + 1]
    err = np.abs(_to_f64(vh, vl) - ref) / np.maximum(np.abs(ref), 1e-30)
    assert err.max() < 1e-12


@pytest.mark.parametrize("nl,tol", [(6, 1e-10), (7, 1e-12)])
def test_ds_fxp_dot_general_vs_f64(rng, nl, tol):
    M, K, N = 48, 160, 72
    # 7+ orders of magnitude of elementwise dynamic range on both sides.
    A = rng.standard_normal((M, K)) * np.exp(rng.uniform(-8, 8, (M, K)))
    B = rng.standard_normal((K, N)) * np.exp(rng.uniform(-8, 8, (K, N)))
    ref = A @ B
    a = tuple(jnp.asarray(x) for x in ds.split_array_np(A))
    b = tuple(jnp.asarray(x) for x in ds.split_array_np(B))
    hi, lo = ds.ds_fxp_dot_general(a, b, ((1,), (0,)), nl=nl)
    err = np.linalg.norm(_to_f64(hi, lo) - ref) / np.linalg.norm(ref)
    assert err < tol
    # f32 inputs alone floor near 2^-24; the ds path must beat it by far.
    f32 = np.asarray(a[0], np.float64) @ np.asarray(b[0], np.float64)
    assert np.linalg.norm(f32 - ref) / np.linalg.norm(ref) > 1e-9


def test_ds_fxp_dot_general_multidim(rng):
    # Contraction over a middle dim pair, as the blockform DFT uses it.
    A = rng.standard_normal((2, 4, 8, 5))
    B = rng.standard_normal((4, 8, 9))
    ref = np.einsum("cabn,abk->cnk", A, B)
    a = tuple(jnp.asarray(x) for x in ds.split_array_np(A))
    b = tuple(jnp.asarray(x) for x in ds.split_array_np(B))
    hi, lo = ds.ds_fxp_dot_general(a, b, ((1, 2), (0, 1)), nl=6)
    got = np.moveaxis(_to_f64(hi, lo), -1, -1)  # dims: (2, 5, 9) already
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 1e-11


def test_ds_fxp_dot_plain_f32_inputs(rng):
    # lo=None inputs: still exact accumulation of the f32 contents.
    A = rng.standard_normal((16, 512)).astype(np.float32)
    B = rng.standard_normal((512, 24)).astype(np.float32)
    ref = A.astype(np.float64) @ B.astype(np.float64)
    hi, lo = ds.ds_fxp_dot_general(
        (jnp.asarray(A), None), (jnp.asarray(B), None), ((1,), (0,)), nl=6
    )
    err = np.linalg.norm(_to_f64(hi, lo) - ref) / np.linalg.norm(ref)
    assert err < 1e-10


def test_point_to_cell_split_ds(rng):
    from nonuniformffts_tpu.ops.windows import point_to_cell_split_ds

    n = 384
    x64 = rng.uniform(0, 2 * np.pi, 4096)
    x64 = np.concatenate([x64, [0.0, np.nextafter(2 * np.pi, 0), np.pi]])
    xh, xl = ds.split_array_np(x64)
    c, Xh, Xl = point_to_cell_split_ds(jnp.asarray(xh), jnp.asarray(xl), n)
    r = x64 * n / (2 * np.pi)
    c_ref = np.floor(r).astype(np.int64) % n
    frac_ref = r - np.floor(r)
    c_np = np.asarray(c)
    X = _to_f64(Xh, Xl)
    # Accept the boundary-crossing convention: cell may differ by one where
    # the fraction is within an ulp of 0/1; check the reconstructed
    # coordinate instead (what the transform actually consumes).
    recon = (c_np + X) % n
    err = np.abs(recon - r % n)
    err = np.minimum(err, n - err)  # periodic distance
    assert err.max() < 2e-11  # ~2^-46 * n


# ---------------------------------------------------------------------------
# End-to-end extended-precision pipeline (interpret mode)
# ---------------------------------------------------------------------------


def _roundtrip_ds(shape, m, sigma, Np, rng, **kw):
    import nonuniformffts_tpu as nufft

    pts = rng.uniform(0, 2 * np.pi, (len(shape), Np))
    v = rng.standard_normal((1, Np)) + 1j * rng.standard_normal((1, Np))
    ref = nufft.PlanNUFFT(np.complex128, shape, m=m, sigma=sigma)
    ref = nufft.set_points(ref, pts)
    u_ref = np.asarray(nufft.exec_type1(ref, v))
    v2_ref = np.asarray(nufft.exec_type2(ref, u_ref))
    dsp = nufft.PlanNUFFT(
        np.complex128, shape, m=m, sigma=sigma, precision="double",
        spread_method="blocked", interpret=True, np_hint=Np, **kw,
    )
    assert dsp.ds
    dsp = nufft.set_points(dsp, pts)
    u_ds = nufft.exec_type1(dsp, v)
    v2_ds = nufft.exec_type2(dsp, np.asarray(u_ds, np.complex128))
    e1 = np.linalg.norm(u_ds - u_ref) / np.linalg.norm(u_ref)
    e2 = np.linalg.norm(v2_ds - v2_ref) / np.linalg.norm(v2_ref)
    return e1, e2


def test_ds_pipeline_matches_f64_reference_3d(rng):
    """The extended-precision blocked pipeline (complex128 +
    precision='double') must match the f64 reference path to ~1e-11 — four
    orders below the f32 pipeline's ~2e-7 device floor (docs/accuracy.md).
    Reference bar: test/accuracy.jl certifies ~4e-14 with native f64; the
    (hi, lo) representation carries ~48 bits, so ~1e-11 end-to-end."""
    e1, e2 = _roundtrip_ds((32, 32, 32), 8, 2.0, 3000, rng)
    assert e1 < 5e-11, e1
    assert e2 < 5e-11, e2


def test_ds_pipeline_2d_and_nl7(rng):
    e1, e2 = _roundtrip_ds((48, 32), 6, 2.0, 2000, rng)
    assert e1 < 5e-11 and e2 < 5e-11, (e1, e2)


def test_ds_pipeline_ntransforms(rng):
    import nonuniformffts_tpu as nufft

    shape, Np, C = (24, 24, 24), 1500, 3
    pts = rng.uniform(0, 2 * np.pi, (3, Np))
    v = rng.standard_normal((C, Np)) + 1j * rng.standard_normal((C, Np))
    ref = nufft.set_points(
        nufft.PlanNUFFT(np.complex128, shape, m=6, sigma=2.0, ntransforms=C),
        pts,
    )
    u_ref = np.asarray(nufft.exec_type1(ref, v))
    dsp = nufft.set_points(
        nufft.PlanNUFFT(
            np.complex128, shape, m=6, sigma=2.0, ntransforms=C,
            precision="double", spread_method="blocked", interpret=True,
            np_hint=Np,
        ),
        pts,
    )
    u_ds = nufft.exec_type1(dsp, v)
    err = np.linalg.norm(u_ds - u_ref) / np.linalg.norm(u_ref)
    assert err < 5e-11, err


def _roundtrip_ds_real(shape, m, sigma, Np, rng, C=1, **kw):
    """float64 (real-data) ds pipeline vs the f64 reference path."""
    import nonuniformffts_tpu as nufft

    pts = rng.uniform(0, 2 * np.pi, (len(shape), Np))
    v = rng.standard_normal((C, Np))
    kwc = {"ntransforms": C} if C > 1 else {}
    ref = nufft.set_points(
        nufft.PlanNUFFT(np.float64, shape, m=m, sigma=sigma, **kwc), pts
    )
    u_ref = np.asarray(nufft.exec_type1(ref, v if C > 1 else v[0]))
    v2_ref = np.asarray(nufft.exec_type2(ref, u_ref))
    dsp = nufft.PlanNUFFT(
        np.float64, shape, m=m, sigma=sigma, precision="double",
        spread_method="blocked", interpret=True, np_hint=Np, **kwc, **kw,
    )
    assert dsp.ds and dsp.is_real
    dsp = nufft.set_points(dsp, pts)
    u_ds = nufft.exec_type1(dsp, v if C > 1 else v[0])
    v2_ds = nufft.exec_type2(dsp, np.asarray(u_ds, np.complex128))
    e1 = np.linalg.norm(u_ds - u_ref) / np.linalg.norm(u_ref)
    e2 = np.linalg.norm(v2_ds - v2_ref) / np.linalg.norm(v2_ref)
    return e1, e2


def test_ds_real_pipeline_3d(rng):
    """float64 REAL-data ds plans — the extended-precision twin of the
    reference's flagship Float64 r2c transforms (src/plan.jl:3-16
    RealNUFFTData; Float64 benchmark .dat rows) — must match the f64
    reference path to the ds representation floor."""
    e1, e2 = _roundtrip_ds_real((32, 32, 32), 8, 2.0, 3000, rng)
    assert e1 < 5e-11, e1
    assert e2 < 5e-11, e2


def test_ds_real_pipeline_2d_ntransforms(rng):
    e1, e2 = _roundtrip_ds_real((48, 32), 6, 2.0, 2000, rng, C=2)
    assert e1 < 5e-11 and e2 < 5e-11, (e1, e2)


def test_ds_plan_validation():
    import nonuniformffts_tpu as nufft
    from nonuniformffts_tpu.ops.windows import Direct

    with pytest.raises(ValueError, match="FastApproximation"):
        nufft.PlanNUFFT(
            np.complex128, (32, 32), precision="double",
            spread_method="blocked", kernel_evalmode=Direct(),
            interpret=True,
        )
    with pytest.raises(ValueError, match="pruned"):
        nufft.PlanNUFFT(
            np.complex128, (32, 32), precision="double",
            spread_method="blocked", fft_method="xla", interpret=True,
        )
