"""Error paths (port of test/errors.jl plus inline arg checks)."""

import numpy as np
import pytest

import nonuniformffts_tpu as nufft


def test_grid_too_small_raises():
    # sigma*N < 2M must throw (reference: check_nufft_size, plan.jl:545-556).
    with pytest.raises(ValueError, match="too small"):
        nufft.PlanNUFFT(np.complex128, (4,), m=8, sigma=1.0)


def test_bad_dtype():
    with pytest.raises(TypeError):
        nufft.PlanNUFFT(np.int32, (16,))


def test_points_not_set():
    plan = nufft.PlanNUFFT(np.complex128, (16,))
    with pytest.raises(ValueError, match="points not set"):
        nufft.exec_type1(plan, np.zeros(4, np.complex128))


def test_wrong_point_count(rng):
    plan = nufft.PlanNUFFT(np.complex128, (16,))
    plan = nufft.set_points(plan, rng.uniform(0, 1, 10))
    with pytest.raises(ValueError, match="number of values"):
        nufft.exec_type1(plan, np.zeros(5, np.complex128))


def test_wrong_value_dtype(rng):
    plan = nufft.PlanNUFFT(np.complex128, (16,))
    plan = nufft.set_points(plan, rng.uniform(0, 1, 10))
    with pytest.raises(TypeError, match="dtype"):
        nufft.exec_type1(plan, np.zeros(10, np.complex64))


def test_wrong_uniform_shape(rng):
    plan = nufft.PlanNUFFT(np.complex128, (16, 16))
    plan = nufft.set_points(plan, rng.uniform(0, 1, (2, 10)))
    with pytest.raises(ValueError, match="shape"):
        nufft.exec_type2(plan, np.zeros((16, 8), np.complex128))


def test_wrong_ntransforms(rng):
    plan = nufft.PlanNUFFT(np.complex128, (16,), ntransforms=2)
    plan = nufft.set_points(plan, rng.uniform(0, 1, 10))
    with pytest.raises(ValueError, match="ntransforms"):
        nufft.exec_type1(plan, np.zeros(10, np.complex128))
    with pytest.raises(ValueError, match="ntransforms"):
        nufft.exec_type1(plan, np.zeros((3, 10), np.complex128))


def test_mismatched_coordinate_lengths():
    plan = nufft.PlanNUFFT(np.complex128, (16, 16))
    with pytest.raises(ValueError, match="equal lengths"):
        nufft.set_points(plan, (np.zeros(5), np.zeros(6)))


def test_wrong_dimension_count():
    plan = nufft.PlanNUFFT(np.complex128, (16, 16))
    with pytest.raises(ValueError):
        nufft.set_points(plan, (np.zeros(5),))
    with pytest.raises(ValueError):
        nufft.PlanNUFFT(np.complex128, (8, 8, 8, 8))


def test_window_rows_kwarg_validation():
    """window_rows plan kwarg: 0/None disables, explicit values round up to
    the 8-sublane granule, >= pd0 disables (advisor round-1 findings)."""
    import nonuniformffts_tpu as nufft

    kw = dict(m=4, sigma=1.5, spread_method="blocked", interpret=True)
    p0 = nufft.PlanNUFFT(np.complex64, (64, 64), window_rows=0, **kw)
    assert p0.window_rows is None
    p_none = nufft.PlanNUFFT(np.complex64, (64, 64), window_rows=None, **kw)
    assert p_none.window_rows is None
    p13 = nufft.PlanNUFFT(np.complex64, (64, 64), window_rows=13, **kw)
    assert p13.window_rows in (16, None)  # rounded up (or pd0 too small)
    if p13.window_rows is not None:
        from nonuniformffts_tpu.ops.pallas.common import padded_block_dims

        assert p13.window_rows < padded_block_dims(p13.block_dims, p13.m)[0]


def test_spatial_engine_variant_validation():
    import jax

    from nonuniformffts_tpu.parallel.spatial import SpatialNUFFT

    devs = jax.devices("cpu")[:2]
    mesh = jax.sharding.Mesh(np.array(devs), ("x",))
    # The split engine cannot run from pruned factors (truncation is baked
    # into the matrices and does not interleave with its collective
    # transposes).
    with pytest.raises(ValueError, match="split"):
        SpatialNUFFT(
            np.complex64, (32, 32), mesh=mesh, engine="split",
            fft_variant="pruned", interpret=True,
        )
    # The blockform engine needs the z-form kernels; precision='double'
    # pins the yz form.
    with pytest.raises(ValueError, match="blockform"):
        SpatialNUFFT(
            np.complex64, (32, 32), mesh=mesh, engine="blockform",
            precision="double", interpret=True,
        )
    with pytest.raises(ValueError, match="engine"):
        SpatialNUFFT(np.complex64, (32, 32), mesh=mesh, engine="bogus")
    # fft_variant='pruned' without an engine pin now selects blockform.
    sp = SpatialNUFFT(
        np.complex64, (32, 32), mesh=mesh, fft_variant="pruned",
        interpret=True,
    )
    assert sp.engine == "blockform"
