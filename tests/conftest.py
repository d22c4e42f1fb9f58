"""Test configuration.

Tests run on CPU with 8 virtual devices (for the multi-chip sharding tests)
and float64 enabled (needed by the accuracy sweeps, which go down to ~1e-12
relative error — the analogue of the reference's Float64 test budgets).

The env vars must be set before JAX is first imported.
"""

import os

# NUFFT_TPU_TESTS=1 runs the opt-in on-device job (tests/test_tpu_device.py)
# on the real TPU: leave JAX_PLATFORMS alone and keep x64 off (TPU f64 is
# emulated; the device tests certify the f32 compiled kernels).
_ON_DEVICE = os.environ.get("NUFFT_TPU_TESTS") == "1"

if not _ON_DEVICE:
    # The harness environment may pin JAX_PLATFORMS to the TPU tunnel; CI
    # tests must run on the host CPU, so force it.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
