"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path
(mesh + shard_map halo exchange) is exercised without TPU hardware, and in
float64 so numerics can be validated at the reference's (Julia Float64)
tolerances. Must run before jax initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var is not honored;
# the config update is, so use that to pin tests to (virtual 8-device) CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from oceananigans_tpu.config import config  # noqa: E402

config.float_type = "float64"

import pytest  # noqa: E402


@pytest.fixture
def float32_defaults():
    config.float_type = "float32"
    yield
    config.float_type = "float64"
