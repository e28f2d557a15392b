"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4: fake-mesh
tests via --xla_force_host_platform_device_count).

Note: the axon TPU plugin ignores the JAX_PLATFORMS *environment variable*,
so the CPU backend must be forced via jax.config before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True)
def _restore_x64():
    """parity.record/compare force jax_enable_x64 process-wide (by
    design, for the CLI); restore it after every test so f64 doesn't
    leak into the rest of the suite (it broke test_sensor_obs's scan
    carry dtypes when parity tests ran first)."""
    prev = jax.config.jax_enable_x64
    yield
    if jax.config.jax_enable_x64 != prev:
        jax.config.update("jax_enable_x64", prev)
