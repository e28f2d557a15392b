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

# Persistent XLA compilation cache: env/step compiles dominate suite wall
# time (a cold "not slow" run spends ~2/3 of its time compiling the same
# handful of env programs file after file). The cache cuts warm reruns
# several-fold; set JIMINY_TPU_TEST_CACHE=" " (or point it elsewhere) to
# override, or delete the directory to force cold compiles.
_cache = os.environ.get(
    "JIMINY_TPU_TEST_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "jiminy_tpu_xla_tests"),
).strip()
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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
