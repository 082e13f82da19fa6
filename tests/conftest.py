"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run identically with or without TPU hardware; multi-chip sharding
tests use XLA's host-platform device virtualization.
"""

import os

# NOTE: jax may already be imported by site customization (TPU tunnel
# plugins); forcing the platform through jax.config still works as long as
# no backend has been initialized yet, which is guaranteed at conftest
# import time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
