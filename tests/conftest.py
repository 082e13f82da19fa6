"""Test configuration: force an 8-device virtual CPU mesh, or — when
ISOKANN_TPU_LANE=1 — run the `-m tpu` hardware lane on the real chip.

Default lane (CPU): tests must run identically with or without TPU
hardware; multi-chip sharding tests use XLA's host-platform device
virtualization.  TPU-marked tests are skipped.

TPU lane: `ISOKANN_TPU_LANE=1 python -m pytest tests -m tpu -q` runs the
hardware subset (kernel-vs-XLA parity, NVE drift, sweep guards, fused-run
smoke) in ONE process on the real chip (the backend is single-tenant —
never run two TPU processes at once).  The marker filter is forced so the
CPU suite can't accidentally run on the chip.
"""

import os

TPU_LANE = os.environ.get("ISOKANN_TPU_LANE") == "1"

if not TPU_LANE:
    # NOTE: jax may already be imported by site customization (TPU tunnel
    # plugins); forcing the platform through jax.config still works as long
    # as no backend has been initialized yet, which is guaranteed at
    # conftest import time.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not TPU_LANE:
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + str(jax.devices()))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


FULL_SUITE = os.environ.get("ISOKANN_FULL_SUITE") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: hardware lane — runs only under ISOKANN_TPU_LANE=1 on a "
        "real TPU (one process at a time)")
    config.addinivalue_line(
        "markers",
        "slow: expensive golden re-derivations / campaign-artifact "
        "checks — excluded from the default gate; run the FULL suite "
        "with ISOKANN_FULL_SUITE=1 (nightly tier) or select them with "
        "-m slow")
    if TPU_LANE and (config.option.markexpr or "") != "tpu":
        # never let the full CPU suite loose on the single-tenant chip
        # (exact match: substring checks would accept "not tpu")
        config.option.markexpr = "tpu"


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip = pytest.mark.skip(reason="TPU hardware lane (ISOKANN_TPU_LANE=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
    # two-tier gate: `pytest tests/` = fast default (~<10 min); slow tier
    # runs when explicitly selected (-m ...) or ISOKANN_FULL_SUITE=1
    if FULL_SUITE or config.option.markexpr:
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier (ISOKANN_FULL_SUITE=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
