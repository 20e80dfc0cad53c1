"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Correctness tests are CPU-runnable (no TPU needed); sharding tests use the
8 virtual devices.  The environment's sitecustomize pre-imports jax with the
axon TPU backend selected, so overriding the env var is not enough — we must
update the live config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # "slow": the serving/speculation suites that dominate wall time.
    # NOTHING is skipped by default — the marker exists so developers can
    # iterate with `-m "not slow"` and CI can shard (ci/run_ci.sh runs
    # everything, split across cores when the runner has them).
    config.addinivalue_line(
        "markers", "slow: long-running serving/speculation suite"
    )


import pytest


@pytest.fixture(autouse=True)
def _reset_gq_pack_override():
    """resolve_llm_quant_mode sets group_i8.PACK_OVERRIDE as a side effect
    (residency-driven packing); never let one test's engine build leak the
    packing decision into another's."""
    yield
    from minigpt4_tpu.ops import group_i8

    group_i8.PACK_OVERRIDE = None
