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
