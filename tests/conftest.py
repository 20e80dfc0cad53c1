"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Correctness tests are CPU-runnable (no TPU needed); sharding tests use the
8 virtual devices.  Must set flags before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
