"""Test bootstrap: force an 8-virtual-device CPU platform before JAX loads.

All tests run on CPU so they are hermetic; sharding tests exercise a real
8-device mesh via --xla_force_host_platform_device_count.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
