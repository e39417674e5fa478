"""Test bootstrap: force an 8-virtual-device CPU platform.

The environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
(the real TPU), so setting env vars here is too late for the platform
selection — use jax.config.update instead. XLA_FLAGS is still read lazily
at backend init, so the forced host device count works as long as no
backend has been initialized yet.

All tests run on CPU so they are hermetic; sharding tests exercise a real
8-device mesh.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite compiles hundreds of tiny-model
# variants (fused tree / predictive / dpmpp / sharding); caching them makes
# repeat runs bound by test logic instead of XLA CPU compilation
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lb_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert len(jax.devices()) == 8, "CPU virtual device forcing failed"
