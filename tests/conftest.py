"""Test harness: force an 8-virtual-device CPU platform before jax init.

Multi-chip sharding logic is validated on a simulated mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), something the reference
never had (SURVEY.md §4). All numerics tests run fp32 on CPU.

NOTE: the container's sitecustomize pins JAX_PLATFORMS=axon (real TPU);
``jax.config.update('jax_platforms', ...)`` before first backend use is the
reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
