"""Test config: run on the CPU backend with 8 virtual devices so sharding
tests exercise multi-chip paths without TPU hardware (SURVEY §4).

Note: the environment's sitecustomize registers a TPU PJRT plugin and pins
`JAX_PLATFORMS`; backends initialise lazily, so forcing the platform via
`jax.config` here (before any backend use) still wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite is compile-bound (single-core box: ~18 min cold, dominated by
# XLA CPU compiles of many engine variants). The persistent compilation
# cache makes warm reruns skip every unchanged compile (~4x faster) —
# exactly the "keep the suite being run" goal of CI taming.
_cache_dir = os.environ.get("TENDRILS_TEST_CACHE",
                            "/tmp/tendrils_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
