"""Test config: force CPU with 8 virtual devices and enable x64.

This is the TPU-world equivalent of a fake backend for testing pjit sharding
without a chip cluster (SURVEY.md §4): multi-chip tests build a Mesh over the
8 virtual CPU devices.

NOTE: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
env var, so the platform must be forced through jax.config AFTER import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the suite's runtime on this 1-core host is
# dominated by XLA re-compiles of unchanged programs; warm re-runs drop
# several-fold.  Keyed by jaxlib version + flags, so stale hits are not a
# correctness concern.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HLAX_TEST_CACHE", "/tmp/hlax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
