"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; DP semantics (batch sharding, grad
all-reduce) are tested on a fake 8-device host platform, per SURVEY.md §4.
Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — jax.config.update is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# XLA CPU compiles of the big fused image transforms are slow; cache them
# across test runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
