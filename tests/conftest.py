"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; DP semantics (batch sharding, grad
all-reduce) are tested on a fake 8-device host platform, per SURVEY.md §4.
Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — jax.config.update is required.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # torch OpenMP vs XLA threadpool

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: no persistent compilation cache here — XLA:CPU AOT cache entries have
# machine-feature mismatches in this VM (cpu_aot_loader warns "could lead to
# SIGILL") and intermittently SIGABRT the test process when loaded.
