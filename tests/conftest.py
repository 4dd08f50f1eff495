"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is unavailable in CI; DP semantics (batch sharding, grad
all-reduce) are tested on a fake 8-device host platform, per SURVEY.md §4.
Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — jax.config.update is required.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")  # torch OpenMP vs XLA threadpool
# Zero-egress image: hub lookups (e.g. BertTokenizer.from_pretrained in the
# token-ETL test) otherwise hang ~3 min in connect timeouts before skipping.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in-process collectives CHECK-abort ("Termination timeout ... Exiting
# to ensure a consistent program state", rendezvous.cc) if any of the 8 device
# threads fails to reach an all-reduce within 40 s. On this 1-core VM a device
# thread can be starved that long (LLVM compiles hog the core), which aborted
# the suite intermittently; give genuine starvation room to resolve. (True
# deadlock — eager collectives from independent chains exhausting the execute
# pool — is fixed at the source: create_train_state inits single-device.)
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=300"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: no persistent compilation cache here — XLA:CPU AOT cache entries have
# machine-feature mismatches in this VM (cpu_aot_loader warns "could lead to
# SIGILL") and intermittently SIGABRT the test process when loaded.
