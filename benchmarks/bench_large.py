"""First on-chip run of the 'large' M3AE config (--m3ae_size large).

The reference defines large/huge encoder configs (m3ae.py:226-268) but only
ever constructs base; --m3ae_size makes them trainable here. Single chip:
--scan_blocks keeps the 24-deep stack's HLO (and compile time) small; batch
is sized to HBM. Usage:
PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_large.py \
    [batch] [size] [remat] [dots] [accumK] [bf16state]

`accumK` (e.g. accum8) turns on --grad_accum K: K scanned microbatches per
update, ~K-fold less activation memory — the alternative/complement to remat
for fitting bigger effective batches on one chip. `bf16state` sets
--opt_dtype bfloat16 (and --accum_dtype bfloat16 when accumulating): bf16
moment buffers + accumulation carry, the state lever for huge+accum.

Chained-protocol timing (donated state threads step N's output into N+1,
one trailing host read — BASELINE.md measurement notes).
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mla_tpu.core.config import MLAConfig  # noqa: E402
from mla_tpu.models.classifiers import M3AEClassifier  # noqa: E402
from mla_tpu.train import optim, steps  # noqa: E402
from mla_tpu.train.state import create_train_state  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = sys.argv[2] if len(sys.argv) > 2 else "large"
    extra = sys.argv[3:]
    remat = "remat" in extra
    accum = 1
    bf16_state = "bf16state" in extra
    # 'dots' = --remat_policy dots: save GEMM/attention outputs, recompute
    # only LN/gelu in the backward (VERDICT r3 #2 scan-tax attack)
    policy = "dots" if "dots" in extra else "full"
    for a in extra:
        if a in ("remat", "bf16state", "dots"):
            continue
        if a.startswith("accum") and a[5:].isdigit():
            accum = int(a[5:])
            continue
        # unknown/typo'd extras must not silently run under a wrong label
        # (same rule as the e2e_ab CLI, commit 36d8c0b)
        raise SystemExit(f"unknown arg {a!r}: expected 'remat', 'dots', "
                         "'bf16state' or 'accumK' (e.g. accum4)")
    rng = np.random.default_rng(0)
    batch = {
        "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
        "padding_mask": jnp.zeros((B, 256), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}
    sd = "bfloat16" if bf16_state else "float32"
    cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                    m3ae_size=size, scan_blocks=True, remat_blocks=remat,
                    remat_policy=policy,
                    grad_accum=accum, batch_size=B, train=True,
                    opt_dtype=sd,
                    accum_dtype=sd if accum > 1 else "float32").validate()
    model = M3AEClassifier(n_classes=101, gs_flag=True, model_type=size,
                           scan_blocks=True, remat_blocks=remat,
                           remat_policy=policy, dtype=jnp.bfloat16)
    spec = optim.make_spec(cfg)
    t0 = time.perf_counter()
    state = create_train_state(model, cfg, batch, spec)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    print(f"init {time.perf_counter()-t0:.1f}s params {n_params/1e6:.0f}M",
          flush=True)

    step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=100),
                   donate_argnums=0)
    t0 = time.perf_counter()
    state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(0),
                    jnp.int32(0))
    _ = float(m["loss"])
    t_compile = time.perf_counter() - t0
    print(f"first step (compile+run) {t_compile:.1f}s", flush=True)

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i + 1),
                        jnp.int32(0))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n

    out = {
        "device": jax.devices()[0].device_kind, "size": size, "batch": B,
        "remat": remat, "remat_policy": policy,
        "grad_accum": accum, "state_dtype": sd,
        "params_m": round(n_params / 1e6, 1),
        "step_ms": round(dt * 1e3, 1),
        "clips_per_sec": round(B / dt, 1),
        "compile_s": round(t_compile, 1)}
    stats = jax.local_devices()[0].memory_stats() or {}
    if stats.get("peak_bytes_in_use"):  # unavailable through the axon relay
        out["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
