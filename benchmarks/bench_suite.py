"""Extended benchmark suite: per-config step throughput + host loader rates.

Covers the BASELINE.json config matrix (CREMA-D base Normal / MLA / MLA
dynamic-eval; Food-101-style m3ae; IEMOCAP modal3) on real hardware. Prints a
JSON report. bench.py remains the driver's single-line entrypoint; this is
the engineering view.

Timing protocol: chain N donated steps, force one host read of the final
metrics (block_until_ready is unreliable on the axon relay — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_steps(step, state, batch, n=10, **kw):
    import jax
    import jax.numpy as jnp
    state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(0), jnp.int32(0))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i),
                        jnp.int32(0))
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / n


def bench_config(name, cfg, model, batch, n_data=512):
    import jax
    from mla_tpu.train import optim, steps
    from mla_tpu.train.state import create_train_state
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=n_data)
    step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=100),
                   donate_argnums=0)
    dt = _time_steps(step, state, batch)
    b = int(batch["label"].shape[0])
    return {"config": name, "batch": b, "step_ms": round(dt * 1e3, 2),
            "clips_per_sec": round(b / dt, 1)}


def bench_eval(name, cfg, model, batch):
    import jax
    from mla_tpu.evals.metrics import make_eval_step
    from mla_tpu.train import optim
    from mla_tpu.train.state import create_train_state
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec)
    ev = jax.jit(make_eval_step(model, cfg))
    counts = ev(state.params, state.batch_stats, batch)
    _ = float(jax.tree_util.tree_leaves(counts)[0][0])
    t0 = time.perf_counter()
    for _i in range(10):
        counts = ev(state.params, state.batch_stats, batch)
    _ = float(jax.tree_util.tree_leaves(counts)[0][0])
    dt = (time.perf_counter() - t0) / 10
    b = int(batch["label"].shape[0])
    return {"config": name, "batch": b, "step_ms": round(dt * 1e3, 2),
            "clips_per_sec": round(b / dt, 1)}


def main():
    import jax
    import jax.numpy as jnp
    from mla_tpu.core.config import MLAConfig
    # every config builds through the driver's factory so the suite measures
    # exactly what `python main.py` runs (resolve_pallas_conv, masked_bn,
    # resnet_stages... — hand-built AVClassifier() calls drifted in round 4)
    from mla_tpu.models.classifiers import build_classifier
    rng = np.random.default_rng(0)
    B = 64
    results = []

    def av_batch():
        return {"spec": jnp.asarray(rng.standard_normal((B, 1, 129, 626)),
                                    jnp.float32),
                "image": jnp.asarray(
                    rng.standard_normal((B, 3, 3, 224, 224)), jnp.float32),
                "label": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
                "idx": jnp.arange(B, dtype=jnp.int32),
                "valid": jnp.ones((B,), jnp.float32)}

    # 1. CREMA-D base Normal (joint)
    cfg = MLAConfig(dataset="CREMAD", lorb="base", train=True).validate()
    results.append(bench_config(
        "cremad_base_normal", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), av_batch()))

    # 2. CREMA-D MLA (gs)
    cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                    train=True).validate()
    results.append(bench_config(
        "cremad_mla", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), av_batch()))

    # 3. CREMA-D MLA dynamic eval
    cfgd = cfg.replace(dynamic=True)
    results.append(bench_eval(
        "cremad_mla_dynamic_eval", cfgd,
        build_classifier(cfgd, dtype=jnp.bfloat16), av_batch()))

    # 4. Food-101/MVSA m3ae MLA (base-size encoders, 256 tokens, 256px)
    m3ae_batch = {
        "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
        "padding_mask": jnp.zeros((B, 256), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}
    cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                    train=True).validate()
    results.append(bench_config(
        "food101_m3ae_mla", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), m3ae_batch))

    # 5. IEMOCAP modal3 MLA
    m3_batch = dict(m3ae_batch)
    m3_batch["fbank"] = jnp.asarray(rng.standard_normal((B, 1024, 128)),
                                    jnp.float32)
    m3_batch["label"] = jnp.asarray(rng.integers(0, 4, B), jnp.int32)
    cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True, gs_flag=True,
                    train=True).validate()
    results.append(bench_config(
        "iemocap_modal3_mla", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), m3_batch))

    # 6/7. Food-101 CLIP (precomputed 512-d features — fusion-head only)
    clip_batch = {
        "token_feat": jnp.asarray(rng.standard_normal((B, 512)), jnp.float32),
        "image_feat": jnp.asarray(rng.standard_normal((B, 512)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}
    cfg = MLAConfig(dataset="Food101", clip=True, gs_flag=True,
                    train=True).validate()
    results.append(bench_config(
        "food101_clip_mla", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), clip_batch))
    cfg = MLAConfig(dataset="Food101", clip=True, train=True).validate()
    results.append(bench_config(
        "food101_clip_normal", cfg,
        build_classifier(cfg, dtype=jnp.bfloat16), clip_batch))

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()
