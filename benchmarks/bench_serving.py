"""On-chip smoke + latency for the AOT serving artifact (runtime/export.py).

Exports the m3ae MLA+dynamic eval forward (the deployment config of the
dynamic-eval row in BASELINE.md) at a 1/8/64 batch ladder on the real TPU —
this exercises jax.export serialization of the flat Pallas attention
custom calls (tpu_custom_call), which the CPU test tier can't — reloads it,
checks numerics vs the live jitted graph, and times each rung.

Timing protocol matches bench_suite.bench_eval (10 dispatches, one trailing
host read) for comparability with the dynamic-eval row.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_serving.py [m3ae|av|modal3|large|huge] [bf16|int8|int8_sliced|int8_a8] [rungs=1,16]
(large/huge: scan-blocks M3AE at that size, default ladder (1, 16);
 bf16/int8: --export_dtype weight precision of the artifact;
 int8_sliced: int8 weights but with the stacked scalar-prefetch path forced
 off — measures the round-4 per-layer nn.scan slicing for the A/B ladder;
 rungs=...: override the batch ladder, e.g. rungs=1 to bench one rung
 within the relay's slow-compile window)
"""

import sys

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mla_tpu.core.config import MLAConfig  # noqa: E402
from mla_tpu.evals.metrics import eval_logits  # noqa: E402
from mla_tpu.models.classifiers import AVClassifier, M3AEClassifier  # noqa: E402
from mla_tpu.runtime import export as ex  # noqa: E402
from mla_tpu.train import optim  # noqa: E402
from mla_tpu.train.state import create_train_state  # noqa: E402


def _run_big(which, model, cfg, state, batch, rungs, wdtype="float32"):
    """large/huge flow: direct eval + export while the init weights are on
    device, then FREE them before loading the artifact — two copies of the
    huge fp32 tree (2 x 5.4 GB) plus activations exceed the 16 GB chip."""
    import gc
    B = int(batch["label"].shape[0])
    direct = np.asarray(jax.jit(
        lambda p, bs, b, v: eval_logits(model, cfg, p, bs, b, v)[1])(
            state.params, state.batch_stats, batch,
            jnp.ones(B, jnp.float32)))
    out_dir = f"/tmp/serving_art_{which}_{wdtype}"
    t0 = time.perf_counter()
    ex.export_serving(cfg, model, state, batch, out_dir, batch_sizes=rungs,
                      weights_dtype=wdtype)
    t_export = time.perf_counter() - t0
    feats = {k: np.asarray(batch[k]) for k in ("token", "padding_mask",
                                               "image")}
    state.params = None
    state.batch_stats = None
    batch = None
    gc.collect()

    t0 = time.perf_counter()
    srv = ex.load_serving(out_dir)
    t_load = time.perf_counter() - t0
    got = srv(feats)
    err = float(np.max(np.abs(got["fused"] - direct)))

    rows = []
    for n in rungs:
        sub = {k: v[:n] for k, v in feats.items()}
        padded, _, b = srv.pad_request(sub)
        params, bstats = srv.weights
        dev = jax.device_put(padded)
        call = srv.executable(b)
        out = call(params, bstats, dev)
        _ = float(out["fused"][0, 0])
        t0 = time.perf_counter()
        for _i in range(10):
            out = call(params, bstats, dev)
        _ = float(out["fused"][0, 0])
        dt_dev = (time.perf_counter() - t0) / 10
        rows.append({"batch": n,
                     "device_resident_ms": round(dt_dev * 1e3, 2),
                     "device_resident_clips_per_sec": round(n / dt_dev, 1)})

    print(json.dumps({
        "config": which, "weights_dtype": wdtype,
        "device": jax.devices()[0].device_kind,
        "export_s": round(t_export, 1), "load_s": round(t_load, 1),
        "params_msgpack_mb": round(os.path.getsize(
            os.path.join(out_dir, "params.msgpack")) / 2**20, 1),
        "max_abs_err_vs_live_graph": err, "rungs": rows}, indent=1))


def main():
    argv = [a for a in sys.argv[1:]]
    wdtype = "float32"
    if "bf16" in argv:
        wdtype = "bfloat16"
    if "int8" in argv:
        wdtype = "int8"
    if "int8_a8" in argv:
        wdtype = "int8_a8"
    if "int8_sliced" in argv:
        # same int8 artifact bytes, old weight-read law: per-layer nn.scan
        # slicing (HBM->HBM materialization before each Pallas GEMM)
        wdtype = "int8"
        from mla_tpu.models.m3ae import M3AEEncoder
        M3AEEncoder._blocks_q8_stacked = lambda self: False
    rung_override = None
    for a in list(argv):
        if a.startswith("rungs="):
            rung_override = tuple(int(x) for x in a[6:].split(","))
            argv.remove(a)
    argv = [a for a in argv
            if a not in ("bf16", "int8", "int8_a8", "int8_sliced")]
    unknown = [a for a in argv[1:]]
    if unknown:
        raise SystemExit(f"unknown extra args {unknown}")
    which = argv[0] if argv else "m3ae"
    rng = np.random.default_rng(0)
    B = 64
    rungs = (1, 8, 64)
    if which in ("large", "huge"):
        # the --m3ae_size large/huge deployment artifact (scan-blocks stack)
        B = 16
        rungs = (1, 16)
        if rung_override:
            rungs = rung_override
            B = max(rungs)
        batch = {
            "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
            "padding_mask": jnp.zeros((B, 256), jnp.float32),
            "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
            "idx": jnp.arange(B, dtype=jnp.int32),
            "valid": jnp.ones((B,), jnp.float32)}
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        dynamic=True, m3ae_size=which, scan_blocks=True,
                        train=True).validate()
        model = M3AEClassifier(n_classes=101, gs_flag=True, model_type=which,
                               scan_blocks=True, dtype=jnp.bfloat16)
        # init-only weights: create_train_state would also allocate SGD
        # momentum (another 1x params = 5.4 GB for huge) and OOM the chip
        # next to the artifact's own device-resident copy
        import types
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        state = types.SimpleNamespace(params=variables["params"],
                                      batch_stats=variables.get(
                                          "batch_stats", {}))
        del variables  # the namespace holds the only device refs now, so
        #                _run_big's state.params = None actually frees HBM
        return _run_big(which, model, cfg, state, batch, rungs, wdtype)
    elif which == "m3ae":
        batch = {
            "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
            "padding_mask": jnp.zeros((B, 256), jnp.float32),
            "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
            "idx": jnp.arange(B, dtype=jnp.int32),
            "valid": jnp.ones((B,), jnp.float32)}
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        dynamic=True, train=True).validate()
        model = M3AEClassifier(n_classes=101, gs_flag=True,
                               dtype=jnp.bfloat16)
    elif which == "modal3":
        # IEMOCAP 3-modality (CAV-MAE audio + M3AE image/text, MLA dynamic)
        from mla_tpu.models.classifiers import Modal3Classifier
        batch = {
            "fbank": jnp.asarray(rng.standard_normal((B, 1024, 128)),
                                 jnp.float32),
            "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
            "padding_mask": jnp.zeros((B, 256), jnp.float32),
            "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
            "idx": jnp.arange(B, dtype=jnp.int32),
            "valid": jnp.ones((B,), jnp.float32)}
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        gs_flag=True, dynamic=True, train=True).validate()
        model = Modal3Classifier(n_classes=4, gs_flag=True,
                                 dtype=jnp.bfloat16)
    else:
        # the CREMA-D headline config (ResNet-18 x2, MLA + dynamic fusion)
        batch = {
            "spec": jnp.asarray(rng.standard_normal((B, 1, 129, 626)),
                                jnp.float32),
            "image": jnp.asarray(
                rng.standard_normal((B, 3, 3, 224, 224)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
            "idx": jnp.arange(B, dtype=jnp.int32),
            "valid": jnp.ones((B,), jnp.float32)}
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        dynamic=True, train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, batch, spec=optim.make_spec(cfg))

    out_dir = f"/tmp/serving_art_{which}_{wdtype}"
    t0 = time.perf_counter()
    ex.export_serving(cfg, model, state, batch, out_dir,
                      batch_sizes=rungs, weights_dtype=wdtype)
    t_export = time.perf_counter() - t0

    t0 = time.perf_counter()
    srv = ex.load_serving(out_dir)
    t_load = time.perf_counter() - t0

    feats = {k: np.asarray(batch[k]) for k in srv.feature_names
             if k != "valid"}

    # numerics vs the live jitted graph
    direct = jax.jit(
        lambda p, bs, b, v: eval_logits(model, cfg, p, bs, b, v)[1])(
            state.params, state.batch_stats, batch,
            jnp.ones(B, jnp.float32))
    got = srv(feats)
    err = float(np.max(np.abs(got["fused"] - np.asarray(direct))))

    rows = []
    for n in rungs:
        sub = {k: v[:n] for k, v in feats.items()}
        out = srv(sub)  # warm (compile/load executable)
        _ = float(out["fused"][0, 0])
        t0 = time.perf_counter()
        for _i in range(10):
            out = srv(sub)
        _ = float(out["fused"][0, 0])
        dt = (time.perf_counter() - t0) / 10

        # device-resident path: executable() with pre-placed inputs — the
        # compute number a real TPU host (PCIe, not the axon relay) sees
        padded, _, b = srv.pad_request(sub)
        params, bstats = srv.weights
        dev = jax.device_put(padded)
        call = srv.executable(b)
        out = call(params, bstats, dev)
        _ = float(out["fused"][0, 0])
        t0 = time.perf_counter()
        for _i in range(10):
            out = call(params, bstats, dev)
        _ = float(out["fused"][0, 0])
        dt_dev = (time.perf_counter() - t0) / 10
        h2d_mb = sum(v.nbytes for v in padded.values()) / 2**20
        rows.append({"batch": n, "latency_ms": round(dt * 1e3, 2),
                     "clips_per_sec": round(n / dt, 1),
                     "device_resident_ms": round(dt_dev * 1e3, 2),
                     "device_resident_clips_per_sec": round(n / dt_dev, 1),
                     "h2d_mb_per_call": round(h2d_mb, 1)})

    print(json.dumps({
        "config": which, "weights_dtype": wdtype,
        "device": jax.devices()[0].device_kind,
        "export_s": round(t_export, 1), "load_s": round(t_load, 1),
        "params_msgpack_mb": round(os.path.getsize(
            os.path.join(out_dir, "params.msgpack")) / 2**20, 1),
        "max_abs_err_vs_live_graph": err,
        "rungs": rows}, indent=1))


if __name__ == "__main__":
    main()
