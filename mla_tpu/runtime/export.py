"""AOT export + serving: freeze the eval forward into a portable artifact.

The reference has no deployment story — serving a trained model means
re-running the Python model code under torch (main.py:946-953 re-builds the
net and loads a .pth). Here the jitted inference graph (encoders + the
regime's eval-time fusion, evals/metrics.py:eval_logits) is serialized with
`jax.export` to StableHLO: a versioned, model-code-free artifact that a
serving binary can deserialize and run on TPU without importing mla_tpu's
model zoo — only the artifact + weights.

Layout of an export directory:
    meta.json            input specs, batch sizes, platforms, config summary
    params.msgpack       flax msgpack of state.params
    batch_stats.msgpack  flax msgpack of state.batch_stats ({} if none)
    serving_b{N}.jaxexp  one serialized Exported per supported batch size

Batch handling: TPU wants static shapes, so the artifact carries a ladder of
batch sizes (default 1/8/64); `ServingModel` pads an incoming request to the
smallest rung and slices the result. Padded rows get valid=0, which the
dynamic-fusion gating masks out (fusion_eval.py:gating_weights), so padding
never changes real rows' outputs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_ser
from jax import export as jax_export

from mla_tpu.core.config import MLAConfig
from mla_tpu.evals.metrics import eval_logits
from mla_tpu.models.classifiers import modalities_of

# Per-sample input tensors each classifier family reads from the batch dict
# (models/classifiers.py __call__ bodies; shapes are per-sample, the leading
# batch axis is added by the export specs).
FEATURE_KEYS: Dict[str, Tuple[str, ...]] = {
    "AVClassifier": ("spec", "image"),
    "CAVClassifier": ("fbank", "image"),
    "M3AEClassifier": ("token", "padding_mask", "image"),
    "Modal3Classifier": ("fbank", "image", "token", "padding_mask"),
    "CLIPClassifier": ("token_feat", "image_feat"),
}

_META = "meta.json"
_PARAMS = "params.msgpack"
_BATCH_STATS = "batch_stats.msgpack"


def feature_keys(model) -> Tuple[str, ...]:
    return FEATURE_KEYS[type(model).__name__]


def make_serving_fn(model, cfg: MLAConfig, dequant: bool = False,
                    a8: bool = False, a8_skip=frozenset()):
    """(params, batch_stats, features) -> {'fused', 'logits_<m>'...}.

    `features` must contain the model's feature_keys plus 'valid' (float32
    (B,), 1.0 for real rows). Everything else from the training batch dict
    (label/idx) is inference-irrelevant and excluded from the artifact.
    dequant=True: params carry int8 {'q8','scale'} nodes (weights_dtype
    'int8'). split_q8 routes the big Dense kernels and the m3ae embedding
    table to int8-native consumers (QDense -> ops/q8_matmul.py Pallas GEMM;
    the gather-then-dequantize embedding path) so int8 is what streams from
    HBM, and dequantizes the remainder (convs, heads) in-graph as before.
    a8=True (weights_dtype 'int8_a8') additionally quantizes activations
    per-row at each QDense site so the MXU runs s8 x s8 (W8A8). a8_skip:
    QDense site paths that keep the weight-only GEMM — the calibrate_a8
    outlier guard's verdict, baked into the traced graph.
    """
    modalities = modalities_of(cfg)
    a8_skip = frozenset(a8_skip)

    def serve(params, batch_stats, features):
        from mla_tpu.models import layers as _layers
        q8 = None
        if dequant:
            params, q8 = split_q8(params)
        valid = features["valid"]
        prev = _layers.q8_a8_enabled
        prev_skip = _layers.q8_a8_skip
        _layers.q8_a8_enabled = a8          # trace-time switch
        _layers.q8_a8_skip = a8_skip
        try:
            out_m, fused = eval_logits(model, cfg, params, batch_stats,
                                       features, valid, q8=q8)
        finally:
            _layers.q8_a8_enabled = prev
            _layers.q8_a8_skip = prev_skip
        result = {"fused": fused.astype(jnp.float32)}
        for m in modalities:
            result[f"logits_{m}"] = out_m[m].astype(jnp.float32)
        return result

    return serve


def _boundary_dtype(dt) -> np.dtype:
    """Serving-boundary dtype: float features cross as float32 (the model
    casts to its compute dtype inside the graph), so artifacts are npz- and
    client-friendly even when the training Loader emits bfloat16 batches
    (numpy cannot round-trip bf16 through .npz)."""
    return np.dtype(np.float32) if jnp.issubdtype(dt, jnp.floating) \
        else np.dtype(dt)


def _specs_for(example_features: Dict[str, np.ndarray], keys: Sequence[str],
               batch: int) -> Dict[str, jax.ShapeDtypeStruct]:
    specs = {}
    for k in keys:
        a = example_features[k]
        specs[k] = jax.ShapeDtypeStruct((batch,) + tuple(a.shape[1:]),
                                        _boundary_dtype(a.dtype))
    specs["valid"] = jax.ShapeDtypeStruct((batch,), jnp.float32)
    return specs


def host_fetch(tree):
    """Device tree -> host numpy, one replica's worth per leaf.

    Works for single-device, single-process-sharded, and multi-process
    fully-REPLICATED global arrays (each process holds a complete copy).
    Model-axis-sharded leaves spanning processes cannot be fetched here —
    the serving graph is single-device anyway — so fail with direction."""
    def fetch(x):
        if hasattr(x, "addressable_data") and not x.is_fully_addressable:
            shard = x.addressable_data(0)
            if shard.shape != x.shape:
                raise ValueError(
                    "host_fetch: params are sharded across processes "
                    f"(leaf {x.shape} -> local shard {shard.shape}); export "
                    "from a single-process run (eval-only --export_dir on "
                    "the saved checkpoint) or without a model axis")
            return np.asarray(shard)
        return np.asarray(jax.device_get(x))
    return jax.tree.map(fetch, tree)


def _cast_weights(params, dtype: str):
    """Cast floating param leaves to the artifact weight dtype. bfloat16
    halves params.msgpack and the device-resident weight HBM (the huge
    config: 5.4 -> 2.7 GB); the serving compute path is bf16 regardless
    (flax modules cast at use), so the only numeric change is the one-time
    rounding of the stored weights. Integer leaves pass through."""
    if dtype == "float32":
        return params
    if dtype in ("int8", "int8_a8"):    # a8 changes the graph, not weights
        return _quantize_int8(params)
    if dtype != "bfloat16":
        raise ValueError(f"export weights_dtype must be float32, bfloat16 "
                         f"or int8, got {dtype!r}")
    cast = lambda a: a.astype(jnp.bfloat16) \
        if jnp.issubdtype(a.dtype, jnp.floating) else a
    return jax.tree.map(cast, params)


# -- int8 weight-only quantization -------------------------------------------
# Symmetric per-channel int8 for the big GEMM/conv kernels and embedding
# tables (4x smaller than fp32, 2x smaller than bf16 at rest AND per
# forward's weight HBM reads — the b=1 serving latency is weight-read-bound,
# BASELINE.md huge-bf16 analysis); everything small (biases, LN scales,
# CLS/mask tokens, positional embeddings) stays bf16. Activations are
# untouched (weight-only scheme), so no calibration data is needed.

_Q8_MIN_SIZE = 4096  # don't bother quantizing tiny leaves


_Q8_NAMES = ("kernel", "embedding", "text_embedding", "image_kernel")


def _q8_axes(name: str, ndim: int):
    """Reduction axes for the per-channel max — the scale broadcasts back.
    Embedding tables (vocab, C): per-ROW (each row is one token's vector; a
    per-column scale would couple all 30k tokens). Kernels: per-output-
    channel (last axis); stacked/conv kernels (ndim>=3) also keep axis 0
    (the --scan_blocks layer axis / conv kh) for per-slice scales —
    finer granularity costs nothing and never hurts accuracy."""
    if name in ("embedding", "text_embedding"):
        return (ndim - 1,)
    if ndim == 2:
        return (0,)
    return tuple(range(1, ndim - 1))


def _quantize_int8(params):
    """Host-side: kernels/embeddings >= _Q8_MIN_SIZE elements become
    {'q8': int8, 'scale': float32 broadcastable}; other float leaves cast
    to bf16. The structure round-trips flax msgpack unchanged, so
    ServingModel needs no int8 awareness — the exported graph dequantizes."""
    def walk(tree, name=""):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        a = np.asarray(tree)
        if not np.issubdtype(a.dtype, np.floating):
            return a
        if name in _Q8_NAMES and a.ndim >= 2 and a.size >= _Q8_MIN_SIZE:
            amax = np.max(np.abs(a), axis=_q8_axes(name, a.ndim),
                          keepdims=True)
            scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
            q = np.clip(np.round(a / scale), -127, 127).astype(np.int8)
            return {"q8": q, "scale": scale}
        return a.astype(jnp.bfloat16)
    return walk(params)


def dequantize_int8(params):
    """In-graph inverse: {'q8','scale'} nodes -> bf16 weights. bf16 (not
    fp32) keeps the transient dequantized tree at half size; the model
    casts to its compute dtype (bf16) at use anyway."""
    def walk(tree):
        if isinstance(tree, dict):
            if set(tree.keys()) == {"q8", "scale"}:
                return (tree["q8"].astype(jnp.bfloat16)
                        * tree["scale"].astype(jnp.bfloat16))
            return {k: walk(v) for k, v in tree.items()}
        return tree
    return walk(params)


# Dense sites whose modules consume int8 kernels directly through the
# dequant-fused Pallas GEMM (models/layers.py:QDense, ops/q8_matmul.py):
# the ViT qkv/proj/fc1/fc2 projections — >97% of the big models' weights.
_Q8_FUSED_PARENTS = frozenset(("qkv", "proj", "fc1", "fc2"))
# Encoder-level leaves models/m3ae.py consumes int8-side itself.
_Q8_FUSED_NAMES = frozenset(("text_embedding", "image_kernel"))


def split_q8(params):
    """{'q8','scale'} tree -> (params', q8_scales) for the fused int8 path.

    Where the consuming module can stream int8 (QDense Dense sites, the
    m3ae text-embedding gather and image-patch GEMM), the int8 array goes
    back in the PARAM position (flax validates param shape, not dtype) and
    its scale into a mirrored tree served as the 'q8' variable collection
    (leaf name + '_scale'). Everything else — conv kernels, fusion heads,
    anything a consumer reads as a plain array — dequantizes in place
    exactly as the round-3 graphs did. Pure tree restructuring: inside the
    traced serving fn this costs nothing.
    """
    def walk(tree, parent=""):
        if not isinstance(tree, dict):
            return tree, None
        if set(tree.keys()) == {"q8", "scale"}:
            return (tree["q8"].astype(jnp.bfloat16)
                    * tree["scale"].astype(jnp.bfloat16)), None
        out, scales = {}, {}
        for k, v in tree.items():
            if (isinstance(v, dict) and set(v.keys()) == {"q8", "scale"}
                    and (k in _Q8_FUSED_NAMES
                         or (k == "kernel" and parent in _Q8_FUSED_PARENTS))):
                out[k] = v["q8"]
                scales[f"{k}_scale"] = v["scale"]
                continue
            out[k], sub = walk(v, k)
            if sub:
                scales[k] = sub
        return out, scales
    p, scales = walk(params)
    return p, (scales or {})


# Per-row symmetric activation quantization (W8A8) breaks exactly where an
# activation row carries outlier channels: one huge element sets the row's
# scale and coarsens the step for every other channel. Default bound: a
# site whose worst calibration row loses >5% relative L2 to A8 rounding
# falls back to the weight-only dequant-fused GEMM (still int8 weight
# reads — the latency lever — just bf16 activations into the MXU).
A8_REL_THRESHOLD = 0.05


def calibrate_a8(model, cfg: MLAConfig, params, batch_stats, features,
                 threshold: Optional[float] = None):
    """W8A8 outlier guard: measure per-site A8 activation error, pick skips.

    Runs ONE forward of the int8_a8 serving graph on the calibration
    ``features`` with the models/layers.py report hook armed: every
    a8-eligible QDense site reports the worst-row relative L2 error its
    per-row activation quantization would introduce (under nn.scan the site
    reports once per layer; the recorder keeps the max). Returns
    ``(site_errs, skip)`` where ``skip`` is the frozenset of site paths
    whose error exceeds ``threshold`` — pass it to make_serving_fn so the
    fallback is baked into the traced artifact.

    ``params`` must already be the int8 {'q8','scale'} tree
    (_quantize_int8 output), so the guard sees the exact artifact weights.

    The forward runs on the CPU backend with the jnp reference kernels
    (q8_matmul.set_reference_only + attention.set_reference_attention):
    the error probe rides jax.debug.callback, which the axon TPU relay
    does not support, and per-row quantization error is
    backend-independent — only the activation VALUES matter. Features are
    sliced to at most 4 batch rows (~1k token rows through each site on
    the big configs) to bound the host-side cost.
    """
    from mla_tpu.models import layers as _layers
    from mla_tpu.ops import attention as _attn
    from mla_tpu.ops import q8_matmul as _q8

    if threshold is None:
        threshold = A8_REL_THRESHOLD
    errs: Dict[str, float] = {}

    def record(site, rel):
        errs[site] = max(rel, errs.get(site, 0.0))

    rows = min(4, len(next(iter(features.values()))))
    features = {k: np.asarray(v)[:rows] for k, v in features.items()}
    serve = make_serving_fn(model, cfg, dequant=True, a8=True)
    prev = _layers.q8_a8_report
    prev_attn = _attn._FORCE_REFERENCE
    prev_q8 = _q8._REFERENCE_ONLY
    _layers.q8_a8_report = record
    _attn.set_reference_attention(True)
    _q8.set_reference_only(True)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            out = serve(jax.tree.map(np.asarray, params),
                        jax.tree.map(np.asarray, batch_stats), features)
            jax.block_until_ready(out)   # flush the debug callbacks
    finally:
        _layers.q8_a8_report = prev
        _attn.set_reference_attention(prev_attn)
        _q8.set_reference_only(prev_q8)
    skip = frozenset(s for s, e in errs.items() if e > threshold)
    return errs, skip


def export_serving(cfg: MLAConfig, model, state, example_batch,
                   out_dir: str, batch_sizes: Sequence[int] = (1, 8, 64),
                   platforms: Optional[Sequence[str]] = None,
                   weights_dtype: str = "float32") -> str:
    """Serialize the eval forward at each batch size + the weights.

    example_batch: any batch dict from a Loader (only feature shapes/dtypes
    are read). Returns out_dir. Multi-process: every process traces (cheap,
    no collectives) but only process 0 writes files. weights_dtype
    'bfloat16' stores + serves bf16 params (BN batch_stats stay fp32: the
    eval normalization (x-mean)*rsqrt(var+eps) is precision-sensitive and
    the stats are per-channel vectors, negligible either way); 'int8'
    additionally quantizes the big kernels/embeddings per-channel
    (weight-only — see _quantize_int8) with in-graph dequantization.
    """
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(
            f"batch_sizes must be positive ints, got {batch_sizes}")
    os.makedirs(out_dir, exist_ok=True)
    keys = feature_keys(model)
    params = _cast_weights(host_fetch(state.params), weights_dtype)
    batch_stats = host_fetch(state.batch_stats) if state.batch_stats \
        else {}
    example = {k: np.asarray(example_batch[k]) for k in keys}
    a8_errs, a8_skip = {}, frozenset()
    if weights_dtype == "int8_a8":
        # Outlier guard: the example batch doubles as the calibration batch
        # (the driver passes a real loader batch). Sites whose worst row
        # loses >A8_REL_THRESHOLD relative L2 to activation quantization
        # keep the weight-only GEMM in the traced artifact.
        cal = dict(example)
        v = example_batch.get("valid")
        cal["valid"] = np.asarray(v, np.float32) if v is not None else \
            np.ones((len(next(iter(example.values()))),), np.float32)
        a8_errs, a8_skip = calibrate_a8(model, cfg, params, batch_stats, cal)
    serve = make_serving_fn(
        model, cfg, dequant=weights_dtype in ("int8", "int8_a8"),
        a8=weights_dtype == "int8_a8", a8_skip=a8_skip)
    write = jax.process_index() == 0

    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          params)
    bs_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                           batch_stats)
    # The Pallas attention kernels lower to the `tpu_custom_call` target,
    # which jax.export treats as non-portable; serving targets the same
    # TPU generation, so disable that check.
    disabled = (jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                jax_export.DisabledSafetyCheck.custom_call("Sharding"))

    for b in batch_sizes:
        f_spec = _specs_for(example, keys, b)
        exp = jax_export.export(
            jax.jit(serve), platforms=platforms,
            disabled_checks=disabled)(p_spec, bs_spec, f_spec)
        if write:
            with open(os.path.join(out_dir, f"serving_b{b}.jaxexp"),
                      "wb") as f:
                f.write(bytes(exp.serialize()))
        exported_platforms = exp.platforms

    if not write:
        return out_dir
    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(flax_ser.msgpack_serialize(jax.tree.map(np.asarray, params)))
    with open(os.path.join(out_dir, _BATCH_STATS), "wb") as f:
        f.write(flax_ser.msgpack_serialize(
            jax.tree.map(np.asarray, batch_stats)))

    meta = {
        "family": type(model).__name__,
        "modalities": list(modalities_of(cfg)),
        "n_classes": cfg.n_classes,
        "batch_sizes": batch_sizes,
        "weights_dtype": weights_dtype,
        "a8_skip": sorted(a8_skip),
        "a8_site_rel_err": {k: round(v, 6)
                            for k, v in sorted(a8_errs.items())},
        "platforms": list(exported_platforms),
        "feature_specs": {
            k: {"shape": list(example[k].shape[1:]),
                "dtype": str(_boundary_dtype(example[k].dtype))}
            for k in keys},
        "config": {"dataset": cfg.dataset, "lorb": cfg.lorb,
                   "modal3": cfg.modal3, "clip": cfg.clip,
                   "gs_flag": cfg.gs_flag, "modulation": cfg.modulation,
                   "dynamic": cfg.dynamic,
                   "fusion_method": cfg.fusion_method},
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def export_serving_sharded(cfg: MLAConfig, model, state, example_batch,
                           out_dir: str, mesh,
                           batch_sizes: Sequence[int] = (1,),
                           weights_dtype: str = "float32") -> str:
    """TP-sharded serving artifact: the eval forward jitted over ``mesh``
    with Megatron column/row shardings on the transformer kernels
    (parallel/tp.py leaf rules), serialized WITH its shardings — per-chip
    weight residency ~1/m for the big stacks, so e.g. the 1.34B 'huge'
    config serves from ~1/m of its bytes per chip. Load with
    load_serving_sharded on a same-shape mesh.

    Two trace-time differences from the single-device artifact:
      * attention routes through the pure-jnp reference
        (ops/attention.py set_reference_attention) — a custom_partitioning
        handler is a Python callback and cannot survive jax.export
        serialization, and stock GSPMD shards the plain dots fine;
      * weights_dtype 'int8' is rejected: the {'q8','scale'} nodes don't
        carry the module path names the TP rules key on.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mla_tpu.ops import attention as attn_lib
    from mla_tpu.parallel import tp
    from mla_tpu.parallel.mesh import MODEL_AXIS

    if weights_dtype in ("int8", "int8_a8"):
        raise ValueError("sharded export supports float32/bfloat16 weights")
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_model <= 1:
        raise ValueError(f"mesh {dict(mesh.shape)} has no model axis > 1")
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    os.makedirs(out_dir, exist_ok=True)
    keys = feature_keys(model)
    serve = make_serving_fn(model, cfg)
    params = _cast_weights(host_fetch(state.params), weights_dtype)
    batch_stats = host_fetch(state.batch_stats) if state.batch_stats else {}
    example = {k: np.asarray(example_batch[k]) for k in keys}
    write = jax.process_index() == 0

    p_shard = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, tp.leaf_pspec(path, leaf, n_model)), params)
    repl = NamedSharding(mesh, P())
    p_spec = jax.tree.map(
        lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
        params, p_shard)
    bs_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl),
        batch_stats)
    disabled = (jax_export.DisabledSafetyCheck.custom_call("Sharding"),)

    attn_lib.set_reference_attention(True)
    try:
        for b in batch_sizes:
            f_spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=repl)
                      for k, v in _specs_for(example, keys, b).items()}
            fj = jax.jit(serve, out_shardings=repl)
            exp = jax_export.export(fj, disabled_checks=disabled)(
                p_spec, bs_spec, f_spec)
            if write:
                with open(os.path.join(out_dir, f"serving_b{b}.jaxexp"),
                          "wb") as f:
                    f.write(bytes(exp.serialize()))
    finally:
        attn_lib.set_reference_attention(False)

    if not write:
        return out_dir
    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(flax_ser.msgpack_serialize(jax.tree.map(np.asarray, params)))
    with open(os.path.join(out_dir, _BATCH_STATS), "wb") as f:
        f.write(flax_ser.msgpack_serialize(
            jax.tree.map(np.asarray, batch_stats)))
    meta = {
        "family": type(model).__name__,
        "modalities": list(modalities_of(cfg)),
        "n_classes": cfg.n_classes,
        "batch_sizes": batch_sizes,
        "weights_dtype": weights_dtype,
        "mesh_shape": [int(mesh.shape.get("data", 1)), int(n_model)],
        "feature_specs": {
            k: {"shape": list(example[k].shape[1:]),
                "dtype": str(_boundary_dtype(example[k].dtype))}
            for k in keys},
        "config": {"dataset": cfg.dataset, "lorb": cfg.lorb,
                   "modal3": cfg.modal3, "clip": cfg.clip,
                   "gs_flag": cfg.gs_flag, "modulation": cfg.modulation,
                   "dynamic": cfg.dynamic,
                   "fusion_method": cfg.fusion_method},
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ShardedServingModel:
    """Deserialized TP-sharded artifact: weights live Megatron-sharded over
    a (data, model) mesh rebuilt from meta['mesh_shape']; __call__ pads a
    request to a rung and runs the sharded executable. The placement rules
    are recomputed with the same parallel/tp.py leaf rules the exporter
    used — framework code only, no model zoo import."""

    def __init__(self, out_dir: str, mesh=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mla_tpu.parallel import tp
        from mla_tpu.parallel.mesh import make_mesh

        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)
        shape = tuple(self.meta["mesh_shape"])
        self.mesh = mesh if mesh is not None else make_mesh(mesh_shape=shape)
        if (self.mesh.shape.get("data", 1),
                self.mesh.shape.get("model", 1)) != shape:
            raise ValueError(f"artifact was exported for mesh {shape}, "
                             f"got {dict(self.mesh.shape)}")
        n_model = shape[1]
        with open(os.path.join(out_dir, _PARAMS), "rb") as f:
            params = flax_ser.msgpack_restore(f.read())
        with open(os.path.join(out_dir, _BATCH_STATS), "rb") as f:
            batch_stats = flax_ser.msgpack_restore(f.read())
        self._repl = NamedSharding(self.mesh, P())
        self._params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, NamedSharding(
                self.mesh, tp.leaf_pspec(path, leaf, n_model))), params)
        self._batch_stats = jax.device_put(batch_stats, self._repl)
        self.batch_sizes = self.meta["batch_sizes"]
        self._calls = {}
        for b in self.batch_sizes:
            with open(os.path.join(out_dir, f"serving_b{b}.jaxexp"),
                      "rb") as f:
                exp = jax_export.deserialize(bytearray(f.read()))
            self._calls[b] = jax.jit(exp.call)

    feature_names = property(lambda self: list(self.meta["feature_specs"]))

    def __call__(self, features: Dict[str, np.ndarray]):
        # request plumbing shared with ServingModel (methods grafted after
        # its definition below)
        padded, n, b = self.pad_request(features)
        padded = jax.device_put(padded, self._repl)
        out = self._calls[b](self._params, self._batch_stats, padded)
        return {k: np.asarray(v)[:n] for k, v in out.items()}


def load_serving_sharded(out_dir: str, mesh=None) -> "ShardedServingModel":
    return ShardedServingModel(out_dir, mesh)


class ServingModel:
    """Deserialized artifact: __call__(features) -> np logits dict.

    Pads the request up to the smallest exported batch rung (valid=0 rows),
    runs the compiled Exported, slices back. No mla_tpu model code involved
    after load — the graph comes from the artifact.
    """

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(out_dir, _PARAMS), "rb") as f:
            self._params = flax_ser.msgpack_restore(f.read())
        with open(os.path.join(out_dir, _BATCH_STATS), "rb") as f:
            self._batch_stats = flax_ser.msgpack_restore(f.read())
        # resident weights: without this every request re-uploads the full
        # param tree host->device (measured 33 s/call for m3ae base on the
        # v5e relay vs ~60 ms with device-resident weights)
        self._params = jax.device_put(self._params)
        self._batch_stats = jax.device_put(self._batch_stats)
        self.batch_sizes = self.meta["batch_sizes"]
        self._calls = {}
        for b in self.batch_sizes:
            with open(os.path.join(out_dir, f"serving_b{b}.jaxexp"),
                      "rb") as f:
                exp = jax_export.deserialize(bytearray(f.read()))
            self._calls[b] = jax.jit(exp.call)

    @property
    def feature_names(self):
        return list(self.meta["feature_specs"])

    def executable(self, batch_size: int):
        """The compiled callable for one rung: (params, batch_stats,
        features) -> logits dict, features already padded to batch_size.
        For callers that manage device placement themselves (e.g. a server
        keeping a pinned input buffer); __call__ is the np-in/np-out path."""
        return self._calls[batch_size]

    @property
    def weights(self):
        """Device-resident (params, batch_stats) for use with executable()."""
        return self._params, self._batch_stats

    def _rung(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        raise ValueError(
            f"request batch {n} exceeds the largest exported batch size "
            f"{self.batch_sizes[-1]}; re-export with a larger ladder")

    def validate_request(self, features: Dict[str, np.ndarray]) -> int:
        """Name + per-sample-shape checks for one request; returns its row
        count. Shared by pad_request and the serve-side coalescing batcher
        (which must reject a malformed request BEFORE merging it with other
        clients' rows — a shape error surfacing mid-dispatch would fail the
        whole coalesced batch)."""
        names = self.feature_names
        missing = [k for k in names if k not in features]
        if missing:
            raise KeyError(f"serving request missing features {missing}")
        n = int(np.asarray(features[names[0]]).shape[0])
        if n < 1:
            raise ValueError("serving request has 0 rows")
        for k in names:
            a = np.asarray(features[k])
            want = tuple(self.meta["feature_specs"][k]["shape"])
            if tuple(a.shape[1:]) != want:
                raise ValueError(
                    f"feature '{k}' per-sample shape {tuple(a.shape[1:])} != "
                    f"exported {want}")
            if a.shape[0] != n:
                raise ValueError(
                    f"feature '{k}' has {a.shape[0]} rows, expected {n}")
        return n

    def pad_request(self, features: Dict[str, np.ndarray],
                    batch_size: Optional[int] = None):
        """Validate + pad a request to a ladder rung: -> (padded, n, rung).
        Padded rows carry valid=0 (masked by the gating). Shared by
        __call__ and external callers (e.g. benchmarks) so request
        preparation cannot drift from what the executable expects."""
        names = self.feature_names
        n = self.validate_request(features)
        b = batch_size if batch_size is not None else self._rung(n)
        padded = {}
        for k in names:
            a = np.asarray(features[k])
            spec = self.meta["feature_specs"][k]
            want = tuple(spec["shape"])
            pad = np.zeros((b - n,) + want, dtype=spec["dtype"])
            padded[k] = np.concatenate([a.astype(spec["dtype"]), pad], axis=0)
        padded["valid"] = np.concatenate(
            [np.ones(n, np.float32), np.zeros(b - n, np.float32)])
        return padded, n, b

    def __call__(self, features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        padded, n, b = self.pad_request(features)
        out = self._calls[b](self._params, self._batch_stats, padded)
        return {k: np.asarray(v)[:n] for k, v in out.items()}


def load_serving(out_dir: str) -> ServingModel:
    return ServingModel(out_dir)


def load_artifact(out_dir: str, mesh=None):
    """Open an export directory as whichever loader wrote it: meta carrying
    ``mesh_shape`` means a TP-sharded artifact (export_serving_sharded) and
    loads ShardedServingModel; otherwise the single-device ServingModel.
    Both expose the same request API (feature_names/batch_sizes/
    validate_request/pad_request/__call__), so serve.py's batch, HTTP and
    coalescing front ends work over either."""
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    if "mesh_shape" in meta:
        return ShardedServingModel(out_dir, mesh)
    if mesh is not None:
        raise ValueError("mesh given, but the artifact is single-device "
                         "(no mesh_shape in meta.json)")
    return ServingModel(out_dir)


def export_from_driver(cfg: MLAConfig, model, state, sample_batch) -> str:
    """Driver hook for --export_dir: export after params are built/restored.

    Must run after the run's last train/eval step: the serving graph is
    single-device, so the sp/pp trace-time switches are CLEARED (a pp/sp
    trace would bake mesh collectives into the artifact) and the flat
    attention kernels re-enabled (the driver disables them under a model
    axis). run()'s finally-block resets all three anyway."""
    from mla_tpu.ops import attention as attn_lib
    from mla_tpu.parallel import pp, sp
    if sp.is_enabled() or pp.train_config() is not None:
        print("NOTE: --export_dir ignores --seq_parallel/--pp_microbatches "
              "— the serving artifact is a single-device graph")
    sp.disable()
    pp.disable_train()
    attn_lib.set_flat_attention(True)
    sizes = tuple(cfg.export_batch_sizes) if cfg.export_batch_sizes else \
        (1, 8, cfg.batch_size)
    path = export_serving(cfg, model, state, sample_batch, cfg.export_dir,
                          batch_sizes=sizes, weights_dtype=cfg.export_dtype)
    print(f"Serving artifact exported to {path} "
          f"(batch sizes {sorted(set(int(b) for b in sizes))}, "
          f"weights {cfg.export_dtype})")
    return path


# ShardedServingModel shares the single-device loader's request plumbing
# (same meta layout), grafted here because ServingModel is defined later in
# the file than the sharded class that borrows from it.
ShardedServingModel.validate_request = ServingModel.validate_request
ShardedServingModel._rung = ServingModel._rung
ShardedServingModel.pad_request = ServingModel.pad_request
