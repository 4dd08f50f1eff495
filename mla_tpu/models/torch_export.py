"""Flax -> PyTorch checkpoint export: the inverse of torch_import.

Completes the migration story in BOTH directions: reference users can bring
their torch ``.pth`` checkpoints here (torch_import.py), train/finetune on
TPU, and take the result back as a checkpoint the reference loads verbatim —
the same ``saved_dict`` layout reference main.py:915-927 writes (metadata +
DataParallel ``module.``-prefixed ``model`` state_dict), so the reference's
eval branch (main.py:946-953) and warm-start branch (main.py:721-728) both
accept the file unchanged.

Layout conversions (exact inverses of torch_import.py):
  kernel (in, out)          -> Linear weight (out, in)           [transpose]
  kernel (kh, kw, in, out)  -> Conv2d weight (out, in, kh, kw)   [(3,2,0,1)]
  scale/bias (+ batch_stats mean/var) -> BatchNorm weight/bias
                                         (+ running_{mean,var})
  scale/bias                -> LayerNorm weight/bias

Families mirror torch_import.import_classifier: base (2x ResNet-18), large
(2x CAV-MAE), m3ae (2x M3AE), modal3 (CAV + 2x M3AE), clip (fusion head
only) — plus fusion_module and the QMF ``*_fc`` heads. scan-blocks param
trees are unstacked back to per-block layout first.

Round-trip pinned by tests/test_torch_export.py: export -> import_classifier
is bit-exact, and (slow tier) the ACTUAL reference torch model load_state_dicts
the file with strict=True and reproduces this framework's logits.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np32(x) -> np.ndarray:
    # serving/interchange boundary: fp32, like the reference's own ckpts
    return np.asarray(x, dtype=np.float32) if np.issubdtype(
        np.asarray(x).dtype, np.floating) else np.asarray(x)


def _get(tree, path):
    node = tree
    for k in path:
        if k not in node:
            return None
        node = node[k]
    return node


def _inv_linear(sd, params, path_w, tname):
    node = _get(params, path_w)
    if node is None:
        return
    sd[tname + ".weight"] = _np32(node["kernel"]).T
    if "bias" in node:
        sd[tname + ".bias"] = _np32(node["bias"])


def _inv_conv(sd, params, path, tname):
    node = _get(params, path)
    if node is None:
        return
    sd[tname + ".weight"] = _np32(node["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in node:
        sd[tname + ".bias"] = _np32(node["bias"])


def _inv_bn(sd, params, stats, path, tname):
    p, s = _get(params, path), _get(stats, path)
    if p is None:
        return
    sd[tname + ".weight"] = _np32(p["scale"])
    sd[tname + ".bias"] = _np32(p["bias"])
    sd[tname + ".running_mean"] = _np32(s["mean"])
    sd[tname + ".running_var"] = _np32(s["var"])
    # torch BN tracks a step counter the reference never reads back; 0 loads
    sd[tname + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _inv_ln(sd, params, path, tname):
    p = _get(params, path)
    if p is None:
        return
    sd[tname + ".weight"] = _np32(p["scale"])
    sd[tname + ".bias"] = _np32(p["bias"])


def export_resnet18(params: Dict, stats: Dict, prefix: str = "") -> Dict:
    """Flax ResNet trees -> reference models/backbone.py state_dict names.
    Iterates the blocks present in the tree, so --resnet_stages CI variants
    export too (loadable back here; the reference needs the default 2,2,2,2)."""
    sd: Dict = {}
    g = lambda n: prefix + n
    _inv_conv(sd, params, ("conv1",), g("conv1"))
    _inv_bn(sd, params, stats, ("bn1",), g("bn1"))
    for name in sorted(params):
        if not name.startswith("layer"):
            continue
        stage, blk = name[len("layer"):].split("_")
        t = g(f"layer{stage}.{blk}")
        _inv_conv(sd, params, (name, "conv1"), f"{t}.conv1")
        _inv_bn(sd, params, stats, (name, "bn1"), f"{t}.bn1")
        _inv_conv(sd, params, (name, "conv2"), f"{t}.conv2")
        _inv_bn(sd, params, stats, (name, "bn2"), f"{t}.bn2")
        if "downsample_conv" in params[name]:
            _inv_conv(sd, params, (name, "downsample_conv"),
                      f"{t}.downsample.0")
            _inv_bn(sd, params, stats, (name, "downsample_bn"),
                    f"{t}.downsample.1")
    return sd


def export_m3ae(params: Dict, prefix: str = "") -> Dict:
    """M3AEEncoder params -> reference models/m3ae.py state_dict names."""
    sd: Dict = {}
    g = lambda n: prefix + n
    sd[g("text_embedding.weight")] = _np32(params["text_embedding"])
    sd[g("image_embedding.weight")] = _np32(params["image_kernel"]).T
    sd[g("image_embedding.bias")] = _np32(params["image_bias"])
    sd[g("cls_token")] = _np32(params["cls_token"])
    for t in ("encoder_image_type_embedding", "encoder_text_type_embedding"):
        if t in params:
            sd[g(t)] = _np32(params[t])
    for name in sorted(params):
        if not name.startswith("block_"):
            continue
        i = int(name[len("block_"):])
        t = g(f"encoder.blocks.{i}")
        _inv_ln(sd, params, (name, "norm1"), f"{t}.layer_norm1")
        _inv_ln(sd, params, (name, "norm2"), f"{t}.layer_norm2")
        _inv_linear(sd, params, (name, "attn", "qkv"),
                    f"{t}.attention.qkv_linear")
        _inv_linear(sd, params, (name, "attn", "proj"), f"{t}.attention.fc")
        _inv_linear(sd, params, (name, "mlp", "fc1"),
                    f"{t}.transformer_mlp.fc1")
        _inv_linear(sd, params, (name, "mlp", "fc2"),
                    f"{t}.transformer_mlp.fc2")
    _inv_ln(sd, params, ("final_norm",), g("encoder.layer_norm"))
    return sd


def export_cavmae(params: Dict, prefix: str = "") -> Dict:
    """CAVMAEFT(Flax) params -> reference models/cav_mae.py names."""
    sd: Dict = {}
    g = lambda n: prefix + n
    _inv_conv(sd, params, ("patch_embed_a", "proj"), g("patch_embed_a.proj"))
    _inv_conv(sd, params, ("patch_embed_v", "proj"), g("patch_embed_v.proj"))
    for t in ("modality_a", "modality_v", "pos_embed_a", "pos_embed_v"):
        if t in params:
            sd[g(t)] = _np32(params[t])
    for name in sorted(params):
        if not name.startswith("blocks_"):
            continue
        tag, i = name[len("blocks_"):].split("_")
        t = g(f"blocks_{tag}.{i}")
        blk = params[name]
        for norm in ("norm1", "norm1_a", "norm1_v",
                     "norm2", "norm2_a", "norm2_v"):
            if f"{norm}_scale" in blk:
                sd[f"{t}.{norm}.weight"] = _np32(blk[f"{norm}_scale"])
                sd[f"{t}.{norm}.bias"] = _np32(blk[f"{norm}_bias"])
        _inv_linear(sd, params, (name, "attn", "qkv"), f"{t}.attn.qkv")
        _inv_linear(sd, params, (name, "attn", "proj"), f"{t}.attn.proj")
        _inv_linear(sd, params, (name, "mlp", "fc1"), f"{t}.mlp.fc1")
        _inv_linear(sd, params, (name, "mlp", "fc2"), f"{t}.mlp.fc2")
    _inv_ln(sd, params, ("norm_a",), g("norm_a"))
    _inv_ln(sd, params, ("norm_v",), g("norm_v"))
    if "norm" in params:
        _inv_ln(sd, params, ("norm",), g("norm"))
    if "mlp_head" in params:  # Sequential(LayerNorm, Linear)
        _inv_ln(sd, params, ("mlp_head_norm",), g("mlp_head.0"))
        _inv_linear(sd, params, ("mlp_head",), g("mlp_head.1"))
    return sd


def export_classifier(params: Dict, stats: Dict, cfg) -> Dict[str, np.ndarray]:
    """Full flax (params, batch_stats) -> reference classifier state_dict
    (no DataParallel prefix; numpy values). Inverse of
    torch_import.import_classifier — same family routing."""
    # scan-blocks trees keep block params stacked under 'blocks'; the
    # reference layout is per-block
    if getattr(cfg, "scan_blocks", False):
        from mla_tpu.parallel.pp import from_scan_layout
        params = from_scan_layout(params)
    sd: Dict = {}
    if cfg.lorb == "base" and not cfg.clip:
        for net in ("audio_net", "visual_net"):
            sd.update(export_resnet18(params[net], stats.get(net, {}),
                                      prefix=f"{net}."))
        for fc in ("audio_fc", "visual_fc"):
            if fc in params:
                _inv_linear(sd, params, (fc,), fc)
    elif cfg.lorb == "large":
        sd.update(export_cavmae(params["mae_a"], prefix="mae_a."))
        sd.update(export_cavmae(params["mae_v"], prefix="mae_v."))
    elif cfg.lorb == "m3ae" and cfg.modal3:
        sd.update(export_cavmae(params["mae_a"], prefix="mae_a."))
        sd.update(export_m3ae(params["mae_v"], prefix="mae_v."))
        sd.update(export_m3ae(params["mae_t"], prefix="mae_t."))
        for fc in ("audio_fc", "visual_fc", "txtual_fc"):
            if fc in params:
                _inv_linear(sd, params, (fc,), fc)
    elif cfg.lorb == "m3ae":
        sd.update(export_m3ae(params["mae_a"], prefix="mae_a."))
        sd.update(export_m3ae(params["mae_v"], prefix="mae_v."))
        for fc in ("audio_fc", "visual_fc"):
            if fc in params:
                _inv_linear(sd, params, (fc,), fc)
    if "fusion_module" in params:
        for fc in ("fc_out", "fc_x", "fc_y", "fc"):
            if fc in params["fusion_module"]:
                _inv_linear(sd, params, ("fusion_module", fc),
                            f"fusion_module.{fc}")
    return sd


def save_torch_checkpoint(path: str, state, cfg, epoch: int = 0,
                          acc: float = 0.0) -> str:
    """Write a reference-loadable ``.pth``: the exact saved_dict layout of
    reference main.py:915-927, with the DataParallel ``module.`` prefix the
    reference's own training loop produces (its eval/warm-start loads strip
    or match it). `state` is a TrainState or a (params, batch_stats) pair."""
    import torch

    if isinstance(state, tuple):
        params, stats = state
    else:
        params, stats = state.params, state.batch_stats
    params = _to_host(params)
    stats = _to_host(stats or {})
    sd = export_classifier(params, stats, cfg)
    # copy: jax-backed buffers are non-writable, torch tensors must own data
    model_sd = {("module." + k): torch.from_numpy(
                    np.ascontiguousarray(v).copy())
                for k, v in sd.items()}
    torch.save({"saved_epoch": int(epoch),
                "modulation": cfg.modulation,
                "alpha": cfg.alpha,
                "fusion": cfg.fusion_method,
                "acc": float(acc),
                "model": model_sd}, path)
    return path


def _to_host(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
