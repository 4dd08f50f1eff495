"""PyTorch -> Flax checkpoint import.

Maps the reference's torch state_dicts — the released Zenodo MLA checkpoints
(reference README.md:29) and the pretrained CAV-MAE / M3AE encoder weights
(basic_model.py:109-110,160-168) — onto this framework's param/batch_stats
trees. Handles the DataParallel ``module.`` prefix strip (main.py:724).

Layout conversions:
  Linear weight (out, in)        -> kernel (in, out)            [transpose]
  Conv2d weight (out, in, kh, kw)-> kernel (kh, kw, in, out)    [(2,3,1,0)]
  BatchNorm weight/bias          -> scale/bias  (+ running_{mean,var} ->
                                    batch_stats mean/var)
  LayerNorm weight/bias          -> scale/bias (or the flat
                                    norm*_scale/_bias params of CAVBlock)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# per-family key translation: torch name -> (flax collection, path, transform)
# ---------------------------------------------------------------------------

def _linear(params, path_w, tname, sd):
    _set(params, path_w + ("kernel",), _np(sd[tname + ".weight"]).T)
    if tname + ".bias" in sd:
        _set(params, path_w + ("bias",), _np(sd[tname + ".bias"]))


def _conv(params, path, tname, sd):
    _set(params, path + ("kernel",),
         _np(sd[tname + ".weight"]).transpose(2, 3, 1, 0))
    if tname + ".bias" in sd:
        _set(params, path + ("bias",), _np(sd[tname + ".bias"]))


def _bn(params, stats, path, tname, sd):
    _set(params, path + ("scale",), _np(sd[tname + ".weight"]))
    _set(params, path + ("bias",), _np(sd[tname + ".bias"]))
    _set(stats, path + ("mean",), _np(sd[tname + ".running_mean"]))
    _set(stats, path + ("var",), _np(sd[tname + ".running_var"]))


def _ln(params, path, tname, sd):
    _set(params, path + ("scale",), _np(sd[tname + ".weight"]))
    _set(params, path + ("bias",), _np(sd[tname + ".bias"]))


def import_resnet18(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """reference models/backbone.py ResNet-18 (sub-)state_dict -> flax trees."""
    p, s = {}, {}
    g = lambda n: prefix + n
    _conv(p, ("conv1",), g("conv1"), sd)
    _bn(p, s, ("bn1",), g("bn1"), sd)
    for stage in range(1, 5):
        for blk in range(2):
            fpath = f"layer{stage}_{blk}"
            t = g(f"layer{stage}.{blk}")
            _conv(p, (fpath, "conv1"), f"{t}.conv1", sd)
            _bn(p, s, (fpath, "bn1"), f"{t}.bn1", sd)
            _conv(p, (fpath, "conv2"), f"{t}.conv2", sd)
            _bn(p, s, (fpath, "bn2"), f"{t}.bn2", sd)
            if f"{t}.downsample.0.weight" in sd:
                _conv(p, (fpath, "downsample_conv"), f"{t}.downsample.0", sd)
                _bn(p, s, (fpath, "downsample_bn"), f"{t}.downsample.1", sd)
    return p, s


def import_m3ae(sd: Dict, prefix: str = "") -> Dict:
    """reference models/m3ae.py MaskedMultimodalAutoencoder -> M3AEEncoder."""
    p: Dict = {}
    g = lambda n: prefix + n
    p["text_embedding"] = _np(sd[g("text_embedding.weight")])
    p["image_kernel"] = _np(sd[g("image_embedding.weight")]).T
    p["image_bias"] = _np(sd[g("image_embedding.bias")])
    p["cls_token"] = _np(sd[g("cls_token")])
    for t in ("encoder_image_type_embedding", "encoder_text_type_embedding"):
        if g(t) in sd:
            p[t] = _np(sd[g(t)])
    depth = 1 + max(int(re.match(r".*blocks\.(\d+)\.", k).group(1))
                    for k in sd if g("encoder.blocks.") in k)
    for i in range(depth):
        t = g(f"encoder.blocks.{i}")
        fb = f"block_{i}"
        _ln(p, (fb, "norm1"), f"{t}.layer_norm1", sd)
        _ln(p, (fb, "norm2"), f"{t}.layer_norm2", sd)
        _linear(p, (fb, "attn", "qkv"), f"{t}.attention.qkv_linear", sd)
        _linear(p, (fb, "attn", "proj"), f"{t}.attention.fc", sd)
        _linear(p, (fb, "mlp", "fc1"), f"{t}.transformer_mlp.fc1", sd)
        _linear(p, (fb, "mlp", "fc2"), f"{t}.transformer_mlp.fc2", sd)
    _ln(p, ("final_norm",), g("encoder.layer_norm"), sd)
    return p


def import_cavmae(sd: Dict, prefix: str = "") -> Dict:
    """reference models/cav_mae.py CAVMAEFT -> CAVMAEFT(Flax)."""
    p: Dict = {}
    g = lambda n: prefix + n
    _conv(p, ("patch_embed_a", "proj"), g("patch_embed_a.proj"), sd)
    _conv(p, ("patch_embed_v", "proj"), g("patch_embed_v.proj"), sd)
    for t in ("modality_a", "modality_v", "pos_embed_a", "pos_embed_v"):
        p[t] = _np(sd[g(t)])
    for tag in ("a", "v", "u"):
        i = 0
        while g(f"blocks_{tag}.{i}.attn.qkv.weight") in sd:
            t = g(f"blocks_{tag}.{i}")
            fb = f"blocks_{tag}_{i}"
            for norm in ("norm1", "norm1_a", "norm1_v",
                         "norm2", "norm2_a", "norm2_v"):
                if f"{t}.{norm}.weight" in sd:
                    _set(p, (fb, f"{norm}_scale"), _np(sd[f"{t}.{norm}.weight"]))
                    _set(p, (fb, f"{norm}_bias"), _np(sd[f"{t}.{norm}.bias"]))
            _linear(p, (fb, "attn", "qkv"), f"{t}.attn.qkv", sd)
            _linear(p, (fb, "attn", "proj"), f"{t}.attn.proj", sd)
            _linear(p, (fb, "mlp", "fc1"), f"{t}.mlp.fc1", sd)
            _linear(p, (fb, "mlp", "fc2"), f"{t}.mlp.fc2", sd)
            i += 1
    _ln(p, ("norm_a",), g("norm_a"), sd)
    _ln(p, ("norm_v",), g("norm_v"), sd)
    if g("norm.weight") in sd:
        _ln(p, ("norm",), g("norm"), sd)
    if g("mlp_head.0.weight") in sd:   # Sequential(LayerNorm, Linear)
        _ln(p, ("mlp_head_norm",), g("mlp_head.0"), sd)
        _linear(p, ("mlp_head",), g("mlp_head.1"), sd)
    return p


def _import_fusion(sd: Dict) -> Dict:
    p: Dict = {}
    for fc in ("fc_out", "fc_x", "fc_y", "fc"):
        if f"fusion_module.{fc}.weight" in sd:
            _linear(p, (fc,), f"fusion_module.{fc}", sd)
    return p


def import_classifier(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """Full reference classifier state_dict -> (params, batch_stats) for
    mla_tpu.models.classifiers.build_classifier(cfg).

    Accepts raw ``torch.save`` dicts (with 'model' key), DataParallel
    prefixes, and the per-encoder pretrained files.
    """
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]
    sd = strip_module_prefix(sd)
    params: Dict = {}
    stats: Dict = {}
    if cfg.lorb == "base" and not cfg.clip:
        for net in ("audio_net", "visual_net"):
            p, s = import_resnet18(sd, prefix=f"{net}.")
            params[net] = p
            stats[net] = s
        for fc in ("audio_fc", "visual_fc"):
            if f"{fc}.weight" in sd:
                _linear(params, (fc,), fc, sd)
    elif cfg.lorb == "large":
        params["mae_a"] = import_cavmae(sd, prefix="mae_a.")
        params["mae_v"] = import_cavmae(sd, prefix="mae_v.")
    elif cfg.lorb == "m3ae" and cfg.modal3:
        params["mae_a"] = import_cavmae(sd, prefix="mae_a.")
        params["mae_v"] = import_m3ae(sd, prefix="mae_v.")
        params["mae_t"] = import_m3ae(sd, prefix="mae_t.")
        for fc in ("audio_fc", "visual_fc", "txtual_fc"):
            if f"{fc}.weight" in sd:
                _linear(params, (fc,), fc, sd)
    elif cfg.lorb == "m3ae":
        params["mae_a"] = import_m3ae(sd, prefix="mae_a.")
        params["mae_v"] = import_m3ae(sd, prefix="mae_v.")
        for fc in ("audio_fc", "visual_fc"):
            if f"{fc}.weight" in sd:
                _linear(params, (fc,), fc, sd)
    fusion = _import_fusion(sd)
    if fusion:
        params["fusion_module"] = fusion
    return params, stats


def load_torch_checkpoint(path: str, cfg) -> Tuple[Dict, Dict]:
    import torch
    sd = torch.load(path, map_location="cpu")
    params, stats = import_classifier(sd, cfg)
    if getattr(cfg, "scan_blocks", False):
        # scan-blocks models keep block params stacked under 'blocks'
        from mla_tpu.parallel.pp import to_scan_layout
        params = to_scan_layout(params)
    return params, stats


ENCODER_KIND = {
    # (lorb, modal3) -> {param-collection name: importer kind}
    ("large", False): {"mae_a": "cav", "mae_v": "cav"},
    ("m3ae", False): {"mae_a": "m3ae", "mae_v": "m3ae"},
    ("m3ae", True): {"mae_a": "cav", "mae_v": "m3ae", "mae_t": "m3ae"},
}


def load_pretrained_encoders(cfg, params: Dict) -> Dict:
    """Warm-load per-encoder pretrained .pth files (--pretrained_{a,v,t}) into
    the param tree — the capability the reference hardcodes at
    basic_model.py:109-110 (CAV-MAE) and 160-168,249-255 (M3AE), loaded with
    strict=False; missing keys keep their fresh init here too."""
    import torch
    kinds = ENCODER_KIND.get((cfg.lorb, cfg.modal3))
    if kinds is None:
        return params
    mapping = {"mae_a": cfg.pretrained_a, "mae_v": cfg.pretrained_v,
               "mae_t": cfg.pretrained_t}
    out = dict(params)
    for net, path in mapping.items():
        if not path or net not in kinds:
            continue
        sd = strip_module_prefix(torch.load(path, map_location="cpu"))
        imported = import_cavmae(sd) if kinds[net] == "cav" else import_m3ae(sd)
        if getattr(cfg, "scan_blocks", False) and kinds[net] == "m3ae":
            from mla_tpu.parallel.pp import to_scan_layout
            imported = to_scan_layout(imported)

        def merge(dst, src, where=net):
            # strict=False semantics (basic_model.py:113-117): keys the model
            # does not have (e.g. a finetuned ckpt's mlp_head when the
            # encoder is built with_head=False) are DROPPED, never inserted —
            # inserting them would desync params from the opt_state pytree
            dst = dict(dst)
            for k, v in src.items():
                if k not in dst:
                    print(f"  skip {where}.{k}: not in the model")
                elif isinstance(v, dict):
                    dst[k] = merge(dst[k], v, f"{where}.{k}")
                elif tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    print(f"  skip {where}.{k}: shape "
                          f"{np.shape(v)} != {np.shape(dst[k])}")
                else:
                    dst[k] = v
            return dst

        out[net] = merge(out[net], imported)
        print(f"Loaded pretrained {net} from {path}")
    return out
