"""Classifier composition per (lorb, dataset, modal3, clip).

Reference: models/basic_model.py:1-322. Each classifier exposes a uniform
interface used by the jitted train/eval steps:

  encode(batch, modality, train)  -> (B, feat_dim) pooled features for one
                                     modality ('a' | 'v' | 't'; reference
                                     naming: for --lorb m3ae, 'a' is TEXT)
  head(feat)                      -> shared-head logits (MLA/gs path,
                                     main.py:432,445,457)
  __call__(batch, train)          -> joint forward dict:
                                     {'a','v'[,'t'],'out'} features+fused logits
                                     (or per-modality logits under QMF)

``batch`` is a dict with the standardized keys produced by mla_tpu.data:
  spec (B,1,F,T) | image (B,3,T,H,W) or (B,3,H,W) | token (B,L) |
  padding_mask (B,L) | fbank (B,1024,128) | token_feat/image_feat (B,512)

Head widths (basic_model.py:31-34,94-97,148-155,216-223): feat-width shared
head when gs_flag, concat width otherwise.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.models import fusion as fusion_lib
from mla_tpu.models.cav_mae import CAVMAEFT
from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
from mla_tpu.models.layers import xavier_normal
from mla_tpu.models.resnet import (ResNet18, fold_frames, pool_audio,
                                   pool_visual)
from mla_tpu.ops.image import patchify

Dtype = Any


def _make_fusion(fusion_method: str, gs_flag: bool, n_classes: int,
                 n_modalities: int, dtype, torch_default: bool = False):
    """fusion_module per basic_model.py:28-40 composition rules.

    torch_default: use torch nn.Linear's default init — the reference
    applies xavier weight_init only to the non-clip AVClassifier
    (main.py:717-719); every other family keeps torch defaults."""
    kw = dict(dtype=dtype, torch_default=torch_default, name="fusion_module")
    if fusion_method == "sum":
        return fusion_lib.SumFusion(n_classes, **kw)
    if fusion_method != "concat":
        raise NotImplementedError(
            f"fusion {fusion_method} declared but never constructed in the reference")
    if gs_flag:
        return fusion_lib.SharedHead(n_classes, **kw)
    if n_modalities == 3:
        return fusion_lib.ConcatFusion3(n_classes, **kw)
    return fusion_lib.ConcatFusion(n_classes, **kw)


def _qmf_head(n_classes, dtype, name, torch_default=False, fan_in=None):
    if torch_default:
        return nn.Dense(n_classes, kernel_init=fusion_lib.TORCH_KERNEL_INIT,
                        bias_init=fusion_lib.torch_bias_init(fan_in),
                        dtype=dtype, name=name)
    return nn.Dense(n_classes, kernel_init=xavier_normal,
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class _FusionMixin:
    """Shared joint-forward logic over encoded features."""

    def _gs_out(self, feats: Dict[str, jnp.ndarray]):
        """MLA/gs joint forward: features + per-modality shared-head logits
        (the driver applies fc_out per modality — main.py:432,445,457,636-639).
        Returning logits here also materializes head params at init time."""
        out = dict(feats)
        for m, f in feats.items():
            out[f"out_{m}"] = self.fusion_module(f)
        return out

    def _fuse(self, feats: Dict[str, jnp.ndarray]):
        if self.modal3:
            a, v, t = feats["a"], feats["v"], feats["t"]
            if self.fusion_method == "sum":
                raise NotImplementedError("sum fusion is 2-modal in the reference")
            _, _, _, out = self.fusion_module(a, v, t)
            return {"a": a, "v": v, "t": t, "out": out}
        a, v = feats["a"], feats["v"]
        _, _, out = self.fusion_module(a, v)
        return {"a": a, "v": v, "out": out}


class AVClassifier(nn.Module, _FusionMixin):
    """2x ResNet-18 (audio spectrogram / visual frames) — basic_model.py:14-77."""
    n_classes: int = 6
    fusion_method: str = "concat"
    gs_flag: bool = False
    qmf: bool = False
    dtype: Dtype = jnp.float32
    modal3: bool = False
    remat: bool = False
    masked_bn: bool = False   # exact partial-batch BN stats (config.masked_bn)
    stages: Sequence[int] = (2, 2, 2, 2)  # config.resnet_stages
    pallas_conv: bool = False  # config.pallas_conv (resolved in build)

    def setup(self):
        self.audio_net = ResNet18(modality="audio", dtype=self.dtype,
                                  stage_sizes=tuple(self.stages),
                                  remat=self.remat,
                                  pallas_conv=self.pallas_conv,
                                  name="audio_net")
        self.visual_net = ResNet18(modality="visual", dtype=self.dtype,
                                   stage_sizes=tuple(self.stages),
                                   remat=self.remat,
                                   pallas_conv=self.pallas_conv,
                                   name="visual_net")
        self.fusion_module = _make_fusion(self.fusion_method, self.gs_flag,
                                          self.n_classes, 2, self.dtype)
        if self.qmf:
            self.audio_fc = _qmf_head(self.n_classes, self.dtype, "audio_fc")
            self.visual_fc = _qmf_head(self.n_classes, self.dtype, "visual_fc")

    def encode(self, batch, modality: str, train: bool = True):
        valid = batch.get("valid") if (train and self.masked_bn) else None
        if modality == "a":
            spec = batch["spec"]                    # (B, 1, F, T)
            x = jnp.transpose(spec, (0, 2, 3, 1))   # NHWC
            return pool_audio(self.audio_net(x, train, valid))
        if modality == "v":
            image = batch["image"]                  # (B, 3, T, H, W)
            b, t = image.shape[0], image.shape[2]
            fvalid = None if valid is None else jnp.repeat(valid, t)
            return pool_visual(
                self.visual_net(fold_frames(image), train, fvalid), b)
        raise ValueError(modality)

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train: bool = True):
        a = self.encode(batch, "a", train)
        v = self.encode(batch, "v", train)
        if self.qmf:
            return {"a": self.audio_fc(a), "v": self.visual_fc(v)}
        if self.gs_flag:
            return self._gs_out({"a": a, "v": v})
        return self._fuse({"a": a, "v": v})


class CAVClassifier(nn.Module, _FusionMixin):
    """2x CAV-MAE-FT, mean-pooled tokens — basic_model.py:80-125."""
    n_classes: int = 6
    fusion_method: str = "concat"
    gs_flag: bool = False
    qmf: bool = False
    dtype: Dtype = jnp.float32
    modal3: bool = False
    audio_length: int = 1024
    img_size: int = 224
    cav_blocks: Tuple[int, int] = (11, 12)   # (msd, depth) CI knob

    def setup(self):
        msd, depth = self.cav_blocks
        self.mae_a = CAVMAEFT(self.n_classes, img_size=self.img_size,
                              audio_length=self.audio_length,
                              modality_specific_depth=msd, depth=depth,
                              dtype=self.dtype, name="mae_a")
        self.mae_v = CAVMAEFT(self.n_classes, img_size=self.img_size,
                              audio_length=self.audio_length,
                              modality_specific_depth=msd, depth=depth,
                              dtype=self.dtype, name="mae_v")
        self.fusion_module = _make_fusion(self.fusion_method, self.gs_flag,
                                          self.n_classes, 2, self.dtype,
                                          torch_default=True)

    def encode(self, batch, modality: str, train: bool = True):
        if modality == "a":
            return self.mae_a.forward_feat(batch["fbank"], None, "a").mean(axis=1)
        if modality == "v":
            return self.mae_v.forward_feat(None, batch["image"], "v").mean(axis=1)
        raise ValueError(modality)

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train: bool = True):
        a = self.encode(batch, "a", train)
        v = self.encode(batch, "v", train)
        if self.gs_flag:
            return self._gs_out({"a": a, "v": v})
        return self._fuse({"a": a, "v": v})


class M3AEClassifier(nn.Module, _FusionMixin):
    """2x M3AE base: text-only + image-only — basic_model.py:127-200.

    Reference naming quirk kept: 'a' is the TEXT branch, 'v' the image branch.
    """
    n_classes: int = 101
    fusion_method: str = "concat"
    gs_flag: bool = False
    qmf: bool = False
    model_type: str = "base"
    dtype: Dtype = jnp.float32
    modal3: bool = False
    text_vocab_size: int = 30522   # BERT vocab (m3ae.py:317)
    scan_blocks: bool = False      # lax.scan block stack (fast compiles;
                                   # stacked 'blocks' param layout)
    scan_unroll: int = 1
    remat_blocks: bool = False     # jax.checkpoint each scanned block
    remat_policy: str = "full"     # 'full' | 'dots' (see M3AEConfig)

    def setup(self):
        cfg = M3AEConfig(model_type=self.model_type,
                         text_vocab_size=self.text_vocab_size,
                         scan_blocks=self.scan_blocks,
                         scan_unroll=self.scan_unroll,
                         remat_blocks=self.remat_blocks,
                         remat_policy=self.remat_policy)
        self.mae_a = M3AEEncoder(cfg, dtype=self.dtype, name="mae_a")
        self.mae_v = M3AEEncoder(cfg, dtype=self.dtype, name="mae_v")
        self.fusion_module = _make_fusion(self.fusion_method, self.gs_flag,
                                          self.n_classes, 2, self.dtype,
                                          torch_default=True)
        if self.qmf:
            self.audio_fc = _qmf_head(self.n_classes, self.dtype, "audio_fc",
                                      torch_default=True, fan_in=cfg.emb_dim)
            self.visual_fc = _qmf_head(self.n_classes, self.dtype,
                                       "visual_fc", torch_default=True,
                                       fan_in=cfg.emb_dim)

    def encode(self, batch, modality: str, train: bool = True):
        if modality == "a":
            token = batch["token"].reshape(batch["token"].shape[0], -1)
            pm = batch["padding_mask"].reshape(token.shape)
            return self.mae_a(None, token, pm).mean(axis=1)
        if modality == "v":
            patches = patchify(batch["image"], 16)   # basic_model.py:184-186
            return self.mae_v(patches, None, None).mean(axis=1)
        raise ValueError(modality)

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train: bool = True):
        a = self.encode(batch, "a", train)
        v = self.encode(batch, "v", train)
        if self.qmf:
            return {"a": self.audio_fc(a), "v": self.visual_fc(v)}
        if self.gs_flag:
            return self._gs_out({"a": a, "v": v})
        return self._fuse({"a": a, "v": v})


class Modal3Classifier(nn.Module, _FusionMixin):
    """CAV-MAE audio + M3AE image + M3AE text — basic_model.py:202-275."""
    n_classes: int = 4
    fusion_method: str = "concat"
    gs_flag: bool = False
    qmf: bool = False
    model_type: str = "base"
    dtype: Dtype = jnp.float32
    modal3: bool = True
    audio_length: int = 1024
    cav_blocks: Tuple[int, int] = (11, 12)   # (msd, depth) CI knob
    scan_blocks: bool = False
    scan_unroll: int = 1
    remat_blocks: bool = False     # jax.checkpoint each scanned block
    remat_policy: str = "full"     # 'full' | 'dots' (see M3AEConfig)

    def setup(self):
        cfg = M3AEConfig(model_type=self.model_type,
                         scan_blocks=self.scan_blocks,
                         scan_unroll=self.scan_unroll,
                         remat_blocks=self.remat_blocks,
                         remat_policy=self.remat_policy)
        self.mae_a = CAVMAEFT(self.n_classes, audio_length=self.audio_length,
                              modality_specific_depth=self.cav_blocks[0],
                              depth=self.cav_blocks[1],
                              dtype=self.dtype, name="mae_a")
        self.mae_v = M3AEEncoder(cfg, dtype=self.dtype, name="mae_v")
        self.mae_t = M3AEEncoder(cfg, dtype=self.dtype, name="mae_t")
        self.fusion_module = _make_fusion(self.fusion_method, self.gs_flag,
                                          self.n_classes, 3, self.dtype,
                                          torch_default=True)
        if self.qmf:
            self.audio_fc = _qmf_head(self.n_classes, self.dtype, "audio_fc",
                                      torch_default=True, fan_in=768)
            self.visual_fc = _qmf_head(self.n_classes, self.dtype,
                                       "visual_fc", torch_default=True,
                                       fan_in=cfg.emb_dim)
            self.txtual_fc = _qmf_head(self.n_classes, self.dtype,
                                       "txtual_fc", torch_default=True,
                                       fan_in=cfg.emb_dim)

    def encode(self, batch, modality: str, train: bool = True):
        if modality == "a":
            return self.mae_a.forward_feat(batch["fbank"], None, "a").mean(axis=1)
        if modality == "v":
            patches = patchify(batch["image"], 16)
            return self.mae_v(patches, None, None).mean(axis=1)
        if modality == "t":
            token = batch["token"].reshape(batch["token"].shape[0], -1)
            pm = batch["padding_mask"].reshape(token.shape)
            return self.mae_t(None, token, pm).mean(axis=1)
        raise ValueError(modality)

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train: bool = True):
        a = self.encode(batch, "a", train)
        v = self.encode(batch, "v", train)
        t = self.encode(batch, "t", train)
        if self.qmf:
            return {"a": self.audio_fc(a), "v": self.visual_fc(v),
                    "t": self.txtual_fc(t)}
        if self.gs_flag:
            return self._gs_out({"a": a, "v": v, "t": t})
        return self._fuse({"a": a, "v": v, "t": t})


class CLIPClassifier(nn.Module, _FusionMixin):
    """Fusion over precomputed 512-d CLIP features — basic_model.py:278-319."""
    n_classes: int = 101
    fusion_method: str = "concat"
    gs_flag: bool = False
    qmf: bool = False
    dtype: Dtype = jnp.float32
    modal3: bool = False

    def setup(self):
        self.fusion_module = _make_fusion(self.fusion_method, self.gs_flag,
                                          self.n_classes, 2, self.dtype,
                                          torch_default=True)

    def encode(self, batch, modality: str, train: bool = True):
        if modality == "a":
            return batch["token_feat"].reshape(batch["token_feat"].shape[0], -1)
        if modality == "v":
            return batch["image_feat"].reshape(batch["image_feat"].shape[0], -1)
        raise ValueError(modality)

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train: bool = True):
        a = self.encode(batch, "a", train)
        v = self.encode(batch, "v", train)
        if self.gs_flag:
            return self._gs_out({"a": a, "v": v})
        return self._fuse({"a": a, "v": v})


def build_classifier(cfg: MLAConfig, dtype=None) -> nn.Module:
    """Model-select mirroring main.py:706-718."""
    dtype = dtype or jnp.dtype(cfg.compute_dtype)
    kw = dict(n_classes=cfg.n_classes, fusion_method=cfg.fusion_method,
              gs_flag=cfg.gs_flag,
              # gs takes precedence: the reference's gs branch never touches
              # the QMF heads at train or eval (main.py:419-485, 617-639)
              qmf=cfg.modulation == "QMF" and not cfg.gs_flag, dtype=dtype)
    if cfg.lorb == "large":
        kw.pop("qmf")
        return CAVClassifier(img_size=cfg.image_size or 224,
                             audio_length=cfg.audio_length,
                             cav_blocks=tuple(cfg.cav_blocks), **kw)
    if cfg.lorb == "m3ae":
        kw["scan_blocks"] = cfg.scan_blocks
        kw["scan_unroll"] = cfg.scan_unroll
        kw["remat_blocks"] = cfg.remat_blocks
        kw["remat_policy"] = cfg.remat_policy
        kw["model_type"] = cfg.m3ae_size
        if cfg.modal3:
            return Modal3Classifier(audio_length=cfg.audio_length,
                                    cav_blocks=tuple(cfg.cav_blocks), **kw)
        return M3AEClassifier(**kw)
    if cfg.clip:
        return CLIPClassifier(**kw)
    return AVClassifier(masked_bn=cfg.masked_bn,
                        stages=tuple(cfg.resnet_stages),
                        pallas_conv=resolve_pallas_conv(cfg), **kw)


def resolve_pallas_conv(cfg: MLAConfig) -> bool:
    """'auto' resolves to OFF: the round-5 on-chip envelope (BASELINE.md
    round-5; benchmarks/bench_conv.py, bf16) measured XLA's conv ahead of the
    Pallas width-window kernel on every ResNet body shape — vis_l1 43.4 vs
    29.5 TF/s, vis_l2 64.6 vs 40.1, vis_l4 49.7 vs 49.3, aud_l1 25.6 vs 16.8
    — and the flagship CREMA-D step regressed 49.1 -> 90.2 ms with the kernel
    engaged. XLA's implicit-GEMM conv already tiles these shapes onto the MXU
    with better input reuse than the width-window formulation's halo reloads.
    The kernel stays available as a measured experiment via 'on' (the op
    still falls back off-TPU or on ineligible shapes — ops/conv3x3.py).
    Multi-chip is legal: under a device mesh the op routes through
    conv3x3_sp (custom_partitioning, batch-sharded per device — the
    ops/attention.py pattern), certified by the dryrun_dp_conv leg and
    tests/test_conv3x3.py TestMeshPartitioning."""
    return cfg.pallas_conv == "on"


def modalities_of(cfg: MLAConfig):
    return ("a", "v", "t") if cfg.modal3 else ("a", "v")
