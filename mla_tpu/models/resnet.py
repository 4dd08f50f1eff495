"""ResNet-18 audio/visual backbones as Flax modules.

Reference: models/backbone.py:1-213 — from-scratch torchvision-style ResNet
(BasicBlock, no fc/avgpool), with a 1-channel conv1 stem for audio spectrograms
and 3-channel for visual (backbone.py:78-85); the visual forward folds T frames
into the batch axis: (B, C, T, H, W) -> (B*T, C, H, W) (backbone.py:142-147).

TPU-native choices: NHWC layout internally (XLA's preferred conv layout),
explicit torch-equivalent padding so spatial dims match the reference exactly,
BatchNorm with *global-batch* statistics under pjit (GSPMD reduces across the
data mesh axis inside the jitted step — the reference's DataParallel computes
per-replica stats; flag documented in SURVEY.md §7 hard-parts #4).

Init matches main.py:719's weight_init application: Conv kaiming-normal
(fan_out, relu), BN gamma=1 beta=0 (utils/utils.py:106-114).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.models.layers import kaiming_out
from mla_tpu.models.norm import MaskedBatchNorm
from mla_tpu.ops.conv3x3 import conv3x3_vjp

Dtype = Any


class PallasConv3x3(nn.Module):
    """Drop-in for the stride-1 3x3 nn.Conv sites: identical param tree
    ({name}/kernel, (3,3,C,F) HWIO, kaiming fan_out) but the forward/dx run
    the width-window Pallas kernel (ops/conv3x3.py) on TPU. The round-5
    on-chip envelope measured XLA AHEAD on every body shape (BASELINE.md
    round-5), so this engages only under --pallas_conv on (experiment
    switch; multi-chip legal via conv3x3_sp custom_partitioning). Off-TPU
    (CPU test tier, virtual meshes) it lowers to the same lax.conv as
    nn.Conv."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # param storage stays fp32 (nn.Conv's param_dtype default — same
        # checkpoint bytes); compute promotes to self.dtype like nn.Conv
        kernel = self.param(
            "kernel", kaiming_out,
            (3, 3, x.shape[-1], self.features), jnp.float32)
        return conv3x3_vjp(x.astype(self.dtype), kernel.astype(self.dtype))


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    pallas_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool, valid=None):
        # static dispatch: plain flax BN (single-pass stats) unless a padding
        # mask is present; both share param/stat names so the trees match.
        # Known deviation: flax updates running_var with the BIASED batch
        # variance while torch uses the unbiased estimator — a (n-1)/n
        # factor with n = B*H*W (~2e5 for CREMA-D stem), i.e. <1e-5
        # relative; MaskedBatchNorm (norm.py:63) applies the exact torch
        # correction for parity-critical runs (--masked_bn)
        if valid is None:
            bn = lambda name: (lambda y, _v: nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name)(y))
        else:
            bn = lambda name: MaskedBatchNorm(use_running_average=not train,
                                              momentum=0.9, epsilon=1e-5,
                                              dtype=self.dtype, name=name)
        needs_proj = self.stride != 1 or x.shape[-1] != self.filters
        residual = x
        # the stride-1 C==F 3x3s (13 of 16 in ResNet-18, ~85% of body FLOPs)
        # take the Pallas width-window kernel; strided/projection convs stay
        # on XLA (ops/conv3x3.py scope note)
        if self.pallas_conv and self.stride == 1:
            conv1 = PallasConv3x3(self.filters, self.dtype, name="conv1")
        else:
            conv1 = nn.Conv(
                self.filters, (3, 3),
                strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                kernel_init=kaiming_out, name="conv1")
        y = conv1(x)
        y = bn("bn1")(y, valid)
        y = nn.relu(y)
        if self.pallas_conv:
            conv2 = PallasConv3x3(self.filters, self.dtype, name="conv2")
        else:
            conv2 = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype,
                            kernel_init=kaiming_out, name="conv2")
        y = conv2(y)
        y = bn("bn2")(y, valid)
        if needs_proj:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_out, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, valid)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Returns the pre-pool (B, H', W', 512) feature map, like backbone.py."""
    modality: str = "visual"  # 'audio' (1-ch stem) | 'visual' (3-ch stem)
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32
    remat: bool = False       # rematerialize blocks in backward (trade FLOPs
                              # for activation HBM traffic)
    pallas_conv: bool = False  # route stride-1 3x3s through ops/conv3x3.py

    @nn.compact
    def __call__(self, x, train: bool = True, valid=None):
        # x: NHWC. Audio: (B, F, T, 1); visual frames already folded to
        # (B*T, H, W, 3) by the classifier (valid repeated per frame).
        # `valid` masks padded batch rows out of the BN statistics.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, kernel_init=kaiming_out,
                    name="conv1")(x)
        if valid is None:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        else:
            x = MaskedBatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name="bn1")(x, valid)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block_cls = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat \
            else BasicBlock
        for stage, n_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2 ** stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(filters, stride, dtype=self.dtype,
                              pallas_conv=self.pallas_conv,
                              name=f"layer{stage + 1}_{block}")(x, train, valid)
        return x


def fold_frames(visual_bcthw: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B*T, H, W, C) — the reference's frame fold
    (backbone.py:142-147) plus NCHW->NHWC."""
    b, c, t, h, w = visual_bcthw.shape
    x = jnp.transpose(visual_bcthw, (0, 2, 3, 4, 1))  # B T H W C
    return x.reshape(b * t, h, w, c)


def pool_audio(feat: jnp.ndarray) -> jnp.ndarray:
    """adaptive_avg_pool2d(.,1) + flatten (basic_model.py:61-65): (B,H,W,C)->(B,C)."""
    return jnp.mean(feat, axis=(1, 2))


def pool_visual(feat: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Unfold frames then adaptive_avg_pool3d: (B*T,H,W,C)->(B,C)."""
    bt, h, w, c = feat.shape
    t = bt // batch
    return jnp.mean(feat.reshape(batch, t, h, w, c), axis=(1, 2, 3))
