"""Fusion heads. Reference: models/fusion_modules.py:1-99.

ConcatFusion's single ``fc_out`` Linear is the *shared head* MLA trains
per-modality (half-/third-width input when gs_flag — basic_model.py:31-34).
FiLM and GatedFusion are defined for capability parity (the reference defines
but never constructs them — basic_model.py:35-38 passes).

Init: xavier-normal weights + zero bias, matching weight_init
(utils/utils.py:106-110) which main.py:719 applies to AVClassifier.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.models.layers import xavier_normal

Dtype = Any


def _dense(out_dim, dtype, name):
    return nn.Dense(out_dim, kernel_init=xavier_normal,
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class SumFusion(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        out = _dense(self.output_dim, self.dtype, "fc_x")(x) + \
              _dense(self.output_dim, self.dtype, "fc_y")(y)
        return x, y, out


class ConcatFusion(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        out = _dense(self.output_dim, self.dtype, "fc_out")(
            jnp.concatenate([x, y], axis=1))
        return x, y, out


class ConcatFusion3(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, z):
        out = _dense(self.output_dim, self.dtype, "fc_out")(
            jnp.concatenate([x, y, z], axis=1))
        return x, y, z, out


class SharedHead(nn.Module):
    """The MLA shared head: one Linear applied to a single modality's features
    (reference: main.py:432,445 — fusion_module.fc_out(a) / (v))."""
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        return _dense(self.output_dim, self.dtype, "fc_out")(feat)


class FiLM(nn.Module):
    """FiLM conditioning (fusion_modules.py:38-67)."""
    dim: int
    output_dim: int
    x_film: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        film, to_be_film = (x, y) if self.x_film else (y, x)
        gb = _dense(2 * self.dim, self.dtype, "fc")(film)
        gamma, beta = jnp.split(gb, 2, axis=1)
        out = _dense(self.output_dim, self.dtype, "fc_out")(gamma * to_be_film + beta)
        return x, y, out


class GatedFusion(nn.Module):
    """Sigmoid-gated fusion (fusion_modules.py:70-99)."""
    dim: int
    output_dim: int
    x_gate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        out_x = _dense(self.dim, self.dtype, "fc_x")(x)
        out_y = _dense(self.dim, self.dtype, "fc_y")(y)
        if self.x_gate:
            out = _dense(self.output_dim, self.dtype, "fc_out")(
                nn.sigmoid(out_x) * out_y)
        else:
            out = _dense(self.output_dim, self.dtype, "fc_out")(
                out_x * nn.sigmoid(out_y))
        return out_x, out_y, out
