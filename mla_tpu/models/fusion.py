"""Fusion heads. Reference: models/fusion_modules.py:1-99.

ConcatFusion's single ``fc_out`` Linear is the *shared head* MLA trains
per-modality (half-/third-width input when gs_flag — basic_model.py:31-34).
FiLM and GatedFusion are defined for capability parity (the reference defines
but never constructs them — basic_model.py:35-38 passes).

Init: the reference applies weight_init (xavier-normal + zero bias,
utils/utils.py:106-110) ONLY to the non-clip AVClassifier (main.py:717-719);
every other classifier's heads keep torch nn.Linear's default
kaiming-uniform(a=sqrt(5)) weight + U(+-1/sqrt(fan_in)) bias — both are
U(+-1/sqrt(fan_in)) in closed form. `torch_default=True` reproduces that so
from-scratch runs start from the reference's weight distribution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.models.layers import xavier_normal

Dtype = Any

# torch kaiming_uniform_(a=sqrt(5)) on a Linear weight == U(+-1/sqrt(fan_in))
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch nn.Linear default bias: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / float(np.sqrt(fan_in))
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _dense(out_dim, dtype, name, torch_default=False, fan_in=None):
    if torch_default:
        return nn.Dense(out_dim, kernel_init=TORCH_KERNEL_INIT,
                        bias_init=torch_bias_init(fan_in), dtype=dtype,
                        name=name)
    return nn.Dense(out_dim, kernel_init=xavier_normal,
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class SumFusion(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32
    torch_default: bool = False

    @nn.compact
    def __call__(self, x, y):
        td = self.torch_default
        out = _dense(self.output_dim, self.dtype, "fc_x", td, x.shape[-1])(x) + \
              _dense(self.output_dim, self.dtype, "fc_y", td, y.shape[-1])(y)
        return x, y, out


class ConcatFusion(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32
    torch_default: bool = False

    @nn.compact
    def __call__(self, x, y):
        cat = jnp.concatenate([x, y], axis=1)
        out = _dense(self.output_dim, self.dtype, "fc_out",
                     self.torch_default, cat.shape[-1])(cat)
        return x, y, out


class ConcatFusion3(nn.Module):
    output_dim: int
    dtype: Dtype = jnp.float32
    torch_default: bool = False

    @nn.compact
    def __call__(self, x, y, z):
        cat = jnp.concatenate([x, y, z], axis=1)
        out = _dense(self.output_dim, self.dtype, "fc_out",
                     self.torch_default, cat.shape[-1])(cat)
        return x, y, z, out


class SharedHead(nn.Module):
    """The MLA shared head: one Linear applied to a single modality's features
    (reference: main.py:432,445 — fusion_module.fc_out(a) / (v))."""
    output_dim: int
    dtype: Dtype = jnp.float32
    torch_default: bool = False

    @nn.compact
    def __call__(self, feat):
        return _dense(self.output_dim, self.dtype, "fc_out",
                      self.torch_default, feat.shape[-1])(feat)


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
