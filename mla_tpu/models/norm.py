"""Masked BatchNorm: batch statistics over valid rows only.

Static-shape batching pads the final partial batch per epoch (README parity
note 6); plain BatchNorm would fold the zero-padded rows into that batch's
statistics. This module weights rows by a per-sample ``valid`` mask so the
one partial batch per epoch computes exactly the reference's statistics
(torch BN over the actual rows, reference backbone.py BatchNorm2d defaults:
eps 1e-5, momentum 0.1, unbiased running-var update, biased normalization).

Param/stat layout matches flax nn.BatchNorm (scale/bias params,
batch_stats mean/var) so checkpoints and the torch import shim are unchanged.
With valid=None the math reduces to standard global-batch BN.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MaskedBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9            # flax convention: running = m*running + (1-m)*batch
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid: Optional[jnp.ndarray] = None):
        """x: (N, ..., C); valid: (N,) 1.0 = real row (None = all valid)."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if valid is None:
                n = jnp.float32(np_prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            else:
                w = valid.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                per_row = float(np_prod(x.shape[1:-1]))
                n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0) \
                    * per_row
                mean = jnp.sum(xf * w, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(xf - mean) * w, axis=reduce_axes) / n
            if not self.is_initializing():
                # torch updates running_var with the UNBIASED estimator
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                new_mean = (self.momentum * ra_mean.value
                            + (1 - self.momentum) * mean)
                new_var = (self.momentum * ra_var.value
                           + (1 - self.momentum) * unbiased)
                if valid is not None:
                    # a batch with NO valid rows (possible as a --grad_accum
                    # microbatch made entirely of the loader's padding) must
                    # not step the running stats toward its clamped
                    # mean=0/var=0 — keep them unchanged instead
                    has_rows = jnp.sum(valid.astype(jnp.float32)) > 0
                    new_mean = jnp.where(has_rows, new_mean, ra_mean.value)
                    new_var = jnp.where(has_rows, new_var, ra_var.value)
                ra_mean.value = new_mean
                ra_var.value = new_var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out
