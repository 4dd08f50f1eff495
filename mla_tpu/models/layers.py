"""Shared Flax building blocks for the ViT encoders.

Two block flavors exist in the reference:
  - M3AE pre-LN block with qkv bias and -1e7 padding-mask attention
    (reference: models/m3ae.py:86-160)
  - CAV-MAE block = timm ViT block extended with per-modality LayerNorms
    selected by a ``modality`` argument (reference: models/cav_mae.py:86-113)

Both use the same fused attention core (mla_tpu/ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.ops.attention import fused_attention_qkv
from mla_tpu.ops.q8_matmul import q8_matmul, q8_matmul_stacked
from mla_tpu.parallel import sp

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
xavier_normal = nn.initializers.variance_scaling(1.0, "fan_avg", "normal")
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


# Trace-time switch (set by runtime/export.py around the int8_a8 serving
# trace, like parallel/sp.enable): when True, QDense's int8 path also
# quantizes activations per-row so the MXU runs s8 x s8 at the chip's int8
# rate (W8A8 — ops/q8_matmul.py a8).
q8_a8_enabled = False

# Per-site W8A8 opt-out (the export-time outlier guard,
# runtime/export.py:calibrate_a8): QDense sites whose "/".join(path) is in
# this set keep the weight-only dequant-fused GEMM even under
# q8_a8_enabled. Per-row symmetric activation quantization breaks exactly
# where activations carry outlier channels (one huge element coarsens the
# step for the whole row), so the guard measures each site on a calibration
# batch and bakes the fallback into the traced artifact.
q8_a8_skip = frozenset()

# Calibration hook: when not None, every a8-eligible QDense site reports
# (site_path, per-row max relative L2 error of A8 quantization) through a
# jax.debug.callback — fires per scan iteration under nn.scan, so a stacked
# site reports every layer and the recorder keeps the max.
q8_a8_report = None


def _a8_report_cb(site, rel):
    hook = q8_a8_report
    if hook is not None:
        hook(site, float(rel))


def _report_a8_relerr(site, inputs):
    """Calibration probe: the relative L2 error A8 row quantization would
    introduce at this site, reduced over rows to the worst case."""
    from mla_tpu.ops.q8_matmul import quantize_rows
    x2 = inputs.reshape(-1, inputs.shape[-1]).astype(jnp.float32)
    xq, xs = quantize_rows(x2)
    err = jnp.linalg.norm(xq.astype(jnp.float32) * xs[:, None] - x2,
                          axis=-1)
    rel = jnp.max(err / jnp.maximum(jnp.linalg.norm(x2, axis=-1), 1e-9))
    jax.debug.callback(functools.partial(_a8_report_cb, site), rel)

# Trace-time layer id for the stacked int8 serving path: when an int8
# scan-blocks artifact applies (models/m3ae.py:_q8_stacked_scan), QDense
# receives the FULL (L, K, N) int8 kernel stack and reads the current
# layer's tiles via Pallas scalar prefetch (ops/q8_matmul.py
# q8_matmul_stacked) — no per-layer HBM->HBM weight materialization. The
# scan body sets this to its loop-carried layer index (a tracer; consistent
# because lax.scan traces the body exactly once) before block.apply and
# restores it after.
q8_stacked_layer = None


class QDense(nn.Dense):
    """nn.Dense that serves int8 weights through the dequant-fused GEMM.

    Float path: bit-identical to nn.Dense (same param names/init, same
    promote_dtype + dot_general + bias add), so training and fp32/bf16
    serving are unchanged. When the restored 'kernel' is int8 — the
    --export_dtype int8 serving graph, where runtime/export.py:split_q8
    placed the quantized weight at the kernel position and its
    per-output-channel scale in the parallel 'q8' variable collection —
    the matmul routes through ops/q8_matmul.py so int8 is what streams
    from HBM (1 byte/weight vs the ~5 of a materialized in-graph dequant).
    """

    @nn.compact
    def __call__(self, inputs):
        restored = self.get_variable("params", "kernel") \
            if self.has_variable("params", "kernel") else None
        if restored is not None and restored.dtype == jnp.int8:
            # int8 kernels bypass self.param: a stacked (L, K, N) kernel
            # (the scan-blocks serving path) would fail flax's param shape
            # check, and serving never differentiates these leaves anyway.
            kernel = restored
        else:
            kernel = self.param("kernel", self.kernel_init,
                                (jnp.shape(inputs)[-1], self.features),
                                self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype) if self.use_bias else None
        if kernel.dtype == jnp.int8:
            scale = self.get_variable("q8", "kernel_scale")
            if kernel.ndim == 3:
                # full (L, K, N) stack: the traced layer id (set by
                # m3ae._q8_stacked_scan) selects tiles via scalar prefetch;
                # under int8_a8 the stacked GEMM runs s8 x s8 at the int8
                # MXU rate (same site-skip law as the 2-D branch)
                site = "/".join(self.path)
                a8 = q8_a8_enabled and site not in q8_a8_skip
                if a8 and q8_a8_report is not None:
                    _report_a8_relerr(site, inputs)
                y = q8_matmul_stacked(inputs, kernel, scale,
                                      q8_stacked_layer, a8=a8)
            else:
                site = "/".join(self.path)
                a8 = q8_a8_enabled and site not in q8_a8_skip
                if a8 and q8_a8_report is not None:
                    _report_a8_relerr(site, inputs)
                y = q8_matmul(inputs, kernel, scale, a8=a8)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.astype(self.dtype) if self.dtype is not None else y
        inputs, kernel, bias = self.promote_dtype(inputs, kernel, bias,
                                                  dtype=self.dtype)
        y = jax.lax.dot_general(
            inputs, kernel, (((inputs.ndim - 1,), (0,)), ((), ())),
            precision=self.precision)
        if bias is not None:
            y += jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


class MultiHeadAttention(nn.Module):
    """QKV projection -> fused masked attention -> output projection.

    Matches m3ae.Attention (m3ae.py:88-127) / timm Attention (cav_mae.py:16):
    single fused qkv Linear (bias per flavor), scale = head_dim**-0.5.
    """
    dim: int
    num_heads: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask: Optional[jnp.ndarray] = None):
        qkv = QDense(3 * self.dim, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="qkv")(x)
        # transpose-free: the fused GEMM output feeds the flat Pallas kernel
        # directly and the result lands in proj's layout (ops/attention.py
        # flat kernels; falls back to the (B,H,S,D) path off-TPU / under
        # TP/SP / at very long sequences — identical math)
        out = fused_attention_qkv(qkv, padding_mask, self.num_heads)
        return QDense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="proj")(out)


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2, hidden = mlp_ratio*dim (m3ae.TransformerMLP / timm Mlp)."""
    dim: int
    out_dim: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # int8 scan-blocks serving: when both kernels are stacked (L,.,.)
        # int8 and a traced layer id is live, the whole MLP runs as ONE
        # fused Pallas kernel (ops/q8_matmul.py q8_mlp_stacked) — half the
        # dispatches, hidden activation confined to VMEM. Under W8A8 the
        # fused kernel runs s8 x s8 at the int8 MXU rate when BOTH sites
        # passed calibration; a skipped site (or an active calibration
        # probe, which reports per QDense site) keeps the per-site path.
        fc1 = self.get_variable("params", "fc1") \
            if self.has_variable("params", "fc1") else None
        k1 = fc1.get("kernel") if isinstance(fc1, dict) else None
        if (k1 is not None and getattr(k1, "ndim", 0) == 3
                and k1.dtype == jnp.int8 and q8_stacked_layer is not None):
            a8 = False
            fused_ok = True
            if q8_a8_enabled:
                sites = ("/".join(self.path + ("fc1",)),
                         "/".join(self.path + ("fc2",)))
                a8 = all(s not in q8_a8_skip for s in sites)
                fused_ok = a8 and q8_a8_report is None
            if fused_ok:
                from mla_tpu.ops.q8_matmul import q8_mlp_stacked
                fc2 = self.get_variable("params", "fc2")
                y = q8_mlp_stacked(
                    x, k1, self.get_variable("q8", "fc1")["kernel_scale"],
                    fc1["bias"], fc2["kernel"],
                    self.get_variable("q8", "fc2")["kernel_scale"],
                    fc2["bias"], q8_stacked_layer, a8=a8)
                return y.astype(self.dtype) if self.dtype is not None else y
        x = QDense(self.mlp_ratio * self.dim, dtype=self.dtype,
                   kernel_init=xavier_uniform, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return QDense(self.out_dim, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="fc2")(x)


class M3AEBlock(nn.Module):
    """Pre-LN block, -1e7 padding-mask attention (m3ae.py:131-160).

    ``scan_cell=True`` returns the (carry, out) pair ``nn.scan`` expects, so
    the same module serves both the unrolled stack and the scanned one
    (M3AEEncoder scan_blocks; params stack on axis 0)."""
    emb_dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32
    scan_cell: bool = False

    @nn.compact
    def __call__(self, x, padding_mask=None):
        # SP (parallel/sp.py): the residual stream is token-sharded between
        # blocks; LN runs on local tokens, GSPMD gathers for qkv/fc1 and
        # reduce-scatters the row-parallel proj/fc2 outputs back.
        x = sp.constrain(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = MultiHeadAttention(self.emb_dim, self.num_heads, use_bias=True,
                               dtype=self.dtype, name="attn")(y, padding_mask)
        x = sp.constrain(x + y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.emb_dim, self.emb_dim, self.mlp_ratio, dtype=self.dtype,
                name="mlp")(y)
        out = sp.constrain(x + y)
        return (out, None) if self.scan_cell else out


class CAVBlock(nn.Module):
    """timm ViT block + per-modality norms (cav_mae.py:86-113).

    ``modality``: None -> shared norm1/norm2; 'a'/'v' -> norm1_a/norm2_a etc.
    Attention/MLP weights are shared across modalities; only the LNs switch.
    All six LayerNorms are declared eagerly (the reference constructs them all,
    cav_mae.py:90-101) so imported checkpoints always line up regardless of
    which modality paths a given run traces.
    """
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        # Params declared eagerly (not lazily-called submodules) so every
        # modality's LN exists in the tree no matter which path init traces.
        self.ln = {
            f"norm{i}{s}": (self.param(f"norm{i}{s}_scale", ones, (self.dim,)),
                            self.param(f"norm{i}{s}_bias", zeros, (self.dim,)))
            for i in (1, 2) for s in ("", "_a", "_v")
        }
        self.attn = MultiHeadAttention(self.dim, self.num_heads, use_bias=True,
                                       dtype=self.dtype, name="attn")
        self.mlp = Mlp(self.dim, self.dim, self.mlp_ratio, dtype=self.dtype,
                       name="mlp")

    def _ln(self, name, x):
        scale, bias = self.ln[name]
        mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)

    def __call__(self, x, modality: Optional[str] = None):
        suffix = "" if modality is None else f"_{modality}"
        x = sp.constrain(x)
        x = sp.constrain(x + self.attn(self._ln(f"norm1{suffix}", x)))
        x = sp.constrain(x + self.mlp(self._ln(f"norm2{suffix}", x)))
        return x
