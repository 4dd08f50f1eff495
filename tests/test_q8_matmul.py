"""Dequant-fused int8 GEMM (ops/q8_matmul.py).

The kernel's law: x @ (q8 * scale) with the per-output-channel scale
applied AFTER fp32 accumulation — exactly commutative with the export-time
quantization law (runtime/export.py:_quantize_int8), and at least as
accurate as the XLA dequant-then-bf16-dot path the int8 artifact runs
today (BASELINE.md int8 analysis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.ops.q8_matmul import (q8_matmul, q8_matmul_reference,
                                   _pick_block)


def _case(b, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) / np.sqrt(k)
    amax = np.max(np.abs(w), axis=0, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(x), jnp.asarray(q8), jnp.asarray(scale), w


class TestQ8Matmul:
    @pytest.mark.parametrize("b,k,n", [(1, 256, 384), (16, 512, 256),
                                       (5, 384, 128)])
    def test_kernel_matches_fp32_math(self, b, k, n):
        """Pallas (interpret) vs exact fp32 dequant-dot: bf16-rounding
        tolerance only."""
        x, q8, scale, _ = _case(b, k, n)
        got = q8_matmul(x, q8, scale, block_n=128, block_k=128,
                        interpret=True)
        assert got.shape == (b, n) and got.dtype == jnp.bfloat16
        exact = np.asarray(x) @ (np.asarray(q8, np.float32)
                                 * np.asarray(scale))
        np.testing.assert_allclose(np.asarray(got, np.float32), exact,
                                   rtol=2e-2, atol=2e-2)

    def test_kernel_at_least_as_accurate_as_xla_path(self):
        """fp32-accumulated, post-scaled kernel error <= the artifact's
        pre-scaled bf16-weight dot error (vs exact fp32), on aggregate."""
        x, q8, scale, _ = _case(8, 512, 512, seed=3)
        exact = np.asarray(x) @ (np.asarray(q8, np.float32)
                                 * np.asarray(scale))
        kern = np.asarray(q8_matmul(x, q8, scale, block_n=128, block_k=128,
                                    interpret=True), np.float32)
        xla = np.asarray(q8_matmul_reference(x, q8, scale), np.float32)
        assert np.mean(np.abs(kern - exact)) <= \
            np.mean(np.abs(xla - exact)) * 1.05

    def test_scale_shapes_and_validation(self):
        x, q8, scale, _ = _case(2, 256, 128)
        flat = q8_matmul(x, q8, scale.reshape(-1), block_n=128,
                         block_k=128, interpret=True)
        twod = q8_matmul(x, q8, scale, block_n=128, block_k=128,
                         interpret=True)
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(twod))
        with pytest.raises(ValueError, match="2-D"):
            q8_matmul(x[None], q8, scale)
        with pytest.raises(ValueError, match="per-output-channel"):
            q8_matmul(x, q8, scale[:, :64])

    def test_fallback_on_untileable_shapes(self):
        """K=100 has no >=128 divisor -> jnp reference path, same law."""
        x, q8, scale, _ = _case(2, 100, 128)
        got = q8_matmul(x, q8, scale, interpret=True)
        ref = q8_matmul_reference(x, q8, scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_pick_block(self):
        assert _pick_block(2560, 512) == 512
        assert _pick_block(10240, 512) == 512
        assert _pick_block(384, 512) == 128
        assert _pick_block(100, 512) == 0

    def test_matches_export_quantization_law(self):
        """End-to-end with the real exporter's quantizer: q8_matmul on its
        {'q8','scale'} output == the exported graph's dequant+dot within
        bf16 rounding."""
        from mla_tpu.runtime.export import _quantize_int8, dequantize_int8
        rng = np.random.default_rng(7)
        w = (rng.normal(size=(512, 256)) / 22.6).astype(np.float32)
        tree = _quantize_int8({"dense": {"kernel": w}})
        node = tree["dense"]["kernel"]
        assert set(node.keys()) == {"q8", "scale"}
        x = jnp.asarray(rng.normal(size=(4, 512)), jnp.float32)
        got = q8_matmul(x, jnp.asarray(node["q8"]),
                        jnp.asarray(node["scale"]), block_n=128,
                        block_k=128, interpret=True)
        wd = dequantize_int8(tree)["dense"]["kernel"]
        ref = jnp.dot(x.astype(jnp.bfloat16), wd)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
