"""Fused LN->Dense kernels (ops/fused_block.py): reference-path exactness vs
flax.linen, interpret-mode kernel parity, and custom_vjp gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from mla_tpu.ops import fused_block as fb


def _data(n=48, c=64, f=96, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, c)), dtype)
    scale = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
    dbias = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    return x, scale, bias, kernel, dbias


class TestReferencePath:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_ln_reference_matches_flax(self, dtype):
        x, scale, bias, _, _ = _data(dtype=dtype)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
        want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
        got = fb.ln_reference(x, scale, bias, 1e-5)
        assert want.dtype == got.dtype
        np.testing.assert_array_equal(np.asarray(want, np.float32),
                                      np.asarray(got, np.float32))

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_dense_reference_matches_flax(self, dtype):
        x, _, _, kernel, dbias = _data(dtype=dtype)
        dense = nn.Dense(kernel.shape[1], dtype=dtype)
        want = dense.apply(
            {"params": {"kernel": kernel, "bias": dbias}}, x)
        got = fb.dense_reference(x, kernel, dbias)
        assert want.dtype == got.dtype
        np.testing.assert_array_equal(np.asarray(want, np.float32),
                                      np.asarray(got, np.float32))

    def test_dispatch_on_cpu_is_reference(self):
        x, scale, bias, kernel, dbias = _data()
        got = fb.ln_dense(x, scale, bias, kernel, dbias)
        want = fb._ln_dense_ref(x, scale, bias, kernel, dbias, 1e-5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_batched_shape(self):
        x, scale, bias, kernel, dbias = _data()
        x3 = x.reshape(4, 12, -1)
        got = fb.ln_dense(x3, scale, bias, kernel, dbias)
        assert got.shape == (4, 12, kernel.shape[1])
        flat = fb.ln_dense(x, scale, bias, kernel, dbias)
        np.testing.assert_array_equal(np.asarray(got).reshape(48, -1),
                                      np.asarray(flat))


class TestPallasInterpret:
    def test_fwd_matches_reference_fp32(self):
        x, scale, bias, kernel, dbias = _data()
        got = fb.ln_dense_pallas(x, scale, bias, kernel, dbias,
                                 interpret=True)
        want = fb._ln_dense_ref(x, scale, bias, kernel, dbias, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_fwd_matches_reference_bf16(self):
        x, scale, bias, kernel, dbias = _data(dtype=jnp.bfloat16)
        got = fb.ln_dense_pallas(x, scale, bias, kernel, dbias,
                                 interpret=True)
        want = fb._ln_dense_ref(x, scale, bias, kernel, dbias, 1e-5)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_row_padding(self):
        # n far from the row-block multiple exercises the pad/slice path
        x, scale, bias, kernel, dbias = _data(n=37)
        got = fb.ln_dense_pallas(x, scale, bias, kernel, dbias,
                                 interpret=True)
        want = fb._ln_dense_ref(x, scale, bias, kernel, dbias, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_vjp_matches_reference_grads(self):
        x, scale, bias, kernel, dbias = _data()
        old = fb._INTERPRET
        fb._INTERPRET = True
        try:
            def f_fused(x, s, b, k, d):
                return jnp.sum(jnp.sin(
                    fb._ln_dense_fused(x, s, b, k, d, 1e-5, jnp.dtype(x.dtype))
                    .astype(jnp.float32)))

            def f_ref(x, s, b, k, d):
                return jnp.sum(jnp.sin(
                    fb._ln_dense_ref(x, s, b, k, d, 1e-5)
                    .astype(jnp.float32)))

            got = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(
                x, scale, bias, kernel, dbias)
            want = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(
                x, scale, bias, kernel, dbias)
            for g, w, name in zip(got, want,
                                  ["dx", "dscale", "dbias", "dW", "dc"]):
                assert g.dtype == w.dtype, name
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
                    err_msg=name)
        finally:
            fb._INTERPRET = old

    def test_vjp_row_padding_grads(self):
        x, scale, bias, kernel, dbias = _data(n=37)
        old = fb._INTERPRET
        fb._INTERPRET = True
        try:
            got = jax.grad(lambda x: jnp.sum(
                fb._ln_dense_fused(x, scale, bias, kernel, dbias, 1e-5, jnp.dtype(x.dtype))))(x)
            want = jax.grad(lambda x: jnp.sum(
                fb._ln_dense_ref(x, scale, bias, kernel, dbias, 1e-5)))(x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)
        finally:
            fb._INTERPRET = old


class TestVMEMChooser:
    def test_vitb_shapes_fit(self):
        assert fb.ln_dense_fits(768, 3 * 768)    # norm1 -> qkv
        assert fb.ln_dense_fits(768, 4 * 768)    # norm2 -> fc1
        assert fb.ln_dense_fits(1024, 3 * 1024)  # large config

    def test_huge_weight_rejected(self):
        assert not fb.ln_dense_fits(8192, 4 * 8192)
