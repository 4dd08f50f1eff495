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
                                   q8_matmul_stacked,
                                   _choose_blocks, _divisors_desc)


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
            q8_matmul(x, q8[None], scale)
        with pytest.raises(ValueError, match="per-output-channel"):
            q8_matmul(x, q8, scale[:, :64])

    def test_leading_dims_flatten(self):
        """(B, S, K) inputs flatten into the GEMM row axis — the QDense
        call shape inside the ViT blocks."""
        x, q8, scale, _ = _case(6, 256, 128)
        x3 = x.reshape(2, 3, 256)
        got = q8_matmul(x3, q8, scale, block_n=128, block_k=128,
                        interpret=True)
        ref = q8_matmul(x, q8, scale, block_n=128, block_k=128,
                        interpret=True)
        assert got.shape == (2, 3, 128)
        np.testing.assert_array_equal(np.asarray(got).reshape(6, 128),
                                      np.asarray(ref))

    def test_row_blocked_large_batch(self):
        """rows > block_m row-blocks the grid; result matches the
        single-block law (ADVICE r3: rows pad to a multiple of 16)."""
        x, q8, scale, _ = _case(70, 256, 128, seed=5)
        got = q8_matmul(x, q8, scale, block_m=32, block_n=128,
                        block_k=128, interpret=True)
        exact = np.asarray(x) @ (np.asarray(q8, np.float32)
                                 * np.asarray(scale))
        np.testing.assert_allclose(np.asarray(got, np.float32), exact,
                                   rtol=2e-2, atol=2e-2)

    def test_fallback_on_untileable_shapes(self):
        """K=100 has no >=128 divisor -> jnp reference path, same law."""
        x, q8, scale, _ = _case(2, 100, 128)
        got = q8_matmul(x, q8, scale, interpret=True)
        ref = q8_matmul_reference(x, q8, scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_big_m_routes_to_dequant_dot(self, monkeypatch):
        """rows > 4 x block_m: the Pallas path would re-read the weight
        once per row block (> the dequant graph's flat ~5 bytes/weight —
        measured losing at the huge b=16 rung, BASELINE.md round-5), so
        the GEMM routes to the reference. a8 stays Pallas at every row
        count (its fallback loses the int8 MXU rate, not just a read law).
        Both asserted structurally via a poisoned kernel entry."""
        import mla_tpu.ops.q8_matmul as q8mod
        x, q8, scale, _ = _case(160, 256, 128, seed=6)

        def boom(*a, **k):
            raise AssertionError("Pallas path taken for big-M non-a8 GEMM")

        monkeypatch.setattr(q8mod, "_q8_matmul_pallas", boom)
        got = q8_matmul(x, q8, scale, block_m=32, interpret=True)
        ref = q8_matmul_reference(x, q8, scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        monkeypatch.undo()
        # a8 at the same rows: Pallas path still engages
        called = {}
        orig = q8mod._q8_matmul_pallas

        def spy(*a, **k):
            called["yes"] = True
            return orig(*a, **k)

        monkeypatch.setattr(q8mod, "_q8_matmul_pallas", spy)
        q8_matmul(x, q8, scale, block_m=32, interpret=True, a8=True)
        assert called.get("yes"), "a8 big-M GEMM left the Pallas path"

    def test_stacked_big_m_routes_to_dequant_dot(self, monkeypatch):
        """Same crossover law for the stacked kernel: big-M rungs slice the
        layer and run the dequant dot instead of the scalar-prefetch read."""
        import mla_tpu.ops.q8_matmul as q8mod
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(160, 256)), jnp.float32)
        q8 = jnp.asarray(rng.integers(-127, 128, (3, 256, 128)), jnp.int8)
        scale = jnp.asarray(rng.uniform(1e-3, 2e-2, (3, 128)), jnp.float32)

        def boom(*a, **k):
            raise AssertionError("Pallas path taken for big-M stacked GEMM")

        monkeypatch.setattr(q8mod, "_q8_stacked_pallas", boom)
        got = q8_matmul_stacked(x, q8, scale, 1, block_m=32, interpret=True)
        ref = q8_matmul_reference(x, q8[1], scale[1].reshape(1, -1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_block_chooser(self):
        # whole-K, few-step blocks for the serving row counts
        bm, bk, bn = _choose_blocks(16, 1280, 3840, 512, 2048, 2048)
        assert bm == 16 and bk == 1280
        assert (1280 // bk) * (3840 // bn) <= 2
        # VMEM-constrained at big row blocks
        bm, bk, bn = _choose_blocks(4096, 1280, 3840, 512, 2048, 2048)
        assert bm == 512
        assert 2 * (bm * bk * 2) + 2 * bk * bn + bm * bn * 6 <= 10 * 2 ** 20
        # no 128-multiple divisor -> fallback
        assert _choose_blocks(8, 100, 128, 512, 2048, 2048) is None
        assert _divisors_desc(384, 512) == [384, 128]

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


class TestW8A8:
    """a8=True: per-row activation quantization + s8 x s8 int32 kernel
    (the --export_dtype int8_a8 serving law)."""

    @pytest.mark.parametrize("b,k,n", [(1, 256, 384), (16, 512, 256),
                                       (100, 384, 512)])
    def test_kernel_matches_a8_law(self, b, k, n):
        from mla_tpu.ops.q8_matmul import q8_matmul_a8_reference
        x, q8, scale, _ = _case(b, k, n)
        got = q8_matmul(x, q8, scale, block_n=128, block_k=128,
                        interpret=True, a8=True)
        assert got.shape == (b, n) and got.dtype == jnp.bfloat16
        law = np.asarray(q8_matmul_a8_reference(x, q8, scale), np.float32)
        # kernel output rounds to bf16 before the row scale (one extra
        # rounding vs the law's single fp32 product) — bf16-ulp band
        np.testing.assert_allclose(np.asarray(got, np.float32), law,
                                   rtol=1.6e-2, atol=1e-3)

    def test_error_bound_vs_fp32_truth(self):
        """W8A8 adds activation-quant error on top of the weight quant; the
        bound is still small relative to signal (~1% measured) and the
        argmax of logit-scale outputs is stable."""
        x, q8, scale, w = _case(8, 512, 64, seed=5)
        exact = np.asarray(x) @ w
        got = np.asarray(q8_matmul(x, q8, scale, block_n=128, block_k=128,
                                   interpret=True, a8=True), np.float32)
        rel = np.max(np.abs(got - exact)) / np.max(np.abs(exact))
        assert rel < 0.05, rel
        assert (got.argmax(-1) == exact.argmax(-1)).mean() >= 0.875

    def test_quantize_rows_law(self):
        from mla_tpu.ops.q8_matmul import quantize_rows
        x = jnp.asarray([[0.0, 0.0], [1.0, -2.0], [127.0, 1.0]], jnp.float32)
        xq, xs = quantize_rows(x)
        assert xq.dtype == jnp.int8 and xs.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(xq)[0], [0, 0])   # zero row
        np.testing.assert_array_equal(np.asarray(xq)[1], [64, -127])
        np.testing.assert_allclose(np.asarray(xs)[2], 1.0)
        np.testing.assert_array_equal(np.asarray(xq)[2], [127, 1])

    def test_a8_fallback_matches_law(self):
        from mla_tpu.ops.q8_matmul import q8_matmul_a8_reference
        x, q8, scale, _ = _case(2, 200, 96)       # untileable -> jnp path
        got = q8_matmul(x, q8, scale, a8=True)
        law = q8_matmul_a8_reference(x, q8, scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(law))


class TestQ8Stacked:
    """q8_matmul_stacked: layer `l` of an (L,K,N) int8 stack selected by
    Pallas scalar prefetch — the weight-read law for the scan-blocks int8
    serving graph (no HBM->HBM slice copy per layer)."""

    def _stack(self, L, k, n, seed=0):
        rng = np.random.default_rng(seed)
        w = (rng.normal(size=(L, k, n)) / np.sqrt(k)).astype(np.float32)
        amax = np.max(np.abs(w), axis=1, keepdims=True)
        scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        q8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q8), jnp.asarray(scale)

    def test_selects_each_layer(self):
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(3, 256, 128)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 256)),
                        jnp.bfloat16)
        for l in range(3):
            got = q8_matmul_stacked(x, q8, scale, l, block_m=16,
                                    block_n=128, block_k=128,
                                    interpret=True)
            ref = q8_matmul(x, q8[l], scale[l], block_n=128, block_k=128,
                            interpret=True)
            assert got.shape == ref.shape == (5, 128)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=1e-2, atol=1e-3)

    def test_traced_layer_index_under_scan(self):
        """The layer id may be a traced scalar (lax.scan xs) — the shape
        the serving graph uses."""
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(3, 256, 128, seed=2)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 256)),
                        jnp.bfloat16)

        @jax.jit
        def scan_sum(x, q8, scale):
            def body(acc, li):
                y = q8_matmul_stacked(x, q8, scale, li, block_m=16,
                                      block_n=128, block_k=128,
                                      interpret=True)
                return acc + y.astype(jnp.float32), None
            y0 = jnp.zeros((x.shape[0], q8.shape[-1]), jnp.float32)
            return jax.lax.scan(body, y0, jnp.arange(q8.shape[0]))[0]

        got = scan_sum(x, q8, scale)
        want = sum(np.asarray(q8_matmul_reference(x, q8[l], scale[l]),
                              np.float32) for l in range(3))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2,
                                   atol=2e-2)

    def test_leading_dims_and_validation(self):
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(2, 256, 128, seed=4)
        x3 = jnp.asarray(np.random.default_rng(5).normal(size=(2, 3, 256)),
                         jnp.bfloat16)
        got = q8_matmul_stacked(x3, q8, scale, 1, block_m=16, block_n=128,
                                block_k=128, interpret=True)
        assert got.shape == (2, 3, 128)
        with pytest.raises(ValueError, match="L,K,N"):
            q8_matmul_stacked(x3, q8[0], scale[0], 0)

    def test_fallback_untileable(self):
        """K with no >=128 divisor -> dynamic-index jnp reference."""
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(2, 100, 128, seed=6)
        x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 100)),
                        jnp.bfloat16)
        got = q8_matmul_stacked(x, q8, scale, 1)
        ref = q8_matmul_reference(x, q8[1], scale[1])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("oob,want", [(-5, 0), (7, 2)])
    def test_oob_layer_clamps_on_both_paths(self, oob, want):
        """One clamp law shared by the Pallas and jnp paths: an OOB layer id
        selects the nearest valid layer instead of diverging (the Pallas
        index maps would otherwise DMA from a raw OOB offset while the
        fallback's dynamic_index clamps)."""
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(3, 256, 128, seed=8)
        x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 256)),
                        jnp.bfloat16)
        # Pallas (interpret) path
        got_p = q8_matmul_stacked(x, q8, scale, oob, block_m=16,
                                  block_n=128, block_k=128, interpret=True)
        ref_p = q8_matmul_stacked(x, q8, scale, want, block_m=16,
                                  block_n=128, block_k=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
        # jnp fallback path (untileable K)
        q8u, scaleu = self._stack(3, 100, 128, seed=10)
        xu = jnp.asarray(np.random.default_rng(11).normal(size=(2, 100)),
                         jnp.bfloat16)
        got_f = q8_matmul_stacked(xu, q8u, scaleu, oob)
        ref_f = q8_matmul_stacked(xu, q8u, scaleu, want)
        np.testing.assert_array_equal(np.asarray(got_f), np.asarray(ref_f))


class TestQ8MlpStacked:
    """Fused stacked int8 MLP (fc1 -> exact GELU -> fc2 in one kernel)."""

    def _case(self, m=5, c=256, h=512, depth=3, seed=9):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
        w1 = rng.normal(size=(depth, c, h)).astype(np.float32) / np.sqrt(c)
        w2 = rng.normal(size=(depth, h, c)).astype(np.float32) / np.sqrt(h)
        # per-(layer, out-channel) scales, axis=1 is the contraction dim
        amax1 = np.max(np.abs(w1), axis=1, keepdims=True)
        sc1 = np.maximum(amax1 / 127.0, 1e-12).astype(np.float32)
        q8_1 = jnp.asarray(np.clip(np.round(w1 / sc1), -127, 127), jnp.int8)
        amax2 = np.max(np.abs(w2), axis=1, keepdims=True)
        sc2 = np.maximum(amax2 / 127.0, 1e-12).astype(np.float32)
        q8_2 = jnp.asarray(np.clip(np.round(w2 / sc2), -127, 127), jnp.int8)
        b1 = jnp.asarray(rng.normal(size=(h,)) * 0.02, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
        return x, q8_1, jnp.asarray(sc1), b1, q8_2, jnp.asarray(sc2), b2

    def test_fused_matches_reference_each_layer(self):
        from mla_tpu.ops.q8_matmul import q8_mlp_reference, q8_mlp_stacked
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case()
        for layer in range(3):
            got = q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, layer,
                                 interpret=True)
            ref = q8_mlp_reference(np.asarray(x), q8_1, s1, b1, q8_2, s2,
                                   b2, layer)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=3e-2, atol=3e-2)

    def test_big_m_falls_back_to_two_gemms(self, monkeypatch):
        """M > one row block: the fused kernel would lose x-residency, so
        the pair path (with its own crossover routing) takes over."""
        import mla_tpu.ops.q8_matmul as q8mod
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case(m=600)

        def boom(*a, **k):
            raise AssertionError("fused kernel taken for big-M MLP")

        monkeypatch.setattr(q8mod, "_q8_mlp_pallas", boom)
        got = q8mod.q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, 1,
                                   interpret=True)
        ref = q8mod.q8_mlp_reference(np.asarray(x), q8_1, s1, b1, q8_2,
                                     s2, b2, 1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2)

    def test_leading_dims_and_oob_clamp(self):
        from mla_tpu.ops.q8_matmul import q8_mlp_stacked
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case()
        x3 = jnp.stack([x, x + 0.5])          # (2, M, C)
        got = q8_mlp_stacked(x3, q8_1, s1, b1, q8_2, s2, b2, 0,
                             interpret=True)
        assert got.shape == (2, x.shape[0], x.shape[1])
        # OOB layer id clamps (shared law with q8_matmul_stacked)
        hi = q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, 99,
                            interpret=True)
        last = q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, 2,
                              interpret=True)
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(last))


class TestQ8StackedA8:
    """a8=True stacked law: s8 x s8 at the int8 MXU rate with in-place
    stacked weight reads — the --export_dtype int8_a8 scan-blocks path
    (models/layers.py QDense 3-D branch)."""

    def _stack(self, L, k, n, seed=3):
        rng = np.random.default_rng(seed)
        w = (rng.normal(size=(L, k, n)) / np.sqrt(k)).astype(np.float32)
        amax = np.max(np.abs(w), axis=1, keepdims=True)
        scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        q8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q8), jnp.asarray(scale)

    def test_matches_sliced_a8_reference_each_layer(self):
        from mla_tpu.ops.q8_matmul import (q8_matmul_a8_reference,
                                           q8_matmul_stacked)
        q8, scale = self._stack(3, 256, 384)
        x = jnp.asarray(np.random.default_rng(4).normal(size=(37, 256)),
                        jnp.float32)
        for l in range(3):
            got = q8_matmul_stacked(x, q8, scale, l, interpret=True,
                                    a8=True)
            ref = q8_matmul_a8_reference(x, q8[l],
                                         scale[l].reshape(1, -1))
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=2e-2, atol=2e-2)

    def test_a8_serves_every_row_count(self, monkeypatch):
        """Unlike the weight-only path, a8 has no dequant-dot crossover:
        big M still rides the Pallas grid (falling back would give up the
        int8 MXU rate, not just the weight-read law)."""
        import mla_tpu.ops.q8_matmul as q8mod
        q8, scale = self._stack(2, 256, 128)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(4200, 256)),
                        jnp.float32)

        def boom(*a, **k):
            raise AssertionError("a8 stacked fell back to the reference")

        monkeypatch.setattr(q8mod, "q8_matmul_a8_reference", boom)
        got = q8mod.q8_matmul_stacked(x, q8, scale, 1, interpret=True,
                                      a8=True)
        assert got.shape == (4200, 128)

    def test_oob_layer_clamps(self):
        from mla_tpu.ops.q8_matmul import q8_matmul_stacked
        q8, scale = self._stack(3, 256, 128)
        x = jnp.asarray(np.random.default_rng(6).normal(size=(5, 256)),
                        jnp.float32)
        hi = q8_matmul_stacked(x, q8, scale, 99, interpret=True, a8=True)
        last = q8_matmul_stacked(x, q8, scale, 2, interpret=True, a8=True)
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(last))


class TestQ8MlpStackedA8:
    """a8=True fused MLP: both GEMMs s8 x s8; the hidden tile re-quantizes
    per (row, column-tile) in VMEM — finer than the per-site per-row law,
    so the composed error stays within the per-site a8 bound."""

    _case = TestQ8MlpStacked._case

    def test_tracks_fp_oracle_and_a8_pair(self):
        from mla_tpu.ops.q8_matmul import (q8_matmul_stacked,
                                           q8_mlp_reference,
                                           q8_mlp_stacked)
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case(m=37)
        for layer in (0, 2):
            fused = q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, layer,
                                   interpret=True, a8=True)
            fp = q8_mlp_reference(x, q8_1, s1, b1, q8_2, s2, b2, layer)
            t = q8_matmul_stacked(x, q8_1, s1, layer, interpret=True,
                                  a8=True) + b1.astype(jnp.bfloat16)
            pair = q8_matmul_stacked(
                jax.nn.gelu(t, approximate=False), q8_2, s2, layer,
                interpret=True, a8=True) + b2.astype(jnp.bfloat16)
            for ref, bound in ((fp, 5e-2), (pair, 3e-2)):
                num = np.linalg.norm(np.asarray(fused, np.float32)
                                     - np.asarray(ref, np.float32))
                den = np.linalg.norm(np.asarray(ref, np.float32)) + 1e-9
                assert num / den < bound

    def test_multirow_grid_bit_equal_to_single_block(self):
        """The per-(row, tile) hidden quantization is independent of the
        row blocking, so any bm gives bit-identical output."""
        from mla_tpu.ops.q8_matmul import _q8_mlp_pallas
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case(m=200)
        multi = _q8_mlp_pallas(x, q8_1, s1, b1, q8_2, s2, b2, 1, 64, 128,
                               True, True)
        single = _q8_mlp_pallas(x, q8_1, s1, b1, q8_2, s2, b2, 1, 224,
                                128, True, True)
        np.testing.assert_array_equal(np.asarray(multi),
                                      np.asarray(single))

    def test_big_m_stays_fused(self, monkeypatch):
        """a8 keeps the fused kernel at every row count via the
        (m_steps, h_steps) grid — the weight-only big-M fallback would
        give up the int8 MXU rate."""
        import mla_tpu.ops.q8_matmul as q8mod
        x, q8_1, s1, b1, q8_2, s2, b2 = self._case(m=600)

        def boom(*a, **k):
            raise AssertionError("a8 fused MLP fell back to the pair")

        monkeypatch.setattr(q8mod, "q8_matmul_stacked", boom)
        got = q8mod.q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, 1,
                                   interpret=True, a8=True)
        assert got.shape == x.shape

    def test_bm_chooser(self):
        from mla_tpu.ops.q8_matmul import _mlp_bm_a8
        # huge b=16 shape: fewest passes with small padding
        got = _mlp_bm_a8(4112, 1280, 5120)
        assert got is not None
        bm, bh = got
        assert bm % 32 == 0 and 5120 % bh == 0
        steps = -(-4112 // bm)
        assert steps * bm - 4112 <= 4112 // 16
        # tiny rows: one block
        bm1, _ = _mlp_bm_a8(257, 1280, 5120)
        assert -(-257 // bm1) == 1
