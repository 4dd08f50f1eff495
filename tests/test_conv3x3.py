"""Pallas width-window 3x3 conv (ops/conv3x3.py) vs lax.conv.

The kernel replaces XLA's conv codegen on ResNet-18's stride-1 body convs
(reference backbone.py:149-158); these pin its numerics (fp32-exact in
interpret mode, bf16 at the TPU DEFAULT-precision tolerance), the custom
VJP, the packed-weight law, the fallback scope, and the model-level wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.ops.conv3x3 import (
    conv3x3, conv3x3_reference, conv3x3_vjp, pack_weights)


def _case(b, h, w, c, f=None, seed=0):
    rng = np.random.default_rng(seed)
    f = f or c
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, f)) / np.sqrt(9 * c),
                    jnp.float32)
    return x, k


class TestKernelParity:
    # C=64 exercises the 2-pixel pack (75%-dense weights) incl. an odd W
    # (the audio branch is 33x157); C>=128 the dense 1-pixel path.
    @pytest.mark.parametrize("b,h,w,c", [
        (3, 9, 10, 64), (2, 6, 7, 64), (2, 7, 7, 128), (2, 5, 6, 256)])
    @pytest.mark.parametrize("flatten", [True, False])
    def test_fp32_exact(self, b, h, w, c, flatten):
        x, k = _case(b, h, w, c)
        out = conv3x3(x, k, flatten=flatten, interpret=True,
                      compute_dtype=jnp.float32)
        np.testing.assert_allclose(out, conv3x3_reference(x, k),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_matches_bf16_reference(self):
        # the production path casts operands to bf16 (XLA's TPU DEFAULT
        # conv precision) and accumulates fp32 — compare against the same
        # law applied through lax.conv
        x, k = _case(2, 8, 9, 64)
        out = conv3x3(x, k, interpret=True)
        ref = conv3x3_reference(x, k, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(out, ref.astype(jnp.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_batch_not_divisible_by_block(self):
        x, k = _case(5, 6, 6, 64)
        out = conv3x3(x, k, interpret=True, compute_dtype=jnp.float32, bt=2)
        np.testing.assert_allclose(out, conv3x3_reference(x, k),
                                   rtol=2e-5, atol=2e-5)

    def test_vjp_matches_xla_grads(self):
        x, k = _case(2, 6, 7, 64, seed=1)

        def f(x, k):
            return jnp.sum(jnp.sin(conv3x3_vjp(x, k, True, jnp.float32)))

        def g(x, k):
            return jnp.sum(jnp.sin(conv3x3_reference(x, k)))

        gx, gk = jax.grad(f, (0, 1))(x, k)
        rx, rk = jax.grad(g, (0, 1))(x, k)
        np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gk, rk, rtol=1e-4, atol=1e-4)


class TestPackedWeights:
    def test_dense_pack1(self):
        _, k = _case(1, 3, 3, 128)
        wp = pack_weights(k, 1, jnp.float32)
        assert wp.shape == (3, 384, 128)
        np.testing.assert_array_equal(wp[1], np.asarray(k[1]).reshape(384, 128))

    def test_pack2_structure(self):
        # 6 of 8 64x64 blocks nonzero; out slot p taps window slots p..p+2
        # with dx = slot - p
        _, k = _case(1, 3, 3, 64)
        wp = np.asarray(pack_weights(k, 2, jnp.float32))
        assert wp.shape == (3, 256, 128)
        k = np.asarray(k)
        for dy in range(3):
            for p in range(2):
                for slot in range(4):
                    blk = wp[dy, slot * 64:(slot + 1) * 64,
                             p * 64:(p + 1) * 64]
                    dx = slot - p
                    if 0 <= dx <= 2:
                        np.testing.assert_array_equal(blk, k[dy, dx])
                    else:
                        assert not blk.any()


class TestScope:
    def test_ineligible_channels_fall_back(self):
        # C=32 and C!=F are out of the Pallas shape class -> lax path
        # (bit-identical to the reference by construction)
        for (c, f) in [(32, 32), (64, 128)]:
            x, k = _case(2, 5, 5, c, f)
            np.testing.assert_array_equal(
                conv3x3(x, k, interpret=False),
                conv3x3_reference(x, k))

    def test_model_wiring_param_tree_identical(self):
        # AVClassifier(pallas_conv=True) must expose the exact same param
        # tree as the nn.Conv version (checkpoint compatibility), and on CPU
        # (fallback) the exact same forward
        from mla_tpu.models.classifiers import AVClassifier
        kw = dict(n_classes=4, fusion_method="concat",
                  stages=(1, 1, 1, 1))
        batch = {
            "spec": jnp.asarray(
                np.random.default_rng(0).normal(size=(2, 1, 36, 40)),
                jnp.float32),
            "image": jnp.asarray(
                np.random.default_rng(1).normal(size=(2, 3, 1, 36, 36)),
                jnp.float32),
        }
        rng = jax.random.PRNGKey(0)
        m0 = AVClassifier(pallas_conv=False, **kw)
        m1 = AVClassifier(pallas_conv=True, **kw)
        v0 = m0.init(rng, batch, train=False)
        v1 = m1.init(rng, batch, train=False)
        assert jax.tree_util.tree_structure(v0) == \
            jax.tree_util.tree_structure(v1)
        for p0, p1 in zip(jax.tree_util.tree_leaves(v0),
                          jax.tree_util.tree_leaves(v1)):
            np.testing.assert_array_equal(p0, p1)
        o0 = m0.apply(v0, batch, train=False)
        o1 = m1.apply(v0, batch, train=False)
        for a, b in zip(jax.tree_util.tree_leaves(o0),
                        jax.tree_util.tree_leaves(o1)):
            np.testing.assert_array_equal(a, b)

    def test_config_flag(self):
        from mla_tpu.core.config import MLAConfig
        from mla_tpu.models.classifiers import resolve_pallas_conv
        cfg = MLAConfig(dataset="CREMAD", pallas_conv="on")
        assert resolve_pallas_conv(cfg)
        cfg = MLAConfig(dataset="CREMAD", pallas_conv="off")
        assert not resolve_pallas_conv(cfg)
        # auto == off everywhere since the round-5 on-chip negative result
        cfg = MLAConfig(dataset="CREMAD")
        assert not resolve_pallas_conv(cfg)
        with pytest.raises(ValueError):
            MLAConfig(dataset="CREMAD", pallas_conv="maybe").validate()


class TestMeshPartitioning:
    """Multi-chip legality (VERDICT r4 #5): under a device mesh the Pallas
    conv routes through conv3x3_sp (custom_partitioning, the
    ops/attention.py pattern) so GSPMD batch-shards it — each device runs
    the kernel on its local batch block, weights replicated — instead of
    treating the pallas_call as opaque and gathering around it."""

    def _mesh_vals(self, b=8, h=9, w=10, c=64):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mla_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(mesh_shape=(8, 1))
        x, k = _case(b, h, w, c)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ks = jax.device_put(k, NamedSharding(mesh, P()))
        return mesh, x, k, xs, ks

    def test_forward_sharded_equals_single(self):
        mesh, x, k, xs, ks = self._mesh_vals()
        f = jax.jit(lambda a, b: conv3x3(a, b, interpret=True,
                                         compute_dtype=jnp.float32))
        got = f(xs, ks)
        # output keeps the batch sharding (no involuntary resharding)
        assert "data" in str(got.sharding.spec)
        ref = conv3x3_reference(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_vjp_sharded_equals_single(self):
        from mla_tpu.ops.conv3x3 import conv3x3_vjp
        mesh, x, k, xs, ks = self._mesh_vals()

        def loss(a, b):
            return jnp.sum(conv3x3_vjp(a, b, True, jnp.float32) ** 2)

        gx, gk = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, ks)
        rx, rk = jax.grad(
            lambda a, b: jnp.sum(conv3x3_reference(a, b) ** 2),
            argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=2e-4, atol=2e-4)

    def test_no_gather_in_compiled_hlo(self):
        # the partitioner must not all-gather the batch around the kernel
        mesh, x, k, xs, ks = self._mesh_vals()
        f = jax.jit(lambda a, b: conv3x3(a, b, interpret=True,
                                         compute_dtype=jnp.float32))
        txt = f.lower(xs, ks).compile().as_text()
        assert "all-gather" not in txt, "GSPMD gathered the conv batch"
