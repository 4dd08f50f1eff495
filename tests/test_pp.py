"""Pipeline parallelism (parallel/pp.py): the S-stage GPipe schedule over
transformer blocks must match the sequential encoder bit-for-tolerance in
forward AND gradient, composed with DP on the (data, model) mesh. Goes
beyond the reference's DataParallel-only scaling (reference: main.py:732)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mla_tpu.models.layers import M3AEBlock
from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
from mla_tpu.parallel import pp
from mla_tpu.parallel.mesh import make_mesh

DEPTH, B, N, C, H = 4, 8, 16, 32, 4


def _fixtures():
    mesh = make_mesh(mesh_shape=(4, 2))
    block = M3AEBlock(emb_dim=C, num_heads=H, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    mask = (jax.random.uniform(jax.random.PRNGKey(9), (B, N)) > 0.8) \
        .astype(jnp.float32)
    params = {f"block_{i}": block.init(jax.random.PRNGKey(i), x,
                                       mask)["params"]
              for i in range(DEPTH)}
    return mesh, block, x, mask, params


def _sequential(block, params, x, mask):
    h = x
    for i in range(DEPTH):
        h = block.apply({"params": params[f"block_{i}"]}, h, mask)
    return h


class TestPipelineBlocks:
    def test_forward_matches_sequential(self):
        mesh, block, x, mask, params = _fixtures()
        ref = _sequential(block, params, x, mask)
        stacked = pp.shard_stacked(mesh, pp.stack_block_params(params, DEPTH))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, x_, m_: pp.pipeline_blocks(
            block, p, x_, m_, mesh, n_micro=2))(stacked, xs, ms)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grad_matches_sequential(self):
        mesh, block, x, mask, params = _fixtures()
        stacked = pp.shard_stacked(mesh, pp.stack_block_params(params, DEPTH))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))

        g_pp = jax.jit(jax.grad(lambda p, x_: jnp.sum(
            pp.pipeline_blocks(block, p, x_, ms, mesh, 2) ** 2)))(stacked, xs)
        g_seq = jax.grad(lambda p, x_: jnp.sum(
            _sequential(block, p, x_, mask) ** 2))(params, x)
        g_seq_stacked = pp.stack_block_params(g_seq, DEPTH)
        for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                        jax.tree_util.tree_leaves(g_seq_stacked)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_remat_grad_matches(self):
        """jax.checkpoint per block (remat=True) changes memory, not math."""
        mesh, block, x, mask, params = _fixtures()
        stacked = pp.shard_stacked(mesh, pp.stack_block_params(params, DEPTH))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        g = jax.jit(jax.grad(lambda p: jnp.sum(
            pp.pipeline_blocks(block, p, xs, ms, mesh, 2) ** 2)))(stacked)
        g_r = jax.jit(jax.grad(lambda p: jnp.sum(
            pp.pipeline_blocks(block, p, xs, ms, mesh, 2,
                               remat=True) ** 2)))(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-4)

    def test_stack_roundtrip(self):
        _, _, _, _, params = _fixtures()
        rt = pp.unstack_block_params(pp.stack_block_params(params, DEPTH),
                                     DEPTH)
        for a, b in zip(jax.tree_util.tree_leaves(rt),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_depth_not_divisible_raises(self):
        mesh, block, x, mask, params = _fixtures()
        three = {k: params[k] for k in list(params)[:3]}
        stacked = pp.stack_block_params(three, 3)  # 3 blocks, 2 stages
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        try:
            pp.pipeline_blocks(block, stacked, xs, ms, mesh, 2)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "not divisible" in str(e)


class TestPipelineEncoder:
    def test_full_encoder_matches(self):
        """embed -> pipelined blocks -> final norm == M3AEEncoder.__call__
        on a debug-size (2-block) encoder."""
        mesh = make_mesh(mesh_shape=(4, 2))
        cfg = M3AEConfig(model_type="debug", text_vocab_size=64)
        enc = M3AEEncoder(config=cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.standard_normal((B, 4, 768)), jnp.float32)
        text = jnp.asarray(rng.integers(0, 64, (B, 8)), jnp.int32)
        tmask = jnp.zeros((B, 8), jnp.float32).at[:, 6:].set(1.0)
        variables = enc.init(jax.random.PRNGKey(0), image, text, tmask)
        ref = enc.apply(variables, image, text, tmask)

        stacked = pp.shard_stacked(
            mesh, pp.stack_block_params(variables["params"], cfg.depth))
        sh = NamedSharding(mesh, P("data"))
        out = jax.jit(lambda v, s, i, t, m: pp.pipeline_m3ae_encoder(
            enc, v, s, i, t, m, mesh, n_micro=2))(
            variables, stacked, jax.device_put(image, sh),
            jax.device_put(text, sh), jax.device_put(tmask, sh))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
