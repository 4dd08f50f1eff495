"""Tensor parallelism (parallel/tp.py): a (data=4, model=2) mesh must give
the same MLA step as single-device, with transformer kernels actually
sharded over the model axis (SURVEY.md §5.8; beyond the reference's
DataParallel-only scaling, main.py:732)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mla_tpu.core.config import MLAConfig
from mla_tpu.models.classifiers import M3AEClassifier
from mla_tpu.parallel import tp
from mla_tpu.parallel.mesh import make_mesh
from mla_tpu.train import optim, steps
from mla_tpu.train.state import create_train_state


def _m3ae_batch(rng, b=8, n_classes=3):
    return {"token": jnp.asarray(rng.integers(0, 1000, (b, 16)), jnp.int32),
            "padding_mask": jnp.zeros((b, 16), jnp.float32)
                .at[:, 12:].set(1.0),
            "image": jnp.asarray(rng.standard_normal((b, 3, 32, 32)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, n_classes, b), jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


class TestPallasAttentionPartitioning:
    """custom_partitioning on the Pallas kernels: GSPMD must split the
    custom call over (batch, head) instead of gathering q/k/v around it."""

    def _operands(self, b=8, h=4, s=64, d=16):
        key = jax.random.PRNGKey(7)
        q, k, v, do = (jax.random.normal(jax.random.fold_in(key, i),
                                         (b, h, s, d)) for i in range(4))
        mask = (jax.random.uniform(key, (b, s)) > 0.8).astype(jnp.float32)
        return q, k, v, do, mask

    def test_forward_partitions_no_gather(self):
        from mla_tpu.ops import attention as A
        mesh = make_mesh(mesh_shape=(4, 2))
        q, k, v, _, mask = self._operands()
        sh = NamedSharding(mesh, P("data", "model"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        f = jax.jit(A.flash_attention_sp, static_argnums=(4,))
        out = f(qs, ks, vs, ms, True)
        ref = A.attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        assert out.sharding.spec == P("data", "model")
        hlo = f.lower(qs, ks, vs, ms, True).compile().as_text()
        assert "all-gather" not in hlo

    def test_sequence_sharded_operands_regathered(self):
        """A token/sequence-sharded k/v (what SP's residual sharding can
        propagate to) must be re-gathered by the partition rule — the kernel
        needs every key per shard; a per-shard softmax would be silently
        wrong (code-review r2 finding)."""
        from mla_tpu.ops import attention as A
        mesh = make_mesh(mesh_shape=(4, 2))
        q, k, v, _, mask = self._operands()
        seq_sh = NamedSharding(mesh, P("data", None, "model"))  # S sharded!
        qs, ks, vs = (jax.device_put(x, seq_sh) for x in (q, k, v))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data", "model")))
        out = jax.jit(A.flash_attention_sp, static_argnums=(4,))(
            qs, ks, vs, ms, True)
        ref = A.attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_backward_partitions_no_gather(self):
        from mla_tpu.ops import attention as A
        mesh = make_mesh(mesh_shape=(4, 2))
        q, k, v, do, mask = self._operands()
        sh = NamedSharding(mesh, P("data", "model"))
        qs, ks, vs, dos = (jax.device_put(x, sh) for x in (q, k, v, do))
        ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
        f = jax.jit(A.flash_attention_bwd_sp, static_argnums=(5,))
        dq, dk, dv = f(qs, ks, vs, dos, ms, True)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: A.attention_reference(q_, k_, v_, mask),
            q, k, v)
        rq, rk, rv = vjp(do)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4)
        assert dq.sharding.spec == P("data", "model")
        hlo = f.lower(qs, ks, vs, dos, ms, True).compile().as_text()
        assert "all-gather" not in hlo


class TestSequenceParallel:
    """Megatron-SP (parallel/sp.py): token-sharding the residual stream under
    TP must be numerically identical, and the between-block activations must
    really live token-sharded on the model axis. (The combine collective is
    XLA's choice — reduce-scatter on TPU, all-reduce + dynamic-slice on the
    CPU test backend — so the test pins the layout, not the op name.)"""

    def test_block_sp_matches_and_token_shards(self):
        from mla_tpu.models.layers import M3AEBlock
        from mla_tpu.parallel import sp
        mesh = make_mesh(mesh_shape=(4, 2))
        block = M3AEBlock(emb_dim=32, num_heads=4, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 32))
        params = block.init(jax.random.PRNGKey(1), x)
        ref = block.apply(params, x)

        params_tp = jax.tree_util.tree_map(
            jax.device_put, params, tp.state_shardings(mesh, params))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        assert sp.enable(mesh)
        try:
            out = jax.jit(block.apply)(params_tp, xs)
        finally:
            sp.disable()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        # residual stream leaves the block token-sharded over 'model'
        assert out.sharding.spec == P("data", "model")
        shard = out.addressable_shards[0].data
        assert shard.shape == (out.shape[0] // 4, out.shape[1] // 2,
                               out.shape[2])

    def test_enable_noop_without_model_axis(self):
        from mla_tpu.parallel import sp
        mesh = make_mesh(mesh_shape=(8, 1))
        assert not sp.enable(mesh)
        x = jnp.ones((2, 4, 8))
        assert sp.constrain(x) is x


class TestHostRowBlock:
    def test_model_axis_replicas_deduped(self):
        """(d, m>1) meshes replicate each data row-block across the model
        axis; host_row_block must dedupe instead of declaring the rows
        non-contiguous (code-review r2 finding)."""
        from mla_tpu.parallel import distributed
        from mla_tpu.parallel.mesh import batch_sharding, make_mesh as mk
        for shape in ((8, 1), (4, 2), (2, 4)):
            lo, hi = distributed.host_row_block(
                16, batch_sharding(mk(mesh_shape=shape)))
            assert (lo, hi) == (0, 16), (shape, lo, hi)


class TestTensorParallel:
    def test_leaf_rules(self):
        mesh = make_mesh(mesh_shape=(4, 2))
        fake = {"params": {"mae_v": {"block_0": {
            "attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                             "bias": jnp.zeros((24,))},
                     "proj": {"kernel": jnp.zeros((8, 8)),
                              "bias": jnp.zeros((8,))}},
            "mlp": {"fc1": {"kernel": jnp.zeros((8, 32))},
                    "fc2": {"kernel": jnp.zeros((32, 8))}}}},
            "odd": {"qkv": {"kernel": jnp.zeros((8, 9))}}}}  # 9 % 2 != 0
        sh = tp.state_shardings(mesh, fake)
        blk = sh["params"]["mae_v"]["block_0"]
        assert blk["attn"]["qkv"]["kernel"].spec == P(None, "model")
        assert blk["attn"]["qkv"]["bias"].spec == P("model")
        assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
        assert blk["attn"]["proj"]["bias"].spec == P()
        assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
        assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
        # non-divisible widths stay replicated, never error
        assert sh["params"]["odd"]["qkv"]["kernel"].spec == P()

    @pytest.mark.slow
    def test_tp_step_matches_single_device(self):
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", gs_flag=True,
                        train=True).validate()
        model = M3AEClassifier(n_classes=3, gs_flag=True,
                               model_type="debug", text_vocab_size=1024,
                               dtype=jnp.float32)
        rng = np.random.default_rng(0)
        batch = _m3ae_batch(rng)
        spec = optim.make_spec(cfg)
        state0 = create_train_state(model, cfg, batch, spec)
        step_fn = steps.make_train_step(model, cfg, spec, len_dl=4)

        s1, m1 = jax.jit(step_fn)(state0, batch, jnp.float32(1e-3),
                                  jnp.int32(1), jnp.int32(0))

        mesh = make_mesh(mesh_shape=(4, 2))
        state_tp = tp.shard_state(mesh, state0)
        # transformer kernels really live sharded on the model axis
        qkv = None
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                state_tp.params):
            names = tp._path_names(path)
            if names[-2:] == ["qkv", "kernel"]:
                qkv = leaf
                break
        assert qkv is not None
        assert qkv.sharding.spec == P(None, "model")
        assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2

        batch_s = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                   for k, v in batch.items()}
        s2, m2 = jax.jit(step_fn)(state_tp, batch_s, jnp.float32(1e-3),
                                  jnp.int32(1), jnp.int32(0))
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

        # + SP: token-sharded residual stream gives the same step too
        from mla_tpu.parallel import sp
        assert sp.enable(mesh)
        try:
            s3, m3 = jax.jit(step_fn)(tp.shard_state(mesh, state0), batch_s,
                                      jnp.float32(1e-3), jnp.int32(1),
                                      jnp.int32(0))
            assert abs(float(m1["loss"]) - float(m3["loss"])) < 1e-5
        finally:
            sp.disable()
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s3.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


class TestStackedTPRules:
    def test_leaf_rules_stacked(self):
        """--scan_blocks stacks block leaves to (L, ...) under 'blocks';
        TP rules must shard the trailing feature dims (ADVICE r2 — without
        3-D rules the whole stack silently replicated under a model axis)."""
        mesh = make_mesh(mesh_shape=(4, 2))
        L = 3
        fake = {"params": {"mae_v": {"blocks": {
            "attn": {"qkv": {"kernel": jnp.zeros((L, 8, 24)),
                             "bias": jnp.zeros((L, 24))},
                     "proj": {"kernel": jnp.zeros((L, 8, 8)),
                              "bias": jnp.zeros((L, 8))}},
            "mlp": {"fc1": {"kernel": jnp.zeros((L, 8, 32))},
                    "fc2": {"kernel": jnp.zeros((L, 32, 8))}}}}}}
        sh = tp.state_shardings(mesh, fake)
        blk = sh["params"]["mae_v"]["blocks"]
        assert blk["attn"]["qkv"]["kernel"].spec == P(None, None, "model")
        assert blk["attn"]["qkv"]["bias"].spec == P(None, "model")
        assert blk["attn"]["proj"]["kernel"].spec == P(None, "model", None)
        assert blk["attn"]["proj"]["bias"].spec == P()
        assert blk["mlp"]["fc1"]["kernel"].spec == P(None, None, "model")
        assert blk["mlp"]["fc2"]["kernel"].spec == P(None, "model", None)


class TestSubsetMeshValidation:
    def test_multihost_subset_excluding_a_process_raises(self, monkeypatch):
        """A subset mesh that strands a process with no devices must fail
        with a diagnostic, not a downstream loader IndexError (ADVICE r2)."""
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="no mesh device"):
            make_mesh(mesh_shape=(4, 1))  # CPU devices are all process 0

    def test_single_host_subset_ok(self):
        m = make_mesh(mesh_shape=(4, 1))
        assert m.shape["data"] == 4
