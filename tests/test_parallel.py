"""Data-parallel semantics on the 8-device CPU mesh (SURVEY.md §4):
the sharded MLA step must produce the same update as the unsharded one
(GSPMD inserts the gradient all-reduce; global-batch semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mla_tpu.core.config import MLAConfig
from mla_tpu.models.classifiers import AVClassifier
from mla_tpu.parallel import mesh as mesh_lib
from mla_tpu.train import optim, steps
from mla_tpu.train.state import create_train_state


def _batch(rng, b=16):
    return {"spec": jnp.asarray(rng.standard_normal((b, 1, 64, 80)),
                                jnp.float32),
            "image": jnp.asarray(rng.standard_normal((b, 3, 1, 32, 32)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 6, b), jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


class TestDataParallel:
    def test_mesh_shape(self):
        m = mesh_lib.make_mesh()
        assert m.shape["data"] == 8 and m.shape["model"] == 1

    def test_mesh_shape_validation(self):
        """Negative entries (numpy reshape-style -1) must error, not silently
        drop devices / build a 0-device mesh (review finding)."""
        import pytest
        with pytest.raises(ValueError, match=">= 1"):
            mesh_lib.make_mesh(mesh_shape=(-1, 1))
        with pytest.raises(ValueError, match=">= 1"):
            mesh_lib.make_mesh(mesh_shape=(8, -1))
        with pytest.raises(ValueError, match="needs"):
            mesh_lib.make_mesh(mesh_shape=(16, 1))

    def test_sp_pp_combination_rejected(self):
        """sp.constrain cannot apply inside pp's manual shard_map; the
        config layer rejects the combination up front (review finding)."""
        import pytest
        from mla_tpu.core.config import MLAConfig
        with pytest.raises(ValueError, match="seq_parallel is incompatible"):
            MLAConfig(dataset="Food101", lorb="m3ae", scan_blocks=True,
                      pp_microbatches=2, seq_parallel=True,
                      mesh_shape=(2, 2)).validate()

    @pytest.mark.mid
    def test_sharded_step_matches_unsharded(self):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        gs_rls=True, train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        rng = np.random.default_rng(0)
        batch = _batch(rng)
        spec = optim.make_spec(cfg)
        state0 = create_train_state(model, cfg, batch, spec)
        step_fn = steps.make_train_step(model, cfg, spec, len_dl=4)

        # single-device
        s1, m1 = jax.jit(step_fn)(state0, batch, jnp.float32(1e-3),
                                  jnp.int32(1), jnp.int32(0))

        # 8-device DP
        mesh = mesh_lib.make_mesh()
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        state_r = jax.device_put(state0, repl)
        batch_s = {k: jax.device_put(v, shard) for k, v in batch.items()}
        s8, m8 = jax.jit(step_fn, in_shardings=(repl, shard, None, None, None)
                         )(state_r, batch_s, jnp.float32(1e-3), jnp.int32(1),
                           jnp.int32(0))

        assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
        # collective reduction order differs from single-device summation;
        # bound is float32 noise (measured worst 2.2e-5 on conv kernels)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
        # GS projector identical too (feature means are global-batch)
        np.testing.assert_allclose(np.asarray(s1.gs.Pl), np.asarray(s8.gs.Pl),
                                   atol=1e-4)

    def test_padded_batch_matches_smaller_batch_eval(self):
        """valid-mask padding must reproduce the unpadded EVAL computation
        exactly (running BN stats: padded rows cannot leak). Train-path BN is
        a documented delta: padded rows enter batch statistics of the final
        partial batch (README parity notes)."""
        from mla_tpu.evals.metrics import make_eval_step
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        rng = np.random.default_rng(1)
        full = _batch(rng, b=8)
        small = {k: v[:5] for k, v in full.items()}
        padded = {k: jnp.concatenate([v[:5], jnp.zeros_like(v[5:])])
                  for k, v in full.items()}
        padded["valid"] = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)

        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, full, spec)
        ev = jax.jit(make_eval_step(model, cfg))
        c_small = ev(state.params, state.batch_stats, small)
        c_pad = ev(state.params, state.batch_stats, padded)
        for k in c_small:
            np.testing.assert_allclose(np.asarray(c_small[k]),
                                       np.asarray(c_pad[k]), atol=1e-5)
