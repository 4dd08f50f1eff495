"""MaskedBatchNorm: partial-batch statistics parity with torch BN over the
unpadded rows (closes README parity note 6 for the train path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mla_tpu.models.norm import MaskedBatchNorm


class TestMaskedBatchNorm:
    def test_all_padded_batch_leaves_running_stats_unchanged(self):
        """A batch with NO valid rows (possible as a --grad_accum microbatch
        made entirely of loader padding) must not step the running stats
        toward its clamped mean=0/var=0 (code-review r3 finding)."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 6, 6, 8)).astype(np.float32))
        m = MaskedBatchNorm(use_running_average=False)
        v = m.init(jax.random.key(0), x, jnp.ones((4,), jnp.float32))
        # warm the stats away from init with one real batch
        _, st = m.apply(v, x, jnp.ones((4,), jnp.float32),
                        mutable=["batch_stats"])
        v = {**v, "batch_stats": st["batch_stats"]}
        _, st2 = m.apply(v, x, jnp.zeros((4,), jnp.float32),
                         mutable=["batch_stats"])
        np.testing.assert_array_equal(
            np.asarray(st["batch_stats"]["mean"]),
            np.asarray(st2["batch_stats"]["mean"]))
        np.testing.assert_array_equal(
            np.asarray(st["batch_stats"]["var"]),
            np.asarray(st2["batch_stats"]["var"]))

    def test_valid_none_matches_flax_bn(self):
        import flax.linen as nn
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 6, 6, 8)).astype(np.float32))
        m = MaskedBatchNorm(use_running_average=False)
        v = m.init(jax.random.key(0), x)
        out, st = m.apply(v, x, mutable=["batch_stats"])
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        vr = ref.init(jax.random.key(0), x)
        outr, _ = ref.apply(vr, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(outr),
                                   atol=1e-5)

    def test_masked_stats_match_torch_on_valid_rows(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.standard_normal((8, 5, 5, 6)).astype(np.float32)
        x[5:] = 0.0  # padded rows
        valid = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
        m = MaskedBatchNorm(use_running_average=False)
        v = m.init(jax.random.key(0), jnp.asarray(x), valid)
        out, st = m.apply(v, jnp.asarray(x), valid, mutable=["batch_stats"])

        bn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
        with torch.no_grad():
            ref = bn(torch.tensor(x[:5].transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(out)[:5], ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)
        # running stats: torch unbiased var update
        np.testing.assert_allclose(np.asarray(st["batch_stats"]["mean"]),
                                   bn.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st["batch_stats"]["var"]),
                                   bn.running_var.numpy(), atol=1e-5)

    @pytest.mark.mid
    def test_padded_train_step_matches_small_batch(self):
        """With MaskedBatchNorm the padded MLA train step reproduces the
        unpadded one (loss and updated params)."""
        from mla_tpu.core.config import MLAConfig
        from mla_tpu.models.classifiers import AVClassifier
        from mla_tpu.train import optim, steps
        from mla_tpu.train.state import create_train_state
        rng = np.random.default_rng(2)
        full = {"spec": jnp.asarray(rng.standard_normal((8, 1, 32, 40)),
                                    jnp.float32),
                "image": jnp.asarray(rng.standard_normal((8, 3, 1, 32, 32)),
                                     jnp.float32),
                "label": jnp.asarray(rng.integers(0, 6, 8), jnp.int32),
                "idx": jnp.arange(8, dtype=jnp.int32),
                "valid": jnp.ones((8,), jnp.float32)}
        small = {k: v[:5] for k, v in full.items()}
        padded = {k: jnp.concatenate([v[:5], jnp.zeros_like(v[5:])])
                  for k, v in full.items()}
        padded["valid"] = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)

        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, masked_bn=True,
                             dtype=jnp.float32, stages=(1, 1, 1, 1))
        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, full, spec)
        step_fn = steps.make_train_step(model, cfg, spec, len_dl=4)
        s_small, m_small = jax.jit(step_fn)(state, small, jnp.float32(1e-3),
                                            jnp.int32(1), jnp.int32(0))
        s_pad, m_pad = jax.jit(step_fn)(state, padded, jnp.float32(1e-3),
                                        jnp.int32(1), jnp.int32(0))
        assert abs(float(m_small["loss"]) - float(m_pad["loss"])) < 1e-5
        np.testing.assert_allclose(
            np.asarray(s_small.params["audio_net"]["conv1"]["kernel"]),
            np.asarray(s_pad.params["audio_net"]["conv1"]["kernel"]),
            atol=1e-6)
