"""--opt_dtype / --accum_dtype: bf16 optimizer moments and bf16 grad-accum
carry — the state levers that fit the huge (1.34B) config's training state on
one 16 GB chip (BASELINE.md state cost model). Semantics pinned here:

  * moments compute in the param dtype, round to the storage dtype, and the
    ROUNDED value drives the param update — so a checkpoint-resume (which
    restores the stored buffer) replays the exact same update stream;
  * the accumulation carry rounds each partial sum at the scan boundary;
  * fp32 settings reproduce the original code paths bit-for-bit (all the
    astype calls are no-ops).

The reference has no analogue (torch.optim state is always fp32,
main.py:735-760); this is an opt-in beyond-parity memory knob.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.train import optim, steps
from mla_tpu.train.state import create_train_state


def _m3ae_batch(rng, b=8, t=16):
    return {"token": jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32),
            "padding_mask": jnp.zeros((b, t), jnp.float32)
                .at[:, 12:].set(1.0),
            "image": jnp.asarray(rng.standard_normal((b, 3, 32, 32)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 3, b), jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


def _run_steps(cfg, model, batch, n=3, seed=7):
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, seed=seed)
    step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=4))
    metrics = None
    for i in range(n):
        state, metrics = step(state, batch, jnp.float32(1e-2),
                              jnp.int32(i), jnp.int32(0))
    return state, metrics


class TestConfig:
    def test_bad_dtype_rejected(self):
        with pytest.raises(ValueError, match="opt_dtype"):
            MLAConfig(dataset="MVSA", lorb="m3ae", train=True,
                      opt_dtype="float16").validate()
        with pytest.raises(ValueError, match="accum_dtype"):
            MLAConfig(dataset="MVSA", lorb="m3ae", train=True, grad_accum=2,
                      batch_size=8, accum_dtype="fp8").validate()

    def test_accum_dtype_needs_grad_accum(self):
        with pytest.raises(ValueError, match="accum_dtype.*grad_accum"):
            MLAConfig(dataset="MVSA", lorb="m3ae", train=True,
                      accum_dtype="bfloat16").validate()


class TestLeafLaw:
    def test_sgd_round_then_apply(self):
        """The stored bf16 buffer drives the update: buf1 = bf16(mu*buf0 + d),
        p1 = p0 - lr*f32(buf1) — bitwise, so resume-from-ckpt replays it."""
        spec = optim.OptimizerSpec(kind="sgd", momentum=0.9,
                                   weight_decay=1e-4, state_dtype="bfloat16")
        rng = np.random.default_rng(0)
        p = {"w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)}
        g = {"w": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)}
        st = optim.init_opt_state(spec, p)
        assert st["momentum"]["w"].dtype == jnp.bfloat16
        # seed a nonzero buffer so the mu*buf term participates
        st = {"momentum": {"w": (st["momentum"]["w"] + 0.25)}}
        lr = jnp.float32(1e-2)
        new_p, new_st = optim.apply_updates(spec, p, g, st, lr)
        d = g["w"] + spec.weight_decay * p["w"]
        buf1 = (spec.momentum * st["momentum"]["w"].astype(jnp.float32)
                + d).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(new_st["momentum"]["w"]),
                                      np.asarray(buf1))
        np.testing.assert_array_equal(
            np.asarray(new_p["w"]),
            np.asarray(p["w"] - lr * buf1.astype(jnp.float32)))

    def test_adam_state_dtype_and_update_finite(self):
        spec = optim.OptimizerSpec(kind="adam", weight_decay=0.0,
                                   state_dtype="bfloat16")
        rng = np.random.default_rng(1)
        p = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)}
        g = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)}
        st = optim.init_opt_state(spec, p)
        assert st["m"]["w"].dtype == jnp.bfloat16
        assert st["v"]["w"].dtype == jnp.bfloat16
        assert st["t"]["w"].dtype == jnp.int32
        new_p, new_st = optim.apply_updates(spec, p, g, st, jnp.float32(1e-3))
        assert new_st["m"]["w"].dtype == jnp.bfloat16
        assert new_st["v"]["w"].dtype == jnp.bfloat16
        assert int(new_st["t"]["w"]) == 1
        assert np.isfinite(np.asarray(new_p["w"])).all()
        # tracks the fp32-state update at bf16 rounding tolerance
        spec32 = optim.OptimizerSpec(kind="adam", weight_decay=0.0)
        p32, _ = optim.apply_updates(spec32, p, g,
                                     optim.init_opt_state(spec32, p),
                                     jnp.float32(1e-3))
        np.testing.assert_allclose(np.asarray(new_p["w"]),
                                   np.asarray(p32["w"]), atol=2e-5)

    def test_fp32_default_bitwise_unchanged(self):
        """state_dtype='float32' must reproduce the original update exactly
        (the astype calls are no-ops) — pinned against a by-hand replay of
        the pre-knob formula."""
        spec = optim.OptimizerSpec(kind="sgd")
        rng = np.random.default_rng(2)
        p = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)}
        g = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)}
        st = {"momentum": {"w": jnp.asarray(
            rng.standard_normal((8, 8)), jnp.float32)}}
        lr = jnp.float32(3e-3)
        new_p, new_st = optim.apply_updates(spec, p, g, st, lr)
        buf = spec.momentum * st["momentum"]["w"] + (
            g["w"] + spec.weight_decay * p["w"])
        np.testing.assert_array_equal(np.asarray(new_st["momentum"]["w"]),
                                      np.asarray(buf))
        np.testing.assert_array_equal(np.asarray(new_p["w"]),
                                      np.asarray(p["w"] - lr * buf))


class TestTrainStep:
    @pytest.mark.mid
    def test_mla_step_bf16_momentum_tracks_fp32(self):
        """Full MLA alternating step (ghost updates on): bf16 moments survive
        REAL/GHOST/SKIP modes — every momentum leaf stays bf16 through the
        jitted update — and 3-step params track the fp32-state run."""
        from mla_tpu.models.classifiers import M3AEClassifier
        common = dict(dataset="MVSA", lorb="m3ae", gs_flag=True,
                      ghost_updates=True, batch_size=8, train=True)
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=1024, dtype=jnp.float32)
        batch = _m3ae_batch(np.random.default_rng(3))
        s32, m32 = _run_steps(MLAConfig(**common).validate(), model, batch)
        s16, m16 = _run_steps(
            MLAConfig(opt_dtype="bfloat16", **common).validate(),
            model, batch)
        for leaf in jax.tree_util.tree_leaves(s16.opt_state["momentum"]):
            assert leaf.dtype == jnp.bfloat16
        assert abs(float(m32["loss"]) - float(m16["loss"])) < 5e-3
        for a, b in zip(jax.tree_util.tree_leaves(s32.params),
                        jax.tree_util.tree_leaves(s16.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    @pytest.mark.mid
    def test_accum_bf16_carry_tracks_fp32(self):
        """--grad_accum 4 with a bf16 carry: same trajectory as the fp32
        carry at rounding tolerance (each partial sum rounds once)."""
        from mla_tpu.models.classifiers import M3AEClassifier
        common = dict(dataset="MVSA", lorb="m3ae", gs_flag=True,
                      grad_accum=4, batch_size=8, train=True)
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=1024, dtype=jnp.float32)
        batch = _m3ae_batch(np.random.default_rng(4))
        s32, m32 = _run_steps(MLAConfig(**common).validate(), model, batch,
                              n=2)
        s16, m16 = _run_steps(
            MLAConfig(accum_dtype="bfloat16", **common).validate(),
            model, batch, n=2)
        # step-2 loss reflects step-1's slightly-rounded update
        assert abs(float(m32["loss"]) - float(m16["loss"])) < 1e-3
        for a, b in zip(jax.tree_util.tree_leaves(s32.params),
                        jax.tree_util.tree_leaves(s16.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    @pytest.mark.mid
    def test_checkpoint_roundtrip_preserves_bf16_state(self, tmp_path):
        """Orbax save/restore keeps the bf16 moment dtype, so a resumed run
        continues from the exact stored buffers (the round-then-apply law
        makes that sufficient for bitwise continuation)."""
        from mla_tpu.runtime import checkpoint as ckpt
        from mla_tpu.models.classifiers import M3AEClassifier
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", gs_flag=True,
                        opt_dtype="bfloat16", batch_size=8,
                        train=True).validate()
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=1024, dtype=jnp.float32)
        batch = _m3ae_batch(np.random.default_rng(5))
        state, _ = _run_steps(cfg, model, batch, n=1)
        path = ckpt.save_checkpoint(str(tmp_path), state,
                                    meta={"epoch": 0, "best_acc": 0.0},
                                    name="ck")
        spec = optim.make_spec(cfg)
        target = create_train_state(model, cfg, batch, spec, seed=9)
        restored = ckpt.restore_checkpoint(path, target)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            assert np.asarray(a).dtype == np.asarray(b).dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
