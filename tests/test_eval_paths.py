"""Eval-path unit tests across regimes (valid() branches, main.py:486-679)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.evals.fusion_eval import fuse_outputs, per_sample_gating_weights
from mla_tpu.evals.metrics import make_eval_step, summarize_counts, top1_accuracy
from mla_tpu.models.classifiers import AVClassifier
from mla_tpu.train import optim
from mla_tpu.train.state import create_train_state


def _batch(rng, b=8):
    return {"spec": jnp.asarray(rng.standard_normal((b, 1, 64, 80)),
                                jnp.float32),
            "image": jnp.asarray(rng.standard_normal((b, 3, 1, 32, 32)),
                                 jnp.float32),
            "label": jnp.asarray(rng.integers(0, 6, b), jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


def _counts(cfg, model, batch):
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=8)
    ev = jax.jit(make_eval_step(model, cfg))
    return ev(state.params, state.batch_stats, batch)


class TestEvalBranches:
    def test_qmf_eval_energy_weighting(self):
        """QMF eval: fused = sum(out_m * logsumexp(out_m)/10) (main.py:544-586)."""
        rng = np.random.default_rng(0)
        cfg = MLAConfig(dataset="CREMAD", lorb="base",
                        modulation="QMF").validate()
        model = AVClassifier(n_classes=6, qmf=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        counts = _counts(cfg, model, _batch(rng))
        s = summarize_counts(counts)
        assert set(s) == {"acc", "acc_a", "acc_v"}
        assert all(0.0 <= v <= 1.0 for v in s.values())

    def test_joint_eval_sliced_modality_logits(self):
        rng = np.random.default_rng(1)
        cfg = MLAConfig(dataset="CREMAD", lorb="base").validate()
        model = AVClassifier(n_classes=6, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        counts = _counts(cfg, model, _batch(rng))
        assert float(jnp.sum(counts["num"])) == 8.0

    def test_gs_fixed_alpha_eval(self):
        rng = np.random.default_rng(2)
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        av_alpha=0.55).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        counts = _counts(cfg, model, _batch(rng))
        assert float(jnp.sum(counts["num"])) == 8.0

    def test_gs_dynamic_eval(self):
        rng = np.random.default_rng(3)
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        dynamic=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        counts = _counts(cfg, model, _batch(rng))
        assert np.isfinite(np.asarray(counts["acc"])).all()


class TestFuseOutputs:
    def test_fixed_alpha_3modal(self):
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        a_alpha=0.35, v_alpha=0.25, t_alpha=0.4,
                        gs_flag=True).validate()
        outs = {m: jnp.full((4, 4), i + 1.0)
                for i, m in enumerate("avt")}
        fused = fuse_outputs(outs, jnp.ones((4,)), cfg)
        # 0.35*1 + 0.25*2 + 0.4*3 = 2.05
        np.testing.assert_allclose(np.asarray(fused), 2.05, atol=1e-6)

    def test_fixed_alpha_2modal(self):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        av_alpha=0.55).validate()
        outs = {"a": jnp.ones((4, 6)), "v": jnp.ones((4, 6)) * 3}
        fused = fuse_outputs(outs, jnp.ones((4,)), cfg)
        np.testing.assert_allclose(np.asarray(fused), 0.55 + 0.45 * 3,
                                   atol=1e-6)

    def test_per_sample_gating_sums_to_one(self):
        rng = np.random.default_rng(4)
        outs = {m: jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
                for m in "av"}
        ws = per_sample_gating_weights(outs)
        total = sum(np.asarray(w) for w in ws.values())
        np.testing.assert_allclose(total, 1.0, atol=1e-5)

    def test_top1_accuracy(self):
        logits = jnp.asarray([[2.0, 1.0], [0.0, 5.0], [9.0, 0.0]])
        label = jnp.asarray([0, 1, 1])
        assert abs(float(top1_accuracy(logits, label)) - 2 / 3) < 1e-6
        assert float(top1_accuracy(logits, label,
                                   jnp.asarray([1.0, 1.0, 0.0]))) == 1.0


def test_ewc_flag_inert():
    """--ewc_flag is accepted but changes nothing (PARITY.md divergence #1).

    The reference never defines it (its eval-only branch AttributeErrors as
    shipped) and, if patched in, misbinds it into valid()'s gs_flag positional
    (main.py:957-963 vs main.py:486-488). We keep documented gs semantics."""
    rng = np.random.default_rng(7)
    batch = _batch(rng)
    model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
    base = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                     av_alpha=0.55)
    c0 = _counts(base.validate(), model, batch)
    c1 = _counts(base.replace(ewc_flag=True).validate(), model, batch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), c0, c1)


class TestParityRecipe:
    """`python -m mla_tpu.runtime.parity` (VERDICT r3 #6): the one-command
    real-data parity protocol, dry-run on the synthetic fixture tree so it
    is guaranteed runnable the day the real datasets / Zenodo ckpts appear.

    The checkpoint is a reference-format .pth (torch_export), so the run
    exercises the exact flow the protocol will use: .pth -> reference
    valid() on the reference's own model classes, AND .pth ->
    torch_import -> our driver eval — same test batches both sides."""

    @pytest.mark.mid
    def test_parity_cremad_dry(self, tmp_path):
        import json
        import os

        if not os.path.exists("/root/reference/main.py"):
            pytest.skip("reference tree not mounted")
        from mla_tpu.data import synthetic
        from mla_tpu.models.torch_export import save_torch_checkpoint
        from mla_tpu.runtime import parity
        from mla_tpu.train.state import create_train_state

        root = str(tmp_path / "cre")
        synthetic.make_cremad(root, n_train=8, n_test=8, spec_shape=(64, 80))
        # full (2,2,2,2) ResNet-18: the .pth must load into the
        # REFERENCE's own AVClassifier, whose topology is fixed
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        image_size=32, compute_dtype="float32",
                        batch_size=4, data_root=root).validate()
        model = AVClassifier(n_classes=6, gs_flag=True)
        rng = np.random.default_rng(3)
        batch = {"spec": jnp.asarray(
                     rng.standard_normal((4, 1, 64, 80)), jnp.float32),
                 "image": jnp.asarray(
                     rng.standard_normal((4, 3, 1, 32, 32)), jnp.float32),
                 "label": jnp.zeros(4, jnp.int32),
                 "idx": jnp.arange(4, dtype=jnp.int32),
                 "valid": jnp.ones(4, jnp.float32)}
        state = create_train_state(model, cfg,  batch,
                                   optim.make_spec(cfg), n_data=8)
        pth = str(tmp_path / "model.pth")
        save_torch_checkpoint(pth, state, cfg)

        out = str(tmp_path / "report.json")
        report = parity.main([
            "--dataset", "CREMAD", "--lorb", "base", "--gs_flag",
            "--data_root", root, "--ckpt_path", pth, "--batch_size", "4",
            "--image_size", "32", "--compute_dtype", "float32",
            "--out", out, "--tolerance", "0.3"])
        on_disk = json.loads(open(out).read())
        assert on_disk["pass"] is True
        # eval-at-init parity is EXACT (BASELINE.md): identical weights ->
        # identical accuracies, so the dry run must diff to 0.0 exactly
        assert report["diff_pct_points"]["acc"] == 0.0
        assert report["ours"]["acc"] == report["reference"]["acc"]

    def test_parity_requires_eval_mode(self, tmp_path):
        from mla_tpu.runtime import parity
        with pytest.raises(SystemExit, match="eval-only"):
            parity.main(["--train", "--dataset", "CREMAD", "--lorb", "base",
                         "--ckpt_path", "x.pth"])
        with pytest.raises(SystemExit, match="ckpt_path"):
            parity.main(["--dataset", "CREMAD", "--lorb", "base",
                         "--ckpt_path", str(tmp_path / "missing.pth")])
