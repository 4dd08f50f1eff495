"""Integration: full driver run (train -> eval -> best ckpt -> resume) on a
synthetic CREMA-D fixture tree, 8-device CPU mesh (SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mla_tpu.core.config import MLAConfig
from mla_tpu.data import synthetic


@pytest.fixture(scope="module")
def tiny_cremad(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cre"))
    # small spectrograms keep the CPU ResNet cheap
    synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
    return root


class TestDriver:
    @pytest.mark.mid
    def test_train_eval_checkpoint_resume_evalonly(self, tiny_cremad,
                                                   tmp_path):
        """One sequential driver flow: train 2 epochs -> best ckpt -> restore
        roundtrip -> eval-only re-run on the saved ckpt. (Merged into one test
        so the train step compiles once on this 1-core CI host; DP/TP mesh
        semantics are covered by test_parallel/test_tp and the driver-recorded
        dryrun — here a (2, 1) mesh keeps the sharded-loader path active.)"""
        from mla_tpu.runtime import checkpoint as ckpt_lib
        from mla_tpu.runtime.driver import run

        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True, image_size=32,
                        resnet_stages=(1, 1, 1, 1), mesh_shape=(2, 1),
                        train=True, epochs=2, batch_size=4,
                        data_root=tiny_cremad, ckpt_path=str(tmp_path / "ck"),
                        use_tensorboard=False, num_workers=2,
                        log_every=1).validate()
        state, result = run(cfg, max_steps_per_epoch=1)
        assert result["best_acc"] >= 0.0
        assert len(result["history"]) == 2
        ckpts = os.listdir(cfg.ckpt_path)
        assert any(n.startswith("best_model_of_dataset_CREMAD") for n in ckpts)

        # restore roundtrip preserves every state leaf (the dir also holds
        # the rolling 'last' checkpoint — pick the best-acc one)
        best = [n for n in ckpts if n.startswith("best_model")
                and not n.endswith(".json")][0]
        path = os.path.join(cfg.ckpt_path, best)
        restored = ckpt_lib.restore_checkpoint(path, state)
        assert int(restored.step) > 0
        meta = ckpt_lib.load_meta(path)
        assert meta["modulation"] == "Normal" and "acc" in meta

        # eval-only branch on the ckpt just written (main.py:946-953)
        eval_cfg = cfg.replace(train=False, ckpt_path=path)
        _, accs = run(eval_cfg)
        assert 0.0 <= accs["acc"] <= 1.0
        assert abs(accs["acc"] - result["best_acc"]) < 1e-6


class TestResume:
    @pytest.mark.mid
    def test_interrupted_resume_matches_uninterrupted(self, tiny_cremad,
                                                      tmp_path):
        """--resume continues from the rolling 'last' checkpoint; with the
        loader/PRNG streams keyed by (seed, epoch), an interrupted-then-
        resumed run must bit-match the uninterrupted one (VERDICT r2 #4).
        Exceeds the reference, which has no mid-run resume (main.py:916-953).
        """
        from mla_tpu.runtime.driver import run

        base = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                         image_size=32, resnet_stages=(1, 1, 1, 1),
                         mesh_shape=(2, 1), train=True, epochs=3,
                         batch_size=4, data_root=tiny_cremad,
                         ckpt_path=str(tmp_path / "full"),
                         use_tensorboard=False, num_workers=2,
                         log_every=10).validate()
        state_full, res_full = run(base, max_steps_per_epoch=1)

        part = base.replace(epochs=2, ckpt_path=str(tmp_path / "part"))
        run(part, max_steps_per_epoch=1)
        assert os.path.isdir(os.path.join(part.ckpt_path, "last"))
        resumed = base.replace(
            ckpt_path=str(tmp_path / "part"),
            resume=os.path.join(part.ckpt_path, "last"))
        state_res, res_res = run(resumed, max_steps_per_epoch=1)

        assert [h["epoch"] for h in res_res["history"]] == [2]
        for a, b in zip(jax.tree_util.tree_leaves(state_full.params),
                        jax.tree_util.tree_leaves(state_res.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state_full.opt_state),
                        jax.tree_util.tree_leaves(state_res.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert res_res["best_acc"] == res_full["best_acc"]


class TestCheckpointUtils:
    def test_async_save_matches_sync(self, tmp_path):
        """save_checkpoint_async + wait commits bytes identical (leaf-wise)
        to the blocking save; the driver's best-ckpt path uses the async
        variant (runtime/driver.py)."""
        from mla_tpu.models.classifiers import AVClassifier
        from mla_tpu.runtime import checkpoint as ckpt_lib
        from mla_tpu.train import optim
        from mla_tpu.train.state import create_train_state

        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        resnet_stages=(1, 1, 1, 1), train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        rng = np.random.default_rng(0)
        batch = {"spec": jnp.asarray(rng.standard_normal((2, 1, 64, 80)),
                                     jnp.float32),
                 "image": jnp.asarray(
                     rng.standard_normal((2, 3, 3, 32, 32)), jnp.float32),
                 "label": jnp.zeros((2,), jnp.int32)}
        spec = optim.make_spec(cfg)
        s = create_train_state(model, cfg, batch, spec, seed=3)
        p_sync = ckpt_lib.save_checkpoint(str(tmp_path), s, {"acc": 1.0},
                                          "sync")
        p_async = ckpt_lib.save_checkpoint_async(str(tmp_path), s,
                                                 {"acc": 1.0}, "async")
        ckpt_lib.wait_for_async_saves()
        r_sync = ckpt_lib.restore_checkpoint(p_sync, s)
        r_async = ckpt_lib.restore_checkpoint(p_async, s)
        for a, b in zip(jax.tree_util.tree_leaves(r_sync.params),
                        jax.tree_util.tree_leaves(r_async.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ckpt_lib.load_meta(p_async)["acc"] == 1.0

    def test_warm_start_drops_head(self, tiny_cremad, tmp_path):
        from mla_tpu.models.classifiers import AVClassifier
        from mla_tpu.runtime import checkpoint as ckpt_lib
        from mla_tpu.train import optim
        from mla_tpu.train.state import create_train_state

        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        resnet_stages=(1, 1, 1, 1), train=True).validate()
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        rng = np.random.default_rng(0)
        batch = {"spec": jnp.asarray(rng.standard_normal((2, 1, 64, 80)),
                                     jnp.float32),
                 "image": jnp.asarray(
                     rng.standard_normal((2, 3, 3, 32, 32)), jnp.float32),
                 "label": jnp.zeros((2,), jnp.int32)}
        spec = optim.make_spec(cfg)
        s1 = create_train_state(model, cfg, batch, spec, seed=1)
        path = ckpt_lib.save_checkpoint(str(tmp_path), s1, {"acc": 0.5}, "a")
        s2 = create_train_state(model, cfg, batch, spec, seed=2)
        merged = ckpt_lib.warm_start_params(path, s2.params)
        # encoders come from the checkpoint, head stays fresh (seed 2)
        np.testing.assert_allclose(
            np.asarray(merged["audio_net"]["conv1"]["kernel"]),
            np.asarray(s1.params["audio_net"]["conv1"]["kernel"]))
        np.testing.assert_allclose(
            np.asarray(merged["fusion_module"]["fc_out"]["kernel"]),
            np.asarray(s2.params["fusion_module"]["fc_out"]["kernel"]))

    def test_wa_params(self, tmp_path):
        from mla_tpu.runtime import checkpoint as ckpt_lib
        from mla_tpu.train.state import TrainState

        for i, val in enumerate([1.0, 3.0]):
            st = TrainState(params={"w": jnp.full((2,), val)}, batch_stats={},
                            opt_state={"momentum": {"w": jnp.zeros(2)}},
                            gs=None, qmf=None, rng=jax.random.key(0),
                            step=jnp.int32(0))
            ckpt_lib.save_checkpoint(str(tmp_path), st, {}, f"c{i}")
        avg, avg_bs = ckpt_lib.wa_params(str(tmp_path))
        np.testing.assert_allclose(np.asarray(avg["w"]), 2.0)
        assert avg_bs == {}


class TestMetaReconstruction:
    def test_load_meta_missing_file_reconstructs(self, tmp_path):
        """An async-save crash window can leave a committed checkpoint with
        no meta.json; load_meta must reconstruct from the dir name instead
        of raising (ADVICE r2)."""
        from mla_tpu.runtime import checkpoint as ckpt_lib
        name = ("best_model_of_dataset_CREMAD_Normal_alpha_0.3_optimizer_"
                "sgd_modulate_starts_0_ends_50_epoch_7_acc_0.625")
        d = tmp_path / name
        d.mkdir()
        meta = ckpt_lib.load_meta(str(d))
        assert meta["reconstructed"] is True
        assert meta["saved_epoch"] == 7
        assert meta["acc"] == 0.625

    def test_load_meta_no_checkpoint_still_raises(self, tmp_path):
        from mla_tpu.runtime import checkpoint as ckpt_lib
        with pytest.raises(FileNotFoundError):
            ckpt_lib.load_meta(str(tmp_path / "nonexistent"))
