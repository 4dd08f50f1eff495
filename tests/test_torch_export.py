"""Flax -> torch checkpoint export (models/torch_export.py): the inverse of
torch_import. Fast tier: save_torch_checkpoint -> load_torch_checkpoint is
bit-exact per family (including scan-blocks stacking). Slow tier: for the
ACTUAL reference models, import -> export reproduces the reference's own
state_dict tensor-for-tensor and load_state_dict(strict=True) accepts the
file — so a TPU-trained run exports a checkpoint the reference evaluates
verbatim (reference main.py:946-953)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.models import torch_export, torch_import


def _tree_equal(a, b, where=""):
    assert isinstance(a, dict) == isinstance(b, dict), where
    if isinstance(a, dict):
        assert set(a) == set(b), (where, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{where}.{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32), err_msg=where)


def _roundtrip(model, cfg, batch, tmp_path):
    variables = model.init(jax.random.key(0), batch, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    path = str(tmp_path / "export.pth")
    torch_export.save_torch_checkpoint(path, (params, stats), cfg,
                                       epoch=3, acc=0.5)
    p2, s2 = torch_import.load_torch_checkpoint(path, cfg)
    _tree_equal(jax.tree.map(np.asarray, params), p2)
    if stats:
        _tree_equal(jax.tree.map(np.asarray, stats), s2)
    return path


def _m3ae_batch(rng, b=2, t=16):
    return {"token": jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32),
            "padding_mask": jnp.zeros((b, t), jnp.float32),
            "image": jnp.asarray(rng.standard_normal((b, 3, 32, 32)),
                                 jnp.float32),
            "label": jnp.zeros((b,), jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


class TestRoundTrip:
    def test_base_resnets_with_bn_stats(self, tmp_path):
        from mla_tpu.models.classifiers import AVClassifier
        cfg = MLAConfig(dataset="CREMAD", lorb="base",
                        train=True).validate()
        model = AVClassifier(n_classes=6, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        batch = {"spec": jnp.asarray(rng.standard_normal((2, 1, 64, 80)),
                                     jnp.float32),
                 "image": jnp.asarray(rng.standard_normal((2, 3, 1, 32, 32)),
                                      jnp.float32)}
        _roundtrip(model, cfg, batch, tmp_path)

    def test_m3ae_with_qmf_heads(self, tmp_path):
        from mla_tpu.models.classifiers import M3AEClassifier
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", modulation="QMF",
                        train=True).validate()
        model = M3AEClassifier(n_classes=3, model_type="debug", qmf=True,
                               text_vocab_size=256, dtype=jnp.float32)
        _roundtrip(model, cfg, _m3ae_batch(np.random.default_rng(1)),
                   tmp_path)

    def test_m3ae_scan_blocks_unstacks(self, tmp_path):
        """scan-blocks trees export in the reference's per-block layout and
        come back restacked (load_torch_checkpoint's to_scan_layout)."""
        from mla_tpu.models.classifiers import M3AEClassifier
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", scan_blocks=True,
                        train=True).validate()
        model = M3AEClassifier(n_classes=3, model_type="debug",
                               scan_blocks=True, text_vocab_size=256,
                               dtype=jnp.float32)
        path = _roundtrip(model, cfg, _m3ae_batch(np.random.default_rng(2)),
                          tmp_path)
        # the file itself is per-block (reference layout), module.-prefixed
        import torch
        sd = torch.load(path)
        assert sd["modulation"] == "Normal" and sd["fusion"] == "concat"
        assert any(k.startswith("module.mae_a.encoder.blocks.0.")
                   for k in sd["model"])
        assert not any("blocks_stacked" in k or ".blocks." == k
                       for k in sd["model"])

    def test_clip_fusion_only(self, tmp_path):
        from mla_tpu.models.classifiers import CLIPClassifier
        cfg = MLAConfig(dataset="Food101", clip=True, train=True).validate()
        model = CLIPClassifier(n_classes=101, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        batch = {"token_feat": jnp.asarray(rng.standard_normal((2, 512)),
                                           jnp.float32),
                 "image_feat": jnp.asarray(rng.standard_normal((2, 512)),
                                           jnp.float32)}
        _roundtrip(model, cfg, batch, tmp_path)


class TestDriverFlag:
    @pytest.mark.mid
    def test_export_torch_writes_final_state(self, tmp_path):
        """--export_torch on a train run: the .pth holds the FINAL params
        (reference saved_dict layout) — import reproduces the train result."""
        from mla_tpu.data import synthetic
        from mla_tpu.runtime.driver import run

        root = str(tmp_path / "cre")
        synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
        out = str(tmp_path / "final.pth")
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        image_size=32, resnet_stages=(2, 2, 2, 2),
                        train=True, epochs=1, batch_size=4, data_root=root,
                        ckpt_path=str(tmp_path / "ck"), export_torch=out,
                        use_tensorboard=False, num_workers=2).validate()
        state, _ = run(cfg, max_steps_per_epoch=1)
        p2, s2 = torch_import.load_torch_checkpoint(out, cfg)
        _tree_equal(jax.tree.map(np.asarray, state.params), p2)
        _tree_equal(jax.tree.map(np.asarray, state.batch_stats), s2)
        import torch
        meta = torch.load(out)
        assert meta["saved_epoch"] == 0 and meta["modulation"] == "Normal"


FAMILIES = ["base", "m3ae", "modal3", "large", "clip"]


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_reference_state_dict_survives_import_export(family, tmp_path):
    """For the ACTUAL reference torch model: state_dict -> import_classifier
    -> export_classifier reproduces every tensor bit-for-bit under the
    reference's own names, and the reference model load_state_dicts the
    exported .pth with strict=True."""
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path else None
    import torch
    import torch.nn as tnn
    from ab_harness import (CAV_TINY, load_reference, ref_namespace,
                            tiny_ref_m3ae)

    common = dict(train=True, modulation="QMF" if family == "m3ae"
                  else "Normal", av_alpha=0.55, compute_dtype="float32")
    if family == "base":
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=32,
                        **common).validate()
    elif family == "m3ae":
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", image_size=64,
                        m3ae_size="base1", **common).validate()
    elif family == "modal3":
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        image_size=64, m3ae_size="base1",
                        audio_length=CAV_TINY[0], cav_blocks=CAV_TINY[1:],
                        **common).validate()
    elif family == "large":
        cfg = MLAConfig(dataset="CREMAD", lorb="large", image_size=64,
                        audio_length=CAV_TINY[0], cav_blocks=CAV_TINY[1:],
                        **common).validate()
    else:
        cfg = MLAConfig(dataset="Food101", clip=True, **common).validate()

    def build(ref):
        args = ref_namespace(cfg, 0.55)
        if cfg.lorb in ("m3ae", "large"):
            _load = torch.load
            torch.load = lambda *a, **k: {}
            try:
                model = (ref.CAVClassifier(args) if cfg.lorb == "large"
                         else ref.Modal3Classifier(args) if cfg.modal3
                         else ref.M3AEClassifier(args))
            finally:
                torch.load = _load
        elif cfg.clip:
            model = ref.CLIPClassifier(args)
        else:
            model = ref.AVClassifier(args)
        return tnn.DataParallel(model)

    if cfg.lorb in ("m3ae", "large"):
        cav = (CAV_TINY if cfg.modal3
               else CAV_TINY + (cfg.image_size,) if cfg.lorb == "large"
               else None)
        ctx = tiny_ref_m3ae(depth=1, cav=cav)
        with ctx as ref:
            model = build(ref)
    else:
        model = build(load_reference())

    orig = {k: v.numpy() for k, v in model.state_dict().items()}
    params, stats = torch_import.import_classifier(dict(model.state_dict()),
                                                   cfg)
    path = str(tmp_path / f"rt_{family}.pth")
    torch_export.save_torch_checkpoint(path, (params, stats), cfg)
    out = torch.load(path)["model"]

    assert set(out) == set(orig), sorted(set(out) ^ set(orig))[:10]
    for k in orig:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(out[k].numpy(), orig[k], err_msg=k)

    missing, unexpected = model.load_state_dict(torch.load(path)["model"],
                                                strict=True)
    assert not missing and not unexpected
