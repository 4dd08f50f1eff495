"""Model shape/compose tests on tiny inputs (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import classifiers
from mla_tpu.models.cav_mae import CAVMAEFT
from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
from mla_tpu.models.resnet import ResNet18


def _init_apply(model, batch, method=None, train=False):
    variables = model.init(jax.random.key(0), batch, train=train)
    out, _ = model.apply(variables, batch, train=train,
                         mutable=["batch_stats"])
    return variables, out


class TestResNet18:
    def test_audio_stem_and_shape(self):
        m = ResNet18(modality="audio")
        x = jnp.zeros((2, 64, 80, 1))
        v = m.init(jax.random.key(0), x, train=False)
        out = m.apply(v, x, train=False)
        # conv1 stride2 + maxpool stride2 + 3 stride-2 stages = /32
        assert out.shape == (2, 2, 3, 512)
        assert v["params"]["conv1"]["kernel"].shape == (7, 7, 1, 64)

    def test_batch_stats_update(self):
        m = ResNet18(modality="visual")
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.key(0), x, train=True)
        _, new_state = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in new_state


class TestM3AE:
    @pytest.mark.mid
    def test_text_only_and_image_only(self):
        enc = M3AEEncoder(M3AEConfig(model_type="debug", text_vocab_size=1024))
        token = jnp.zeros((2, 8), jnp.int32)
        pm = jnp.zeros((2, 8), jnp.float32)
        v = enc.init(jax.random.key(0), None, token, pm)
        out = enc.apply(v, None, token, pm)
        assert out.shape == (2, 9, 1024)  # CLS + 8 text tokens
        img = jnp.zeros((2, 4, 768))
        out2 = enc.apply(v, img, None, None)
        assert out2.shape == (2, 5, 1024)

    def test_padding_mask_matters(self):
        enc = M3AEEncoder(M3AEConfig(model_type="debug", text_vocab_size=1024))
        rng = np.random.default_rng(0)
        token = jnp.asarray(rng.integers(0, 30522, (1, 8)), jnp.int32)
        v = enc.init(jax.random.key(0), None, token, jnp.zeros((1, 8)))
        pm0 = enc.apply(v, None, token, jnp.zeros((1, 8)))
        pm1 = enc.apply(v, None, token,
                        jnp.zeros((1, 8)).at[:, 4:].set(1.0))
        assert not np.allclose(np.asarray(pm0[:, 0]), np.asarray(pm1[:, 0]))


class TestCAVMAE:
    def test_forward_feat_modes(self):
        m = CAVMAEFT(label_dim=6, img_size=32, audio_length=128)
        fbank = jnp.zeros((2, 128, 128))
        image = jnp.zeros((2, 3, 32, 32))
        v = m.init(jax.random.key(0), fbank, image, method=m.forward_feat,
                   mode="av")
        fa, fv = m.apply(v, fbank, image, method=m.forward_feat, mode="av")
        assert fa.shape == (2, 64, 768)   # 128*128/256 audio patches
        assert fv.shape == (2, 4, 768)    # (32/16)^2
        fa2 = m.apply(v, fbank, None, method=m.forward_feat, mode="a")
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fa2), atol=1e-5)

    def test_all_lns_materialized(self):
        m = CAVMAEFT(label_dim=6, img_size=32, audio_length=128)
        v = m.init(jax.random.key(0), jnp.zeros((1, 128, 128)),
                   jnp.zeros((1, 3, 32, 32)), method=m.forward_feat, mode="av")
        blk = v["params"]["blocks_u_0"]
        for name in ["norm1", "norm1_a", "norm1_v", "norm2", "norm2_a", "norm2_v"]:
            assert f"{name}_scale" in blk, sorted(blk.keys())


class TestClassifiers:
    def _av_batch(self, b=2):
        return {"spec": jnp.zeros((b, 1, 64, 80)),
                "image": jnp.zeros((b, 3, 3, 32, 32)),
                "label": jnp.zeros((b,), jnp.int32)}

    def test_av_joint(self):
        m = classifiers.AVClassifier(n_classes=6, stages=(1, 1, 1, 1))
        batch = self._av_batch()
        _, out = _init_apply(m, batch, train=True)
        assert out["out"].shape == (2, 6)
        assert out["a"].shape == out["v"].shape == (2, 512)

    def test_av_gs_head(self):
        m = classifiers.AVClassifier(n_classes=6, gs_flag=True,
                                     stages=(1, 1, 1, 1))
        batch = self._av_batch()
        v = m.init(jax.random.key(0), batch, train=False)
        out, _ = m.apply(v, batch, train=False, mutable=["batch_stats"])
        assert set(out) == {"a", "v", "out_a", "out_v"}
        assert out["out_a"].shape == (2, 6)
        logits = m.apply(v, out["a"], method=m.head)
        assert logits.shape == (2, 6)
        # shared head is feat-width (512), not concat width
        assert v["params"]["fusion_module"]["fc_out"]["kernel"].shape == (512, 6)

    def test_av_qmf(self):
        m = classifiers.AVClassifier(n_classes=6, qmf=True,
                                     stages=(1, 1, 1, 1))
        _, out = _init_apply(m, self._av_batch())
        assert out["a"].shape == out["v"].shape == (2, 6)

    def test_av_sum_fusion(self):
        m = classifiers.AVClassifier(n_classes=6, fusion_method="sum",
                                     stages=(1, 1, 1, 1))
        _, out = _init_apply(m, self._av_batch())
        assert out["out"].shape == (2, 6)

    def test_m3ae_size_plumbed_from_config(self):
        """--m3ae_size selects the encoder config table row (m3ae.py:226-268);
        heads shape-infer so large/huge need no head changes."""
        from mla_tpu.core.config import MLAConfig, config_from_args
        cfg = MLAConfig(dataset="Food101", lorb="m3ae",
                        m3ae_size="debug").validate()
        m = classifiers.build_classifier(cfg)
        assert m.model_type == "debug"
        batch = {"token": jnp.zeros((2, 1, 8), jnp.int32),
                 "padding_mask": jnp.zeros((2, 1, 8)),
                 "image": jnp.zeros((2, 3, 32, 32))}
        v = m.init(jax.random.key(0), batch)
        out = m.apply(v, batch)
        assert out["a"].shape == (2, 1024)      # debug emb_dim
        # CLI surface + validation
        cfg2 = config_from_args(["--dataset", "Food101", "--lorb", "m3ae",
                                 "--m3ae_size", "large"])
        assert cfg2.m3ae_size == "large"
        with pytest.raises(ValueError, match="m3ae_size"):
            MLAConfig(dataset="Food101", lorb="m3ae",
                      m3ae_size="giant").validate()

    def test_m3ae_classifier(self):
        m = classifiers.M3AEClassifier(n_classes=3, model_type="small",
                                       text_vocab_size=1024)
        batch = {"token": jnp.zeros((2, 1, 8), jnp.int32),
                 "padding_mask": jnp.zeros((2, 1, 8)),
                 "image": jnp.zeros((2, 3, 32, 32))}
        v = m.init(jax.random.key(0), batch)
        out = m.apply(v, batch)
        assert out["out"].shape == (2, 3)
        assert out["a"].shape == (2, 384)
        # joint concat head: 2*384 wide
        assert v["params"]["fusion_module"]["fc_out"]["kernel"].shape == (768, 3)

    def test_clip_classifier(self):
        m = classifiers.CLIPClassifier(n_classes=101)
        batch = {"token_feat": jnp.zeros((2, 512)), "image_feat": jnp.zeros((2, 512))}
        v = m.init(jax.random.key(0), batch)
        out = m.apply(v, batch)
        assert out["out"].shape == (2, 101)

    def test_build_classifier_factory(self):
        from mla_tpu.core.config import MLAConfig
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True).validate()
        m = classifiers.build_classifier(cfg, dtype=jnp.float32)
        assert isinstance(m, classifiers.AVClassifier) and m.gs_flag
        cfg3 = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True).validate()
        assert isinstance(classifiers.build_classifier(cfg3),
                          classifiers.Modal3Classifier)


class TestInitParity:
    def test_head_init_distributions(self):
        """Reference applies xavier weight_init only to the non-clip
        AVClassifier (main.py:717-719); other families keep torch Linear
        defaults: weight AND bias ~ U(+-1/sqrt(fan_in))."""
        from mla_tpu.models.classifiers import CLIPClassifier

        av = classifiers.AVClassifier(n_classes=6, stages=(1, 1, 1, 1))
        v = av.init(jax.random.key(0), {
            "spec": jnp.zeros((2, 1, 64, 80)),
            "image": jnp.zeros((2, 3, 3, 32, 32))}, train=False)
        fc = v["params"]["fusion_module"]["fc_out"]
        np.testing.assert_allclose(np.asarray(fc["bias"]), 0.0)  # weight_init

        clip = CLIPClassifier(n_classes=101)
        vc = clip.init(jax.random.key(0), {
            "token_feat": jnp.zeros((2, 512)),
            "image_feat": jnp.zeros((2, 512))}, train=False)
        fc = vc["params"]["fusion_module"]["fc_out"]
        bound = 1.0 / np.sqrt(1024)          # concat fan_in = 512 + 512
        k = np.asarray(fc["kernel"])
        b = np.asarray(fc["bias"])
        assert np.abs(k).max() <= bound + 1e-6
        assert np.abs(b).max() <= bound + 1e-6
        assert np.abs(b).max() > 0.0         # NOT zero-init
        # uniform over +-bound has std bound/sqrt(3)
        np.testing.assert_allclose(k.std(), bound / np.sqrt(3), rtol=0.05)

    def test_gs_takes_precedence_over_qmf(self):
        """gs_flag + QMF: the reference's gs branch never touches QMF heads
        (main.py:419-485); the model must expose the gs outputs so the eval
        path (eval_logits gs branch) works."""
        from mla_tpu.core.config import MLAConfig
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        modulation="QMF", resnet_stages=(1, 1, 1, 1),
                        image_size=32).validate()
        m = classifiers.build_classifier(cfg)
        assert m.qmf is False and m.gs_flag is True

    def test_clip_qmf_rejected(self):
        from mla_tpu.core.config import MLAConfig
        with pytest.raises(ValueError, match="QMF heads"):
            MLAConfig(dataset="Food101", clip=True,
                      modulation="QMF").validate()


class TestExtraFusionHeads:
    """FiLM / GatedFusion defined-but-unconstructed heads (fusion_modules.py:38-99)."""

    def test_film(self):
        from mla_tpu.models.fusion import FiLM
        m = FiLM(dim=16, output_dim=5)
        x = jnp.ones((2, 16))
        v = m.init(jax.random.key(0), x, x)
        _, _, out = m.apply(v, x, x)
        assert out.shape == (2, 5)

    def test_gated(self):
        from mla_tpu.models.fusion import GatedFusion
        m = GatedFusion(dim=16, output_dim=5, x_gate=False)
        x = jnp.ones((2, 16))
        v = m.init(jax.random.key(0), x, x)
        ox, oy, out = m.apply(v, x, x)
        assert out.shape == (2, 5) and ox.shape == (2, 16)

    def test_sum_fusion_bias_slicing(self):
        from mla_tpu.models.fusion import SumFusion
        from mla_tpu.train.steps import sliced_modality_logits
        m = SumFusion(output_dim=4)
        x, y = jnp.ones((2, 8)), jnp.ones((2, 8)) * 2
        v = m.init(jax.random.key(0), x, y)
        _, _, out = m.apply(v, x, y)
        sl = sliced_modality_logits({"a": x, "v": y}, v["params"], "sum",
                                    False, bias_div=False)
        np.testing.assert_allclose(np.asarray(sl["a"] + sl["v"]),
                                   np.asarray(out), atol=1e-5)


class TestScanBlocks:
    """scan_blocks (models/m3ae.py): lax.scan over one stacked block must be
    bit-identical to the unrolled stack, with pp.to_scan_layout converting
    checkpoints between the two param layouts."""

    def _fixtures(self):
        from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.standard_normal((4, 4, 768)), jnp.float32)
        text = jnp.asarray(rng.integers(0, 64, (4, 8)), jnp.int32)
        tmask = jnp.zeros((4, 8), jnp.float32).at[:, 6:].set(1.0)
        enc_u = M3AEEncoder(M3AEConfig(model_type="debug",
                                       text_vocab_size=64), jnp.float32)
        enc_s = M3AEEncoder(M3AEConfig(model_type="debug", text_vocab_size=64,
                                       scan_blocks=True), jnp.float32)
        return enc_u, enc_s, image, text, tmask

    def test_encoder_bit_identical(self):
        from mla_tpu.parallel import pp
        enc_u, enc_s, image, text, tmask = self._fixtures()
        vu = enc_u.init(jax.random.key(0), image, text, tmask)
        ps = pp.to_scan_layout(vu["params"])
        out_u = enc_u.apply(vu, image, text, tmask)
        out_s = enc_s.apply({"params": ps}, image, text, tmask)
        np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_s))

    def test_scan_unroll_bit_identical(self):
        """--scan_unroll only changes lax.scan's lowering, never the math —
        including a factor that does not divide the depth."""
        from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
        from mla_tpu.parallel import pp
        enc_u, _, image, text, tmask = self._fixtures()
        vu = enc_u.init(jax.random.key(0), image, text, tmask)
        ps = pp.to_scan_layout(vu["params"])
        out_u = enc_u.apply(vu, image, text, tmask)
        for unroll in (2, 3):
            enc_n = M3AEEncoder(M3AEConfig(model_type="debug",
                                           text_vocab_size=64,
                                           scan_blocks=True,
                                           scan_unroll=unroll), jnp.float32)
            out_n = enc_n.apply({"params": ps}, image, text, tmask)
            np.testing.assert_array_equal(np.asarray(out_u),
                                          np.asarray(out_n))

    def test_remat_blocks_identical_values_and_grads(self):
        """--remat_blocks recomputes instead of storing block activations —
        forward AND gradients must be bit-identical to the plain scan."""
        from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
        from mla_tpu.parallel import pp
        enc_u, enc_s, image, text, tmask = self._fixtures()
        enc_r = M3AEEncoder(M3AEConfig(model_type="debug", text_vocab_size=64,
                                       scan_blocks=True, remat_blocks=True),
                            jnp.float32)
        vu = enc_u.init(jax.random.key(0), image, text, tmask)
        ps = {"params": pp.to_scan_layout(vu["params"])}

        def loss(enc):
            def f(v):
                return jnp.sum(enc.apply(v, image, text, tmask) ** 2)
            return jax.jit(jax.value_and_grad(f))(ps)

        (ls, gs), (lr, gr) = loss(enc_s), loss(enc_r)
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(lr))
        for a, b in zip(jax.tree_util.tree_leaves(gs),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_layout_roundtrip(self):
        from mla_tpu.parallel import pp
        enc_u, _, image, text, tmask = self._fixtures()
        vu = enc_u.init(jax.random.key(0), image, text, tmask)
        rt = pp.from_scan_layout(pp.to_scan_layout(vu["params"]))
        for a, b in zip(jax.tree_util.tree_leaves(rt),
                        jax.tree_util.tree_leaves(vu["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_classifier_forward_matches(self):
        """Full M3AEClassifier: unrolled vs scan_blocks with converted
        params — covers both encoders + head through build paths."""
        from mla_tpu.models.classifiers import M3AEClassifier
        from mla_tpu.parallel import pp
        rng = np.random.default_rng(1)
        batch = {"token": jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32),
                 "padding_mask": jnp.zeros((2, 16), jnp.float32),
                 "image": jnp.asarray(rng.standard_normal((2, 3, 32, 32)),
                                      jnp.float32)}
        kw = dict(n_classes=3, gs_flag=True, model_type="debug",
                  text_vocab_size=64, dtype=jnp.float32)
        mu = M3AEClassifier(**kw)
        ms = M3AEClassifier(scan_blocks=True, **kw)
        vu = mu.init(jax.random.key(0), batch, train=False)
        vs = {"params": pp.to_scan_layout(vu["params"])}
        ou = mu.apply(vu, batch, train=False)
        os_ = ms.apply(vs, batch, train=False)
        for k in ou:
            np.testing.assert_array_equal(np.asarray(ou[k]),
                                          np.asarray(os_[k]))
