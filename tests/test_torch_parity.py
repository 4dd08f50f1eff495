"""Numerical parity of Flax encoders vs the reference PyTorch modules.

The reference tree is imported read-only (sys.path) purely to produce golden
outputs/state_dicts; no reference code lives in this repo. CAV-MAE's reference
module needs timm (absent), so its import test is structural (shapes/paths)
plus a functional forward with imported weights.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib


class _LazyTorch:
    """Deferred torch import: loading torch at pytest collection time
    (module-level importorskip) intermittently SIGABRTs the XLA:CPU runtime
    later in the session (OpenMP/threadpool clash). First attribute access
    imports it inside the owning test instead."""

    _mod = None

    def __getattr__(self, name):
        if _LazyTorch._mod is None:
            _LazyTorch._mod = importlib.import_module("torch")
            _LazyTorch._mod.set_num_threads(1)
        return getattr(_LazyTorch._mod, name)


torch = _LazyTorch()
sys.path.insert(0, "/root/reference")

# the reference m3ae.py imports torchvision (absent here) at module level but
# only uses it inside an eval helper; stub it so the module imports
import types  # noqa: E402

if "torchvision" not in sys.modules:
    import importlib.machinery
    _tv = types.ModuleType("torchvision")
    _tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    _tv.transforms = types.ModuleType("torchvision.transforms")
    _tv.transforms.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", None)
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tv.transforms

from mla_tpu.models import torch_import as ti
from mla_tpu.models.cav_mae import CAVMAEFT
from mla_tpu.models.m3ae import M3AEConfig, M3AEEncoder
from mla_tpu.models.resnet import ResNet18


class TestResNetParity:
    @pytest.mark.parametrize("modality,in_ch", [("audio", 1), ("visual", 3)])
    def test_forward_matches_reference(self, modality, in_ch):
        from models.backbone import resnet18 as ref_resnet18
        torch.manual_seed(0)
        ref = ref_resnet18(modality=modality).eval()
        p, s = ti.import_resnet18(ref.state_dict())

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, in_ch, 64, 96)).astype(np.float32)
        with torch.no_grad():
            if modality == "visual":
                # reference folds (B,C,T,H,W); feed T=1
                ref_out = ref(torch.tensor(x).unsqueeze(2))
            else:
                ref_out = ref(torch.tensor(x))
        ours = ResNet18(modality=modality)
        nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        out = ours.apply({"params": p, "batch_stats": s}, nhwc, train=False)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref_out.numpy(), atol=2e-4)

    def test_batchnorm_training_stats_match(self):
        from models.backbone import resnet18 as ref_resnet18
        torch.manual_seed(1)
        ref = ref_resnet18(modality="audio").train()
        p, s = ti.import_resnet18(ref.state_dict())
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 1, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x))
        ours = ResNet18(modality="audio")
        out, _ = ours.apply({"params": p, "batch_stats": s},
                            jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
                            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref_out.numpy(), atol=2e-4)


class TestM3AEParity:
    def test_text_encoder_matches_reference(self):
        from ml_collections import ConfigDict
        import models.m3ae as ref_m3ae
        from models.m3ae import (MaskedMultimodalAutoencoder,
                                 get_1d_sincos_pos_embed)
        # Reference bug: DropPath.forward (m3ae.py:52-62) hardcodes cuda and
        # returns None when deterministic=False (its return is commented out),
        # so the shipped Block.forward crashes on any device. drop_path is 0
        # in every config; identity is the intended semantics.
        ref_m3ae.DropPath.forward = lambda self, x, deterministic=False: x
        torch.manual_seed(2)
        ref = MaskedMultimodalAutoencoder(
            text_vocab_size=1000,
            config_updates=ConfigDict(dict(model_type="debug"))).eval()
        sd = {k: v for k, v in ref.state_dict().items()}

        b, l, d = 2, 8, ref.config.emb_dim
        rng = np.random.default_rng(2)
        tokens = rng.integers(0, 1000, (b, l))
        pm = np.zeros((b, l), np.float32)
        pm[:, 5:] = 1.0

        # torch side: replicate forward_representation's embedding math on CPU
        # (the reference hardcodes cuda at m3ae.py:346)
        with torch.no_grad():
            cls = ref.cls_token.expand(b, 1, d)
            tx = (torch.nn.functional.embedding(
                      torch.tensor(tokens), ref.text_embedding.weight)
                  + torch.tensor(get_1d_sincos_pos_embed(d, l))
                  + ref.encoder_text_type_embedding).float()
            x = torch.cat([cls, tx], dim=1)
            full_pm = torch.cat([torch.zeros(b, 1), torch.tensor(pm)], dim=1)
            ref_out = ref.encoder(x, True, full_pm).numpy()

        enc = M3AEEncoder(M3AEConfig(model_type="debug", text_vocab_size=1000))
        params = ti.import_m3ae(sd)
        out = enc.apply({"params": params}, None, jnp.asarray(tokens),
                        jnp.asarray(pm))
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4)


def _synthetic_cav_sd(rng, label_dim=6, img_size=32, audio_len=128, depth_ms=2,
                      depth_u=1, d=768):
    """torch-named random state_dict with the reference's CAVMAEFT layout."""
    sd = {}
    r = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32) * .02)
    sd["patch_embed_a.proj.weight"] = r(d, 1, 16, 16)
    sd["patch_embed_a.proj.bias"] = r(d)
    sd["patch_embed_v.proj.weight"] = r(d, 3, 16, 16)
    sd["patch_embed_v.proj.bias"] = r(d)
    na, nv = audio_len * 128 // 256, (img_size // 16) ** 2
    sd["modality_a"] = r(1, 1, d)
    sd["modality_v"] = r(1, 1, d)
    sd["pos_embed_a"] = r(1, na, d)
    sd["pos_embed_v"] = r(1, nv, d)
    for tag, depth in (("a", depth_ms), ("v", depth_ms), ("u", depth_u)):
        for i in range(depth):
            t = f"blocks_{tag}.{i}"
            for norm in ("norm1", "norm1_a", "norm1_v", "norm2", "norm2_a",
                         "norm2_v"):
                sd[f"{t}.{norm}.weight"] = torch.ones(d)
                sd[f"{t}.{norm}.bias"] = torch.zeros(d)
            sd[f"{t}.attn.qkv.weight"] = r(3 * d, d)
            sd[f"{t}.attn.qkv.bias"] = r(3 * d)
            sd[f"{t}.attn.proj.weight"] = r(d, d)
            sd[f"{t}.attn.proj.bias"] = r(d)
            sd[f"{t}.mlp.fc1.weight"] = r(4 * d, d)
            sd[f"{t}.mlp.fc1.bias"] = r(4 * d)
            sd[f"{t}.mlp.fc2.weight"] = r(d, 4 * d)
            sd[f"{t}.mlp.fc2.bias"] = r(d)
    sd["norm_a.weight"] = torch.ones(d)
    sd["norm_a.bias"] = torch.zeros(d)
    sd["norm_v.weight"] = torch.ones(d)
    sd["norm_v.bias"] = torch.zeros(d)
    return sd


def _ref_cav_forward_feat(sd, a, v, depth_ms, depth_u, num_heads=12):
    """The reference CAVMAEFT.forward_feat (cav_mae.py:306-333) with the timm
    0.4.5 Attention/Mlp math written inline (timm is absent in this image):
    qkv linear -> (B,H,N,D) -> softmax((q k^T) * D^-0.5) v -> proj;
    Mlp = fc1 -> exact GELU -> fc2; Block per-modality norms per
    cav_mae.py:86-113. Everything reads straight from the torch state_dict."""
    import torch.nn.functional as F

    def ln(x, p):
        return F.layer_norm(x, x.shape[-1:], sd[p + ".weight"], sd[p + ".bias"])

    def attn(x, p):
        B, N, C = x.shape
        qkv = F.linear(x, sd[p + ".attn.qkv.weight"], sd[p + ".attn.qkv.bias"])
        qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, vv = qkv[0], qkv[1], qkv[2]
        w = (q @ k.transpose(-2, -1)) * (C // num_heads) ** -0.5
        x = (w.softmax(dim=-1) @ vv).transpose(1, 2).reshape(B, N, C)
        return F.linear(x, sd[p + ".attn.proj.weight"], sd[p + ".attn.proj.bias"])

    def mlp(x, p):
        h = F.gelu(F.linear(x, sd[p + ".mlp.fc1.weight"], sd[p + ".mlp.fc1.bias"]))
        return F.linear(h, sd[p + ".mlp.fc2.weight"], sd[p + ".mlp.fc2.bias"])

    def block(x, p, modality=None):
        sfx = "" if modality is None else "_" + modality
        x = x + attn(ln(x, f"{p}.norm1{sfx}"), p)
        x = x + mlp(ln(x, f"{p}.norm2{sfx}"), p)
        return x

    # audio (B, T, 128) -> (B, 1, 128, T) -> patch conv (cav_mae.py:309-313)
    a = a.unsqueeze(1).transpose(2, 3)
    a = F.conv2d(a, sd["patch_embed_a.proj.weight"],
                 sd["patch_embed_a.proj.bias"], stride=16)
    a = a.flatten(2).transpose(1, 2)
    a = a + sd["pos_embed_a"] + sd["modality_a"]
    v = F.conv2d(v, sd["patch_embed_v.proj.weight"],
                 sd["patch_embed_v.proj.bias"], stride=16)
    v = v.flatten(2).transpose(1, 2)
    v = v + sd["pos_embed_v"] + sd["modality_v"]
    for i in range(depth_ms):
        a = block(a, f"blocks_a.{i}")
    for i in range(depth_ms):
        v = block(v, f"blocks_v.{i}")
    for i in range(depth_u):
        a = block(a, f"blocks_u.{i}", "a")
    a = ln(a, "norm_a")
    for i in range(depth_u):
        v = block(v, f"blocks_u.{i}", "v")
    v = ln(v, "norm_v")
    return a, v


class TestCAVMAEImport:
    def test_numerical_golden_vs_torch(self):
        """CAV-MAE forward_feat matches the torch math to <=3e-4 (VERDICT r1
        missing #3): same state_dict through the import shim vs inline timm."""
        torch.manual_seed(6)  # force the lazy torch import first
        rng = np.random.default_rng(6)
        sd = _synthetic_cav_sd(rng)
        xa = rng.standard_normal((2, 128, 128)).astype(np.float32)
        xv = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ra, rv = _ref_cav_forward_feat(
                sd, torch.tensor(xa), torch.tensor(xv), depth_ms=2, depth_u=1)

        params = ti.import_cavmae(sd)
        model = CAVMAEFT(label_dim=6, img_size=32, audio_length=128,
                         modality_specific_depth=2, depth=3)
        fa, fv = model.apply({"params": params}, jnp.asarray(xa),
                             jnp.asarray(xv), method=model.forward_feat,
                             mode="av")
        np.testing.assert_allclose(np.asarray(fa), ra.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(fv), rv.numpy(), atol=3e-4)
        # single-modality modes share the same per-modality-norm path
        fa1 = model.apply({"params": params}, jnp.asarray(xa), None,
                          method=model.forward_feat, mode="a")
        np.testing.assert_allclose(np.asarray(fa1), ra.numpy(), atol=3e-4)

    def test_structure_and_forward(self):
        rng = np.random.default_rng(3)
        sd = _synthetic_cav_sd(rng)
        params = ti.import_cavmae(sd)
        model = CAVMAEFT(label_dim=6, img_size=32, audio_length=128,
                         modality_specific_depth=2, depth=3)
        init = model.init(jax.random.key(0), jnp.zeros((1, 128, 128)),
                          jnp.zeros((1, 3, 32, 32)), method=model.forward_feat,
                          mode="av")["params"]
        import chex
        chex.assert_trees_all_equal_shapes(params, init)
        fa, fv = model.apply({"params": params}, jnp.zeros((1, 128, 128)),
                             jnp.zeros((1, 3, 32, 32)),
                             method=model.forward_feat, mode="av")
        assert fa.shape == (1, 64, 768) and np.isfinite(np.asarray(fa)).all()


class TestClassifierImport:
    @pytest.mark.mid
    def test_av_classifier_roundtrip(self):
        """Full AVClassifier-shaped torch dict (DataParallel prefixes) imports
        into trees matching flax init."""
        from models.backbone import resnet18 as ref_resnet18
        import chex
        from mla_tpu.core.config import MLAConfig
        from mla_tpu.models.classifiers import AVClassifier
        torch.manual_seed(4)
        sd = {}
        for net in ("audio_net", "visual_net"):
            ref = ref_resnet18(modality=net.split("_")[0])
            for k, v in ref.state_dict().items():
                if "num_batches_tracked" in k:
                    continue
                sd[f"module.{net}.{k}"] = v
        sd["module.fusion_module.fc_out.weight"] = torch.zeros(6, 512)
        sd["module.fusion_module.fc_out.bias"] = torch.zeros(6)
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True).validate()
        params, stats = ti.import_classifier({"model": sd}, cfg)

        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32)
        batch = {"spec": jnp.zeros((1, 1, 64, 80)),
                 "image": jnp.zeros((1, 3, 3, 32, 32))}
        variables = model.init(jax.random.key(0), batch, train=False)
        chex.assert_trees_all_equal_shapes(params, variables["params"])
        chex.assert_trees_all_equal_shapes(stats, variables["batch_stats"])


class TestPretrainedEncoderLoad:
    @pytest.mark.mid
    def test_load_pretrained_m3ae_encoder(self, tmp_path):
        """--pretrained_a loads a bare M3AE state_dict into mae_a only."""
        from ml_collections import ConfigDict
        from models.m3ae import MaskedMultimodalAutoencoder
        from mla_tpu.core.config import MLAConfig
        from mla_tpu.models.classifiers import M3AEClassifier
        from mla_tpu.models.torch_import import load_pretrained_encoders
        torch.manual_seed(5)
        ref = MaskedMultimodalAutoencoder(
            text_vocab_size=1000,
            config_updates=ConfigDict(dict(model_type="debug")))
        path = str(tmp_path / "enc.pth")
        torch.save(ref.state_dict(), path)

        import jax, jax.numpy as jnp
        model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug")
        batch = {"token": jnp.zeros((1, 8), jnp.int32),
                 "padding_mask": jnp.zeros((1, 8)),
                 "image": jnp.zeros((1, 3, 32, 32))}
        params = model.init(jax.random.key(0), batch)["params"]
        # debug config uses vocab 30522 here vs 1000 in file: text_embedding
        # shape differs -> drop it to mimic partial pretrained files
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", gs_flag=True,
                        pretrained_a=path).validate()
        new = load_pretrained_encoders(cfg, params)
        np.testing.assert_allclose(
            np.asarray(new["mae_a"]["image_kernel"]),
            ref.image_embedding.weight.detach().numpy().T, atol=1e-6)
        # untouched encoder keeps its init
        np.testing.assert_allclose(
            np.asarray(new["mae_v"]["image_kernel"]),
            np.asarray(params["mae_v"]["image_kernel"]))
        # vocab-size mismatch (1000 vs 30522) is skipped, not crashed on
        assert np.asarray(new["mae_a"]["text_embedding"]).shape[0] == 30522
        # strict=False semantics: checkpoint-only keys must be DROPPED, not
        # inserted — an enlarged tree desyncs params from opt_state
        assert jax.tree_util.tree_structure(new) == \
            jax.tree_util.tree_structure(params)
