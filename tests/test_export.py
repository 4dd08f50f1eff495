"""AOT export / serving artifact (runtime/export.py): round-trip parity,
batch padding, and the driver --export_dir hook. CPU platform — the
exported StableHLO targets whatever platform the test runs on."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mla_tpu.core.config import MLAConfig
from mla_tpu.data import synthetic
from mla_tpu.data.datasets import build_adapter
from mla_tpu.data.pipeline import Loader
from mla_tpu.evals.metrics import eval_logits
from mla_tpu.models.classifiers import build_classifier
from mla_tpu.runtime.export import (export_serving, feature_keys,
                                    load_serving)
from mla_tpu.train import optim
from mla_tpu.train.state import create_train_state


def _direct(model, cfg, state, batch, n):
    """Jitted reference logits — same compilation pipeline as the artifact
    (eager bf16 differs from compiled bf16 by fusion rounding)."""
    fn = jax.jit(lambda p, bs, b, v: eval_logits(model, cfg, p, bs, b, v))
    return fn(state.params, state.batch_stats, batch,
              jnp.ones(n, jnp.float32))


def _state_and_batch(cfg):
    model = build_classifier(cfg)
    ad = build_adapter(cfg, "train")
    gen = Loader(ad, cfg.batch_size, shuffle=False, seed=0).epoch(0)
    batch = next(gen)
    gen.close()
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=len(ad))
    return model, state, batch


@pytest.fixture(scope="module")
def av_export(tmp_path_factory):
    """Tiny AV gs+dynamic model (the padding-sensitive gating path)."""
    root = str(tmp_path_factory.mktemp("cre"))
    synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
    cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                    dynamic=True, image_size=32,
                    resnet_stages=(1, 1, 1, 1), batch_size=4,
                    data_root=root).validate()
    model, state, batch = _state_and_batch(cfg)
    out = str(tmp_path_factory.mktemp("art"))
    export_serving(cfg, model, state, batch, out, batch_sizes=(2, 4))
    return cfg, model, state, batch, out


class TestExportRoundTrip:
    def test_artifact_matches_direct_eval(self, av_export):
        cfg, model, state, batch, out = av_export
        srv = load_serving(out)
        assert srv.batch_sizes == [2, 4]
        feats = {k: np.asarray(batch[k]) for k in feature_keys(model)}
        got = srv(feats)
        out_m, fused = _direct(model, cfg, state, batch, 4)
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got["logits_a"], np.asarray(out_m["a"]),
                                   rtol=1e-5, atol=1e-5)

    def test_padding_is_exact_for_real_rows(self, av_export):
        """n=3 request runs on the b=4 rung. Per-modality logits are
        row-independent, so the padded row must not perturb real rows AT ALL
        (bit-compare vs the full-batch call on the same rung); the fused head
        is batch-coupled through the valid-masked gating, so it is checked
        against the unpadded math at bf16 graph-to-graph tolerance."""
        cfg, model, state, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats3 = {k: np.asarray(batch[k])[:3] for k in keys}
        got = srv(feats3)
        assert got["fused"].shape == (3, cfg.n_classes)
        full = srv({k: np.asarray(batch[k]) for k in keys})
        for m in ("a", "v"):
            np.testing.assert_array_equal(got[f"logits_{m}"],
                                          full[f"logits_{m}"][:3])
        sub = {**{k: jnp.asarray(v) for k, v in feats3.items()},
               "label": batch["label"][:3]}
        _, fused = _direct(model, cfg, state, sub, 3)
        # different static batch -> different XLA fusion -> bf16 rounding
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=2e-2, atol=4e-3)

    def test_request_validation(self, av_export):
        cfg, model, state, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats = {k: np.asarray(batch[k]) for k in keys}
        with pytest.raises(ValueError, match="exceeds the largest"):
            srv({k: np.repeat(v, 2, axis=0) for k, v in feats.items()})
        with pytest.raises(KeyError, match="missing features"):
            srv({keys[0]: feats[keys[0]]})
        bad = dict(feats)
        bad[keys[0]] = feats[keys[0]][:, None]
        with pytest.raises(ValueError, match="per-sample shape"):
            srv(bad)

    def test_empty_and_invalid_ladders(self, av_export, tmp_path):
        """Review follow-ups: 0-row requests, empty/invalid batch ladders,
        and the config-level export flag validation fail loudly."""
        cfg, model, state, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        with pytest.raises(ValueError, match="0 rows"):
            srv({k: np.asarray(batch[k])[:0] for k in keys})
        with pytest.raises(ValueError, match="positive"):
            export_serving(cfg, model, state, batch,
                           str(tmp_path / "bad"), batch_sizes=())
        with pytest.raises(ValueError, match="positive"):
            export_serving(cfg, model, state, batch,
                           str(tmp_path / "bad"), batch_sizes=(0, 4))
        with pytest.raises(ValueError, match="export_batch_sizes"):
            cfg.replace(export_batch_sizes=(4,), export_dir=None)
        with pytest.raises(ValueError, match="positive"):
            cfg.replace(export_batch_sizes=(0,), export_dir="x")
        with pytest.raises(ValueError, match="pp_remat"):
            cfg.replace(scan_blocks=True, remat_blocks=True,
                        pp_microbatches=2)

    def test_export_from_driver_clears_parallel_switches(self, av_export,
                                                         tmp_path):
        """The artifact is a single-device graph: the driver hook must clear
        the sp/pp trace-time switches before tracing (review follow-up)."""
        from mla_tpu.parallel import sp
        from mla_tpu.parallel.mesh import make_mesh
        from mla_tpu.runtime.export import export_from_driver

        cfg, model, state, batch, out = av_export
        mesh = make_mesh(mesh_shape=(4, 2))
        assert sp.enable(mesh)
        try:
            cfg2 = cfg.replace(export_dir=str(tmp_path / "a2"),
                               export_batch_sizes=(4,))
            export_from_driver(cfg2, model, state, batch)
            assert not sp.is_enabled()
            assert load_serving(cfg2.export_dir).batch_sizes == [4]
        finally:
            sp.disable()

    def test_meta_records_contract(self, av_export):
        cfg, model, _, _, out = av_export
        srv = load_serving(out)
        assert srv.meta["family"] == "AVClassifier"
        assert srv.meta["n_classes"] == cfg.n_classes
        assert srv.meta["config"]["dynamic"] is True
        assert srv.meta["weights_dtype"] == "float32"
        assert set(srv.feature_names) == set(feature_keys(model))


class TestExportBF16:
    def test_bf16_artifact_halves_weights_and_tracks_fp32(self, av_export,
                                                          tmp_path):
        """--export_dtype bfloat16: params.msgpack ~halves (BN batch_stats
        stay fp32), the graph serves bf16 weights end-to-end, and logits
        track the fp32 artifact at weight-rounding tolerance (compute is
        bf16 in both, so only the stored-weight rounding differs)."""
        import os
        cfg, model, state, batch, out32 = av_export
        out16 = str(tmp_path / "bf16")
        export_serving(cfg, model, state, batch, out16, batch_sizes=(2, 4),
                       weights_dtype="bfloat16")
        srv32, srv16 = load_serving(out32), load_serving(out16)
        assert srv16.meta["weights_dtype"] == "bfloat16"
        s32 = os.path.getsize(os.path.join(out32, "params.msgpack"))
        s16 = os.path.getsize(os.path.join(out16, "params.msgpack"))
        assert s16 < 0.62 * s32, (s16, s32)
        feats = {k: np.asarray(batch[k]) for k in feature_keys(model)}
        a, b = srv32(feats), srv16(feats)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=0.1, atol=0.05)
        # per-modality argmax-stability on this fixture (weight rounding
        # must not flip the predictions the artifact exists to serve)
        assert (np.argmax(a["fused"], -1) == np.argmax(b["fused"], -1)).all()

    def test_invalid_dtype_rejected(self, av_export, tmp_path):
        cfg, model, state, batch, _ = av_export
        with pytest.raises(ValueError, match="float32, bfloat16 or int8"):
            export_serving(cfg, model, state, batch, str(tmp_path / "bad"),
                           batch_sizes=(2,), weights_dtype="float16")
        with pytest.raises(ValueError, match="export_dtype"):
            cfg.replace(export_dtype="fp8", export_dir="x")
        with pytest.raises(ValueError, match="export_dtype"):
            cfg.replace(export_dtype="bfloat16", export_dir=None)

    def test_driver_hook_passes_dtype(self, av_export, tmp_path):
        from mla_tpu.runtime.export import export_from_driver
        cfg, model, state, batch, _ = av_export
        cfg2 = cfg.replace(export_dir=str(tmp_path / "d"),
                           export_batch_sizes=(4,),
                           export_dtype="bfloat16")
        export_from_driver(cfg2, model, state, batch)
        srv = load_serving(cfg2.export_dir)
        assert srv.meta["weights_dtype"] == "bfloat16"
        import ml_dtypes
        leaf = jax.tree.leaves(srv.weights[0])[0]
        assert leaf.dtype == ml_dtypes.bfloat16


class TestExportInt8:
    def test_quantize_dequantize_law(self):
        """Symmetric per-channel int8: |deq - w| <= scale/2 + bf16 rounding
        per element; embeddings scale per ROW, 2-D kernels per column,
        stacked kernels per (layer, out)."""
        from mla_tpu.runtime.export import _quantize_int8, dequantize_int8
        rng = np.random.default_rng(0)
        params = {
            "enc": {"kernel": rng.standard_normal((128, 64))
                    .astype(np.float32) * 0.07,
                    "bias": rng.standard_normal(64).astype(np.float32)},
            "emb": {"embedding": rng.standard_normal((512, 32))
                    .astype(np.float32) * 3.0},
            "blocks": {"kernel": rng.standard_normal((4, 96, 96))
                       .astype(np.float32)},
        }
        q = _quantize_int8(params)
        assert q["enc"]["kernel"]["q8"].dtype == np.int8
        assert q["enc"]["kernel"]["scale"].shape == (1, 64)
        assert q["emb"]["embedding"]["scale"].shape == (512, 1)
        assert q["blocks"]["kernel"]["scale"].shape == (4, 1, 96)
        import ml_dtypes
        assert q["enc"]["bias"].dtype == ml_dtypes.bfloat16  # small -> bf16
        deq = jax.tree.map(np.asarray, dequantize_int8(
            jax.tree.map(jnp.asarray, q)))
        for path in (("enc", "kernel"), ("emb", "embedding"),
                     ("blocks", "kernel")):
            w = params[path[0]][path[1]]
            scale = q[path[0]][path[1]]["scale"]
            err = np.abs(deq[path[0]][path[1]].astype(np.float32) - w)
            # 0.5*scale quantization + ~0.4% bf16 rounding of q*scale
            bound = 0.5 * scale + 0.008 * np.abs(w) + 1e-7
            assert (err <= np.broadcast_to(bound, w.shape)).all(), err.max()

    def test_split_q8_routing(self):
        """split_q8 puts int8 at the kernel positions the fused consumers
        read (QDense qkv/proj/fc1/fc2, m3ae text_embedding/image_kernel),
        mirrors their scales into the 'q8' collection, and dequantizes
        everything else (convs, fusion heads) exactly as round 3 did."""
        from mla_tpu.runtime.export import (_quantize_int8, dequantize_int8,
                                            split_q8)
        rng = np.random.default_rng(2)
        params = {
            "attn": {"qkv": {"kernel": rng.standard_normal((96, 96))
                             .astype(np.float32)}},
            "conv": {"kernel": rng.standard_normal((3, 3, 32, 64))
                     .astype(np.float32)},
            "fusion_module": {"kernel": rng.standard_normal((128, 64))
                              .astype(np.float32)},
            "text_embedding": rng.standard_normal((512, 32))
            .astype(np.float32),
        }
        q = jax.tree.map(jnp.asarray, _quantize_int8(params))
        p, scales = split_q8(q)
        assert p["attn"]["qkv"]["kernel"].dtype == jnp.int8
        assert scales["attn"]["qkv"]["kernel_scale"].shape == (1, 96)
        assert p["text_embedding"].dtype == jnp.int8
        assert scales["text_embedding_scale"].shape == (512, 1)
        # non-fused consumers get the round-3 in-place dequant
        deq = dequantize_int8(q)
        for path in (("conv", "kernel"), ("fusion_module", "kernel")):
            got = p[path[0]][path[1]]
            assert got.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(deq[path[0]][path[1]]))
        assert "conv" not in scales and "fusion_module" not in scales

    @pytest.mark.mid
    def test_int8_fused_matches_dequant_reference(self, tmp_path):
        """The fused serving fn (split_q8 + QDense/q8_matmul) computes the
        same function as the round-3 materialized-dequant graph: identical
        int8 weights, outputs within bf16-accumulation tolerance."""
        from mla_tpu.evals.metrics import eval_logits
        from mla_tpu.runtime.export import (dequantize_int8, make_serving_fn,
                                            split_q8, host_fetch,
                                            _quantize_int8)
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        qparams = jax.tree.map(jnp.asarray,
                               _quantize_int8(host_fetch(state.params)))
        feats = {k: jnp.asarray(batch[k]) for k in feature_keys(model)}
        feats["valid"] = jnp.ones(2, np.float32)
        serve = make_serving_fn(model, cfg, dequant=True)
        fused_out = serve(qparams, {}, feats)
        # round-3 semantics: dequantize the WHOLE tree, float QDense path
        ref_m, ref_f = eval_logits(model, cfg, dequantize_int8(qparams), {},
                                   feats, feats["valid"])
        np.testing.assert_allclose(np.asarray(fused_out["fused"], np.float32),
                                   np.asarray(ref_f, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_int8_artifact_av(self, av_export, tmp_path):
        """int8 artifact: ~4x smaller kernels than fp32, logits track the
        fp32 artifact at weight-only-quantization tolerance, predictions
        stable — with zero ServingModel changes (dequant is in the graph)."""
        import os
        cfg, model, state, batch, out32 = av_export
        out8 = str(tmp_path / "int8")
        export_serving(cfg, model, state, batch, out8, batch_sizes=(2, 4),
                       weights_dtype="int8")
        srv32, srv8 = load_serving(out32), load_serving(out8)
        assert srv8.meta["weights_dtype"] == "int8"
        s32 = os.path.getsize(os.path.join(out32, "params.msgpack"))
        s8 = os.path.getsize(os.path.join(out8, "params.msgpack"))
        assert s8 < 0.45 * s32, (s8, s32)
        feats = {k: np.asarray(batch[k]) for k in feature_keys(model)}
        a, b = srv32(feats), srv8(feats)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=0.25, atol=0.2)
        assert (np.argmax(a["fused"], -1) == np.argmax(b["fused"], -1)).all()

    def test_int8_scan_blocks_m3ae(self, tmp_path):
        """Transformer family: embedding tables (per-row scales) + stacked
        (L, ...) scan kernels (per-layer-per-out scales) quantize and the
        artifact still tracks the live graph."""
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        out = str(tmp_path / "art8")
        export_serving(cfg, model, state, batch, out, batch_sizes=(2,),
                       weights_dtype="int8")
        srv = load_serving(out)
        got = srv({k: np.asarray(batch[k]) for k in srv.feature_names})
        out_m, fused = _direct(model, cfg, state, batch, 2)
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=0.25, atol=0.2)
        assert (np.argmax(got["fused"], -1)
                == np.argmax(np.asarray(fused), -1)).all()

    def test_int8_scan_blocks_routes_stacked_and_matches_sliced(
            self, tmp_path, monkeypatch):
        """The int8+scan_blocks serving graph reads block weights through
        q8_matmul_stacked — whole (L, K, N) stacks, scalar-prefetch layer
        selection (m3ae._q8_stacked_scan) — and computes exactly what the
        per-layer nn.scan slicing computed before the rewire."""
        from mla_tpu.models import layers as mlayers
        from mla_tpu.models.m3ae import M3AEEncoder
        from mla_tpu.runtime.export import (_quantize_int8, host_fetch,
                                            make_serving_fn)
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        serve = make_serving_fn(model, cfg, dequant=True)
        params = _quantize_int8(host_fetch(state.params))
        feats = {k: jnp.asarray(np.asarray(batch[k]))
                 for k in feature_keys(model)}
        feats["valid"] = jnp.ones(cfg.batch_size, jnp.float32)

        calls = []
        orig = mlayers.q8_matmul_stacked

        def spy(x, q8, scale, layer, **kw):
            calls.append(tuple(q8.shape))
            return orig(x, q8, scale, layer, **kw)

        monkeypatch.setattr(mlayers, "q8_matmul_stacked", spy)
        got = jax.jit(serve)(params, state.batch_stats or {}, feats)
        # every block Dense site (qkv/proj/fc1/fc2) saw the FULL stack
        depth = 2  # m3ae 'debug'
        assert calls and all(s[0] == depth and len(s) == 3 for s in calls)

        # force the old nn.scan sliced path: same numbers exactly
        monkeypatch.setattr(M3AEEncoder, "_blocks_q8_stacked",
                            lambda self: False)
        ref = jax.jit(serve)(params, state.batch_stats or {}, feats)
        for k in got:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       rtol=0, atol=1e-6)

    def test_int8_a8_artifact_m3ae(self, tmp_path):
        """W8A8 (--export_dtype int8_a8): same weight bytes as int8, the
        graph additionally quantizes activations per-row at the QDense
        sites (layers.q8_a8_enabled trace switch) — logits track the live
        fp32-weight graph within the W8A8 band, predictions stable, and
        the switch is reset after the trace."""
        from mla_tpu.models import layers as mlayers
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        out = str(tmp_path / "art8a8")
        assert not mlayers.q8_a8_enabled
        export_serving(cfg, model, state, batch, out, batch_sizes=(2,),
                       weights_dtype="int8_a8")
        assert not mlayers.q8_a8_enabled      # trace switch restored
        srv = load_serving(out)
        assert srv.meta["weights_dtype"] == "int8_a8"
        got = srv({k: np.asarray(batch[k]) for k in srv.feature_names})
        out_m, fused = _direct(model, cfg, state, batch, 2)
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=0.3, atol=0.25)
        assert (np.argmax(got["fused"], -1)
                == np.argmax(np.asarray(fused), -1)).all()

    def test_a8_outlier_guard_calibration(self, tmp_path):
        """calibrate_a8 (the W8A8 outlier guard): every a8-eligible QDense
        site reports its worst-row activation-quantization error through
        the layers.q8_a8_report hook; threshold=0 skips every site,
        threshold=inf skips none, and a fully-skipped a8 graph computes
        the weight-only graph's numbers."""
        from mla_tpu.models import layers as mlayers
        from mla_tpu.runtime.export import (_quantize_int8, calibrate_a8,
                                            host_fetch, make_serving_fn)
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        params = _quantize_int8(host_fetch(state.params))
        feats = {k: np.asarray(batch[k]) for k in feature_keys(model)}
        feats["valid"] = np.ones(2, np.float32)
        errs, skip_all = calibrate_a8(model, cfg, params, {}, feats,
                                      threshold=0.0)
        assert errs, "no QDense site reported a calibration error"
        assert all(v > 0.0 for v in errs.values())
        names = {s.rsplit("/", 1)[-1] for s in errs}
        assert {"qkv", "proj", "fc1", "fc2"} <= names, names
        assert skip_all == frozenset(errs)
        _, skip_none = calibrate_a8(model, cfg, params, {}, feats,
                                    threshold=float("inf"))
        assert skip_none == frozenset()
        assert mlayers.q8_a8_report is None     # hook restored
        assert mlayers.q8_a8_skip == frozenset()  # trace globals restored

        # all sites skipped: the a8 graph IS the weight-only graph
        serve_skip = make_serving_fn(model, cfg, dequant=True, a8=True,
                                     a8_skip=skip_all)
        serve_w8 = make_serving_fn(model, cfg, dequant=True)
        jf = {k: jnp.asarray(v) for k, v in feats.items()}
        a = serve_skip(params, {}, jf)
        b = serve_w8(params, {}, jf)
        for k in a:
            # stacked (weight-only) vs sliced (a8 keeps nn.scan) weight
            # reads reassociate the same math — 1e-5 band, not bitwise
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=0, atol=1e-5)

    @pytest.mark.mid
    def test_a8_accuracy_on_trained_weights(self, tmp_path):
        """W8A8 evidence on TRAINED weights (VERDICT r4 #7): random-init
        accuracy checks miss exactly the failure mode W8A8 has — trained
        activation distributions with outlier channels. Train the debug
        m3ae for 30 steps (loss must drop), export bf16 and int8_a8
        artifacts from the SAME state, and require: per-site calibration
        errors recorded, fused-logit agreement with the bf16 artifact on
        every eval row, and bounded relative logit error."""
        from mla_tpu.train import optim, steps
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=8, n_test=4)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=4, data_root=root, train=True).validate()
        model, state, batch = _state_and_batch(cfg)
        spec = optim.make_spec(cfg)
        step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=8),
                       donate_argnums=0)
        losses = []
        for i in range(30):
            state, m = step(state, batch, jnp.float32(5e-3), jnp.int32(i),
                            jnp.int32(0))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

        out16 = str(tmp_path / "bf16")
        out8 = str(tmp_path / "a8")
        export_serving(cfg, model, state, batch, out16, batch_sizes=(4,),
                       weights_dtype="bfloat16")
        export_serving(cfg, model, state, batch, out8, batch_sizes=(4,),
                       weights_dtype="int8_a8")
        srv16, srv8 = load_serving(out16), load_serving(out8)
        errs = srv8.meta["a8_site_rel_err"]
        assert errs and all(v > 0 for v in errs.values())
        feats = {k: np.asarray(batch[k]) for k in srv16.feature_names}
        a, b = srv16(feats), srv8(feats)
        agree = (np.argmax(a["fused"], -1) == np.argmax(b["fused"], -1))
        assert agree.all(), f"prediction flips on trained weights: {agree}"
        rel = (np.abs(a["fused"] - b["fused"]).max()
               / max(np.abs(a["fused"]).max(), 1e-9))
        assert rel < 0.35, f"trained-weight W8A8 logit error {rel:.3f}"

    @pytest.mark.mid
    def test_a8_guard_bakes_into_artifact(self, tmp_path, monkeypatch):
        """export_serving(int8_a8) runs the guard on the example batch and
        bakes the verdict into the traced artifact: with a threshold-0
        guard (every site an outlier) the exported graph is the weight-only
        one, meta records a8_skip + per-site errors, and logits match the
        plain int8 artifact."""
        from mla_tpu.runtime import export as export_mod
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        out8, outg = str(tmp_path / "w8"), str(tmp_path / "a8guard")
        export_serving(cfg, model, state, batch, out8, batch_sizes=(2,),
                       weights_dtype="int8")
        monkeypatch.setattr(export_mod, "A8_REL_THRESHOLD", 0.0)
        export_serving(cfg, model, state, batch, outg, batch_sizes=(2,),
                       weights_dtype="int8_a8")
        srv8, srvg = load_serving(out8), load_serving(outg)
        assert srvg.meta["a8_skip"], "guard skipped nothing at threshold 0"
        assert set(srvg.meta["a8_skip"]) == set(srvg.meta["a8_site_rel_err"])
        assert all(v > 0 for v in srvg.meta["a8_site_rel_err"].values())
        assert srv8.meta["a8_skip"] == []       # int8 artifact: no guard
        feats = {k: np.asarray(batch[k]) for k in srv8.feature_names}
        a, b = srv8(feats), srvg(feats)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=0, atol=1e-4)


class TestExportCLIP:
    def test_clip_fusion_module_path(self, tmp_path):
        """Non-gs branch: fused head + sliced per-modality logits survive
        the export (params['fusion_module'] slicing is inside the graph)."""
        root = str(tmp_path / "clip")
        synthetic.make_clip(root, n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", clip=True, batch_size=4,
                        data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        out = str(tmp_path / "art")
        export_serving(cfg, model, state, batch, out, batch_sizes=(4,))
        srv = load_serving(out)
        feats = {k: np.asarray(batch[k]) for k in feature_keys(model)}
        got = srv(feats)
        out_m, fused = _direct(model, cfg, state, batch, 4)
        # two independently compiled bf16 graphs: one-ulp fusion rounding
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(got["logits_v"], np.asarray(out_m["v"]),
                                   rtol=1e-2, atol=1e-2)


class TestExportScanBlocks:
    @pytest.mark.mid
    def test_scan_blocks_model_round_trip(self, tmp_path):
        """large/huge deployments use --scan_blocks (stacked block params):
        the lax.scan block stack and its (L, ...) param layout must survive
        export/deserialize. Debug size keeps the CPU compile small."""
        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", scan_blocks=True, image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        assert "blocks" in state.params["mae_a"]  # stacked layout in play
        out = str(tmp_path / "art")
        export_serving(cfg, model, state, batch, out, batch_sizes=(2,))
        srv = load_serving(out)
        got = srv({k: np.asarray(batch[k]) for k in srv.feature_names})
        out_m, fused = _direct(model, cfg, state, batch, 2)
        # two independently compiled bf16 graphs round within one ulp of the
        # logit scale (XLA fuses each differently)
        for m in ("a", "v"):
            np.testing.assert_allclose(got[f"logits_{m}"],
                                       np.asarray(out_m[m]),
                                       rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=1e-2, atol=1e-2)


class TestServeCLI:
    def test_batch_inference_cli(self, av_export, tmp_path, capsys):
        """python -m mla_tpu.runtime.serve: npz in -> chunked logits out."""
        from mla_tpu.runtime import serve

        cfg, model, state, batch, out = av_export
        keys = feature_keys(model)
        # 7 examples across a 4-rung artifact -> two chunks (4 + 3-padded);
        # float features cross the boundary as float32 (npz-safe even when
        # the Loader emitted bfloat16)
        def np32(a):
            a = np.asarray(a)
            return a.astype(np.float32) if jnp.issubdtype(
                a.dtype, jnp.floating) else a
        feats = {k: np.concatenate([np32(batch[k]), np32(batch[k])[:3]])
                 for k in keys}
        inp = str(tmp_path / "feats.npz")
        outp = str(tmp_path / "preds.npz")
        label = np.concatenate([np.asarray(batch["label"]),
                                np.asarray(batch["label"])[:3]])
        np.savez(inp, label=label, **feats)
        serve.main(["--artifact", out, "--input", inp,
                    "--output", outp, "--topk", "3"])
        # labeled npz -> accuracy in the summary line
        out_line = capsys.readouterr().out.strip().splitlines()[-1]
        assert 0.0 <= json.loads(out_line)["accuracy"] <= 1.0
        with np.load(outp) as z:
            assert z["fused"].shape == (7, cfg.n_classes)
            assert z["topk"].shape == (7, 3)
            # chunking == direct serving on each slice
            srv = load_serving(out)
            direct = srv({k: v[:4] for k, v in feats.items()})
            np.testing.assert_array_equal(z["fused"][:4], direct["fused"])
            assert (z["topk"][:, 0]
                    == np.argmax(z["fused"], axis=1)).all()

    def test_missing_feature_exits(self, av_export, tmp_path):
        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        inp = str(tmp_path / "feats.npz")
        np.savez(inp, spec=np.asarray(batch["spec"]))
        with pytest.raises(SystemExit, match="missing features"):
            serve.main(["--artifact", out, "--input", inp])


class TestHTTPServer:
    def test_predict_meta_health_and_errors(self, av_export):
        """--http mode: npz request/response over a real socket."""
        import io
        import threading
        import urllib.request
        from urllib.error import HTTPError

        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        httpd = serve.make_server(srv, port=0)  # ephemeral port
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            with urllib.request.urlopen(f"{base}/healthz") as r:
                assert json.loads(r.read())["ok"] is True
            with urllib.request.urlopen(f"{base}/meta") as r:
                assert json.loads(r.read())["family"] == "AVClassifier"

            keys = feature_keys(model)
            feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                     for k in keys}
            buf = io.BytesIO()
            np.savez(buf, **{k: v[:3] for k, v in feats.items()})
            req = urllib.request.Request(f"{base}/predict",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req) as r:
                with np.load(io.BytesIO(r.read())) as z:
                    got = {k: z[k] for k in z.files}
            direct = srv({k: v[:3] for k, v in feats.items()})
            np.testing.assert_array_equal(got["fused"], direct["fused"])

            # malformed request -> 400, not a dead server
            bad = urllib.request.Request(f"{base}/predict", data=b"junk",
                                         method="POST")
            with pytest.raises(HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 400
            with urllib.request.urlopen(f"{base}/healthz") as r:
                assert r.status == 200

            # malformed Content-Length HEADER also gets a 400 (parse is
            # inside the error surface, review follow-up)
            import http.client
            c = http.client.HTTPConnection("127.0.0.1",
                                           httpd.server_address[1])
            c.putrequest("POST", "/predict")
            c.putheader("Content-Length", "abc")
            c.endheaders()
            assert c.getresponse().status == 400
            c.close()
            with urllib.request.urlopen(f"{base}/healthz") as r:
                assert r.status == 200
        finally:
            httpd.shutdown()
            httpd.server_close()


class TestCoalescing:
    """Dynamic request coalescing (serve.Batcher): concurrent rung-sized
    requests merge into one device dispatch. Contract: a coalesced batch ==
    one merged request of the same rows (per-modality logits row-independent;
    the dynamic fused head is batch-coupled by the reference's own
    batch-axis gating, main.py:65-70, so composition is part of the
    semantics there — same as run_batch chunking)."""

    def test_dispatch_splits_exactly(self, av_export):
        """_dispatch on a hand-built batch == one merged call, sliced."""
        from concurrent.futures import Future

        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in keys}
        b = serve.Batcher(srv, wait_ms=1.0)
        try:
            slices = [(0, 2), (2, 3), (3, 4)]
            items = []
            for lo, hi in slices:
                items.append(({k: v[lo:hi] for k, v in feats.items()},
                              hi - lo, Future(), 0.0))
            b._dispatch(items, 4)
            merged = srv(feats)
            for (lo, hi), (_, _, fut, _) in zip(slices, items):
                got = fut.result(timeout=5)
                for k in merged:
                    np.testing.assert_array_equal(got[k], merged[k][lo:hi])
            assert b.stats == {"requests": 3, "rows": 4, "dispatches": 1,
                               "coalesced_batches": 1}
        finally:
            b.close()

    def test_concurrent_submits_coalesce(self, av_export):
        """4 concurrent 1-row submits fill the 4-rung in ONE dispatch;
        per-modality logits match direct single-request serving."""
        import threading

        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in keys}
        b = serve.Batcher(srv, wait_ms=2000.0)
        results = {}

        def one(i):
            results[i] = b.submit({k: v[i:i + 1] for k, v in feats.items()})

        try:
            ts = [threading.Thread(target=one, args=(i,)) for i in range(4)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=30)
            assert b.stats["requests"] == 4
            assert b.stats["dispatches"] == 1  # the rung filled, no timeout
            assert b.stats["coalesced_batches"] == 1
            for i in range(4):
                direct = srv({k: v[i:i + 1] for k, v in feats.items()})
                for m in ("a", "v"):  # row-independent heads; solo runs the
                    # b=2 rung, coalesced the b=4 rung — different compiled
                    # graphs, so bf16 graph-to-graph rounding tolerance
                    np.testing.assert_allclose(
                        results[i][f"logits_{m}"], direct[f"logits_{m}"],
                        rtol=1e-2, atol=2e-3)
        finally:
            b.close()

    def test_carry_when_rung_overflows(self, av_export):
        """A request that would overflow the closing batch opens the next
        one; both dispatches match solo serving exactly."""
        import threading
        import time as _time

        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in keys}
        b = serve.Batcher(srv, wait_ms=300.0)
        results = {}

        def one(name, lo, hi, delay):
            _time.sleep(delay)
            results[name] = b.submit(
                {k: v[lo:hi] for k, v in feats.items()})

        try:
            # 3-row first + 2-row second > the 4-row rung -> second carries
            ts = [threading.Thread(target=one, args=("first", 0, 3, 0.0)),
                  threading.Thread(target=one, args=("second", 2, 4, 0.1))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=30)
            assert b.stats["dispatches"] == 2
            assert b.stats["coalesced_batches"] == 0
            for name, (lo, hi) in (("first", (0, 3)), ("second", (2, 4))):
                direct = srv({k: v[lo:hi] for k, v in feats.items()})
                for k in direct:
                    np.testing.assert_array_equal(results[name][k],
                                                  direct[k])
        finally:
            b.close()

    def test_validation_precedes_enqueue(self, av_export):
        """Malformed requests are rejected in the caller's thread and never
        reach (or poison) a coalesced batch."""
        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        keys = feature_keys(model)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in keys}
        b = serve.Batcher(srv, wait_ms=1.0)
        try:
            bad = dict(feats)
            bad["spec"] = bad["spec"][..., :5]  # wrong per-sample shape
            with pytest.raises(ValueError, match="per-sample shape"):
                b.submit(bad)
            ragged = {k: (v[:1] if k == "spec" else v[:2])
                      for k, v in feats.items()}
            with pytest.raises(ValueError, match="rows, expected"):
                b.submit(ragged)
            over = {k: np.concatenate([v, v]) for k, v in feats.items()}
            with pytest.raises(ValueError, match="largest exported rung"):
                b.submit(over)
            assert b.stats["requests"] == 0
            got = b.submit({k: v[:1] for k, v in feats.items()})
            direct = srv({k: v[:1] for k, v in feats.items()})
            np.testing.assert_array_equal(got["fused"], direct["fused"])
        finally:
            b.close()

    def test_http_coalescing_end_to_end(self, av_export):
        """--coalesce_ms server: concurrent POSTs succeed, /stats reports
        the batcher counters, oversized requests bypass to run_batch."""
        import io
        import threading
        import urllib.request

        from mla_tpu.runtime import serve

        _, model, _, batch, out = av_export
        srv = load_serving(out)
        httpd = serve.make_server(srv, port=0, coalesce_ms=100.0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        keys = feature_keys(model)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in keys}

        def post(rows):
            buf = io.BytesIO()
            np.savez(buf, **rows)
            req = urllib.request.Request(f"{base}/predict",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req) as r:
                with np.load(io.BytesIO(r.read())) as z:
                    return {k: z[k] for k in z.files}

        try:
            outs = {}
            ts = [threading.Thread(
                target=lambda i=i: outs.update(
                    {i: post({k: v[i:i + 1] for k, v in feats.items()})}))
                for i in range(3)]
            for th in ts:
                th.start()
            for th in ts:
                th.join(timeout=30)
            assert set(outs) == {0, 1, 2}
            for i in range(3):
                assert outs[i]["fused"].shape == (1, srv.meta["n_classes"])
            with urllib.request.urlopen(f"{base}/stats") as r:
                stats = json.loads(r.read())
            assert stats["coalesce_ms"] == 100.0
            assert stats["requests"] >= 3
            # oversized (5 rows > rung 4): bypasses the batcher, chunks
            big = {k: np.concatenate([v, v[:1]]) for k, v in feats.items()}
            got = post(big)
            assert got["fused"].shape == (5, srv.meta["n_classes"])
        finally:
            httpd.shutdown()
            httpd.server_close()
            httpd.batcher.close()

    def test_close_resolves_stranded_futures(self):
        """close() must not leave a queued request blocked forever on
        fut.result(); it drains queue+carry with a typed server-side error
        (advisor r3). Uses a stub model whose dispatch blocks so a second
        request is provably still queued at close time."""
        import threading
        import time as _time

        from mla_tpu.runtime import serve

        class Stub:
            feature_names = ["x"]
            batch_sizes = [1]

            def __init__(self):
                self.go = threading.Event()

            def validate_request(self, feats):
                return int(np.asarray(feats["x"]).shape[0])

            def __call__(self, feats):
                self.go.wait(10)
                return {"fused": np.asarray(feats["x"])}

        stub = Stub()
        b = serve.Batcher(stub, wait_ms=20.0)
        res = {}

        def call(name):
            try:
                res[name] = b.submit({"x": np.ones((1, 2), np.float32)})
            except Exception as e:  # noqa: BLE001
                res[name] = e

        t1 = threading.Thread(target=call, args=("a",))
        t1.start()
        _time.sleep(0.3)          # worker now blocked inside dispatch of 'a'
        t2 = threading.Thread(target=call, args=("b",))
        t2.start()
        _time.sleep(0.2)          # 'b' sits in the queue (rung is 1 row)
        closer = threading.Thread(target=b.close)
        closer.start()
        _time.sleep(0.1)
        stub.go.set()             # unblock the in-flight dispatch
        for t in (closer, t1, t2):
            t.join(timeout=15)
        assert isinstance(res["b"], serve.DispatchError)   # stranded -> typed
        assert isinstance(res["a"], dict)                  # in-flight finished
        with pytest.raises(serve.DispatchError, match="closed"):
            b.submit({"x": np.ones((1, 2), np.float32)})


@pytest.mark.slow
class TestExportModal3QMF:
    def test_modal3_qmf_round_trip(self, tmp_path):
        """Third heavy family (CAV-MAE + 2x M3AE) and the QMF
        energy-confidence fusion branch of eval_logits, through the
        artifact. Slow tier: the CAV-MAE S=512 stack is a heavy CPU
        compile."""
        root = str(tmp_path / "iemo")
        synthetic.make_iemocap(root, n_train=4, n_test=4)
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        modulation="QMF", mask_percent=0.5, batch_size=2,
                        data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        out = str(tmp_path / "art")
        export_serving(cfg, model, state, batch, out, batch_sizes=(2,))
        srv = load_serving(out)
        assert srv.meta["family"] == "Modal3Classifier"
        assert set(srv.feature_names) == {"fbank", "image", "token",
                                          "padding_mask", "valid"} - {"valid"}
        got = srv({k: np.asarray(batch[k]) for k in srv.feature_names})
        out_m, fused = _direct(model, cfg, state, batch, 2)
        # two independently compiled bf16 graphs: one-ulp fusion rounding
        np.testing.assert_allclose(got["fused"], np.asarray(fused),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(got["logits_t"], np.asarray(out_m["t"]),
                                   rtol=1e-2, atol=1e-2)


@pytest.mark.slow
class TestTorchCkptToArtifact:
    def test_reference_pth_to_serving_artifact(self, tmp_path):
        """The migration path for a reference user: their trained torch .pth
        -> eval-only driver (torch->flax shim, driver.py .pth branch) ->
        serving artifact; artifact logits reproduce the driver's eval
        accuracy. Covers the driver's .pth eval-only branch end-to-end
        (ab_harness covers the shim numerics; this covers the wiring)."""
        import torch
        import torch.nn as nn

        import ab_harness
        from mla_tpu.runtime.driver import run

        root = str(tmp_path / "cre")
        synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
        # full ResNet-18 stages: the reference model is not depth-reducible
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        image_size=32, batch_size=4, data_root=root,
                        train=False, num_workers=0,
                        use_tensorboard=False,
                        export_dir=str(tmp_path / "art"),
                        export_batch_sizes=(4,)).validate()

        ref = ab_harness.load_reference()
        args = ab_harness.ref_namespace(cfg, 0.55)
        ref.setup_seed(cfg.random_seed)
        tmodel = ref.AVClassifier(args)
        tmodel.apply(ref.weight_init)
        tmodel = nn.DataParallel(tmodel)     # main.py:732 ('module.' prefix)
        pth = str(tmp_path / "trained.pth")
        torch.save({"model": tmodel.state_dict()}, pth)

        _, accs = run(cfg.replace(ckpt_path=pth))
        srv = load_serving(cfg.export_dir)
        assert srv.meta["family"] == "AVClassifier"

        ad = build_adapter(cfg, "test")
        gen = Loader(ad, cfg.batch_size, shuffle=False, seed=0).epoch(0)
        batch = next(gen)
        gen.close()
        got = srv({k: np.asarray(batch[k]) for k in srv.feature_names})
        acc = float(np.mean(np.argmax(got["fused"], axis=1)
                            == np.asarray(batch["label"])))
        assert abs(acc - accs["acc"]) < 1e-6


class TestDriverExportHook:
    @pytest.mark.mid
    def test_eval_only_export(self, tmp_path):
        """--export_dir on the eval-only branch writes a loadable artifact
        whose fused logits reproduce the driver's own eval accuracy."""
        from mla_tpu.runtime.driver import run

        root = str(tmp_path / "cre")
        synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        image_size=32, resnet_stages=(1, 1, 1, 1),
                        batch_size=4, data_root=root, train=True, epochs=1,
                        ckpt_path=str(tmp_path / "ck"),
                        use_tensorboard=False, num_workers=0,
                        export_dir=str(tmp_path / "art"),
                        export_batch_sizes=(4,)).validate()
        _, result = run(cfg, max_steps_per_epoch=1)
        srv = load_serving(cfg.export_dir)

        # score the test split through the artifact only
        ad = build_adapter(cfg, "test")
        gen = Loader(ad, cfg.batch_size, shuffle=False, seed=0).epoch(0)
        batch = next(gen)
        gen.close()
        feats = {k: np.asarray(batch[k]) for k in srv.feature_names}
        got = srv(feats)
        acc = float(np.mean(np.argmax(got["fused"], axis=1)
                            == np.asarray(batch["label"])))
        assert abs(acc - result["history"][-1]["acc"]) < 1e-6


class TestExportSharded:
    def test_tp_sharded_artifact_matches_single_device(self, tmp_path):
        """export_serving_sharded (VERDICT r3 #7): the artifact's weights
        live Megatron-sharded over the (data, model) mesh, the serialized
        graph runs with those shardings, and the logits match the
        single-device artifact. jnp-reference attention is traced in (no
        custom_partitioning callbacks in the serialized bytes)."""
        from jax.sharding import PartitionSpec as P

        from mla_tpu.parallel.mesh import make_mesh
        from mla_tpu.runtime.export import (export_serving,
                                            export_serving_sharded,
                                            load_serving,
                                            load_serving_sharded)

        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        mesh = make_mesh(mesh_shape=(4, 2))

        out_s = str(tmp_path / "sharded")
        export_serving_sharded(cfg, model, state, batch, out_s, mesh,
                               batch_sizes=(2,))
        out_1 = str(tmp_path / "single")
        export_serving(cfg, model, state, batch, out_1, batch_sizes=(2,))

        srv = load_serving_sharded(out_s)
        assert srv.meta["mesh_shape"] == [4, 2]
        qkv = srv._params["mae_v"]["block_0"]["attn"]["qkv"]["kernel"]
        assert "model" in qkv.sharding.spec, qkv.sharding
        feats = {k: np.asarray(batch[k]) for k in srv.feature_names}
        got = srv(feats)
        ref = load_serving(out_1)(feats)
        for k in ref:
            # different partitioning -> different bf16 reduction/fusion
            # order (the model computes in the default bf16); same band as
            # the cross-graph padding test
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-2, atol=5e-3)
        assert (np.argmax(got["fused"], -1)
                == np.argmax(ref["fused"], -1)).all()
        # wrong-shape mesh is rejected with direction
        with pytest.raises(ValueError, match="exported for mesh"):
            load_serving_sharded(out_s, make_mesh(mesh_shape=(2, 4)))

    def test_sharded_artifact_through_serve_front_end(self, tmp_path):
        """VERDICT r4 #10: the HTTP batcher/coalescer composes with
        ShardedServingModel — load_artifact auto-detects the artifact kind
        from meta.json, and two concurrent 1-row submits merge into ONE
        sharded device dispatch whose rows equal the merged direct call."""
        import threading

        from mla_tpu.parallel.mesh import make_mesh
        from mla_tpu.runtime import serve
        from mla_tpu.runtime.export import (ShardedServingModel,
                                            export_serving_sharded,
                                            load_artifact)

        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        mesh = make_mesh(mesh_shape=(4, 2))
        out_s = str(tmp_path / "sharded")
        export_serving_sharded(cfg, model, state, batch, out_s, mesh,
                               batch_sizes=(2,))

        srv = load_artifact(out_s)
        assert isinstance(srv, ShardedServingModel)
        feats = {k: np.asarray(jnp.asarray(batch[k], jnp.float32))
                 for k in srv.feature_names}
        b = serve.Batcher(srv, wait_ms=2000.0)
        results = {}

        def one(i):
            results[i] = b.submit({k: v[i:i + 1] for k, v in feats.items()})

        try:
            ts = [threading.Thread(target=one, args=(i,)) for i in range(2)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=60)
            assert b.stats["dispatches"] == 1
            assert b.stats["coalesced_batches"] == 1
            merged = srv(feats)
            for i in range(2):
                for k in merged:
                    np.testing.assert_array_equal(results[i][k],
                                                  merged[k][i:i + 1])
        finally:
            b.close()
        # a mesh argument on a single-device artifact is a usage error
        out_1 = str(tmp_path / "single")
        export_serving(cfg, model, state, batch, out_1, batch_sizes=(2,))
        assert type(load_artifact(out_1)).__name__ == "ServingModel"
        with pytest.raises(ValueError, match="single-device"):
            load_artifact(out_1, mesh)

    def test_sharded_export_rejects_int8_and_pure_dp(self, tmp_path):
        from mla_tpu.parallel.mesh import make_mesh
        from mla_tpu.runtime.export import export_serving_sharded

        root = str(tmp_path / "m3")
        synthetic.make_m3ae(root, dataset="Food101", n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        m3ae_size="debug", image_size=32,
                        batch_size=2, data_root=root).validate()
        model, state, batch = _state_and_batch(cfg)
        with pytest.raises(ValueError, match="float32/bfloat16"):
            export_serving_sharded(cfg, model, state, batch,
                                   str(tmp_path / "x"),
                                   make_mesh(mesh_shape=(4, 2)),
                                   weights_dtype="int8")
        with pytest.raises(ValueError, match="model axis"):
            export_serving_sharded(cfg, model, state, batch,
                                   str(tmp_path / "x"),
                                   make_mesh(mesh_shape=(8, 1)))
