"""Data layer tests on synthetic fixture trees (SURVEY.md §4: shape/dtype
golden tests for every dataset adapter)."""

import numpy as np
import jax
import pytest

from mla_tpu.core.config import MLAConfig
from mla_tpu.data import synthetic
from mla_tpu.data.datasets import (AVAdapter, CAVAdapter, CLIPAdapter,
                                   M3AEAdapter, Modal3Adapter, build_adapter)
from mla_tpu.data.masking import random_mask
from mla_tpu.data.pipeline import Loader, collate_pad


@pytest.fixture(scope="module")
def cremad_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cremad"))
    synthetic.make_cremad(root, n_train=6, n_test=3, spec_shape=(129, 626))
    return root


@pytest.fixture(scope="module")
def mvsa_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mvsa"))
    synthetic.make_m3ae(root, dataset="MVSA", n_train=5, n_test=3)
    return root


@pytest.fixture(scope="module")
def iemo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("iemo"))
    synthetic.make_iemocap(root, n_train=5, n_test=3)
    return root


class TestAVAdapter:
    def test_batch_shapes(self, cremad_root):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=64,
                        data_root=cremad_root).validate()
        ad = AVAdapter(cfg, "train")
        assert len(ad) == 6
        loader = Loader(ad, batch_size=4, shuffle=True, seed=0)
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        b = batches[0]
        assert b["spec"].shape == (4, 1, 129, 626)
        assert b["image"].shape == (4, 3, 3, 64, 64)
        assert b["label"].shape == (4,)
        # second (partial) batch is padded with valid mask
        assert float(batches[1]["valid"].sum()) == 2.0
        assert int(batches[1]["idx"][-1]) == 6  # scratch slot

    def test_eval_deterministic(self, cremad_root):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=64,
                        data_root=cremad_root).validate()
        ad = AVAdapter(cfg, "test")
        loader = Loader(ad, batch_size=4, shuffle=False, seed=0)
        b1 = next(loader.epoch(0))
        b2 = next(loader.epoch(1))
        np.testing.assert_allclose(np.asarray(b1["image"]),
                                   np.asarray(b2["image"]), atol=1e-6)

    def test_train_shuffles_and_augments(self, cremad_root):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=64,
                        data_root=cremad_root).validate()
        ad = AVAdapter(cfg, "train")
        loader = Loader(ad, batch_size=6, shuffle=True, seed=0)
        b1 = next(loader.epoch(0))
        b2 = next(loader.epoch(1))
        assert not np.allclose(np.asarray(b1["image"]), np.asarray(b2["image"]))


class TestCAVAdapter:
    def test_batch(self, tmp_path):
        root = str(tmp_path)
        synthetic.make_cremad(root, n_train=4, n_test=2, fbank=True)
        cfg = MLAConfig(dataset="CREMAD", lorb="large", cav_augnois=True,
                        image_size=64, data_root=root).validate()
        ad = CAVAdapter(cfg, "train")
        b = next(Loader(ad, batch_size=4, seed=1).epoch(0))
        assert b["fbank"].shape == (4, 1024, 128)
        assert b["image"].shape == (4, 3, 64, 64)


class TestM3AEAdapter:
    def test_batch(self, mvsa_root):
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", image_size=64,
                        data_root=mvsa_root).validate()
        ad = M3AEAdapter(cfg, "train")
        b = next(Loader(ad, batch_size=5, seed=2).epoch(0))
        assert b["token"].shape == (5, 256) and b["token"].dtype == np.int32
        assert b["padding_mask"].shape == (5, 256)
        assert b["image"].shape == (5, 3, 64, 64)


class TestModal3Adapter:
    def test_batch_and_masking(self, iemo_root):
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True, image_size=64,
                        mask_percent=0.5, data_root=iemo_root).validate()
        ad = Modal3Adapter(cfg, "train")
        b = next(Loader(ad, batch_size=5, shuffle=False, seed=3).epoch(0))
        assert b["fbank"].shape == (5, 1024, 128)
        assert b["image"].shape == (5, 3, 64, 64)
        # each sample keeps at least one modality
        keep = ad.maskmatrix
        assert (keep.sum(axis=1) >= 1).all()


class TestCLIPAdapter:
    def test_batch(self, tmp_path):
        root = str(tmp_path)
        synthetic.make_clip(root, n_train=4, n_test=2)
        cfg = MLAConfig(dataset="Food101", clip=True,
                        data_root=root).validate()
        ad = CLIPAdapter(cfg, "train")
        assert len(ad) == 4
        b = next(Loader(ad, batch_size=4, seed=4).epoch(0))
        assert b["token_feat"].shape == (4, 512)
        assert b["image_feat"].shape == (4, 512)


class TestRandomMask:
    def test_rates(self):
        m = random_mask(3, 400, 0.5, np.random.default_rng(0))
        assert m.shape == (400, 3)
        assert (m.sum(axis=1) >= 1).all()
        assert abs(m.mean() - 0.5) < 0.05

    def test_tiny_dataset_no_overflow(self):
        """n=4, rate 0.5: integer collision count can hit the target count
        exactly, making the reference's correction term infinite
        (dataset.py:625) — must redraw, not OverflowError."""
        for seed in range(20):
            m = random_mask(3, 4, 0.5, np.random.default_rng(seed))
            assert m.shape == (4, 3)
            assert (m.sum(axis=1) >= 1).all()

    def test_extreme_rates(self):
        m = random_mask(3, 50, 0.9, np.random.default_rng(1))
        assert (m.sum(axis=1) == 1).all()   # exactly one view preserved
        m = random_mask(3, 50, 0.0, np.random.default_rng(1))
        assert (m == 1).all()


class TestBuildAdapter:
    def test_dispatch(self, cremad_root, mvsa_root, iemo_root):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", data_root=cremad_root)
        assert isinstance(build_adapter(cfg.validate(), "train"), AVAdapter)
        cfg = MLAConfig(dataset="MVSA", lorb="m3ae", data_root=mvsa_root)
        assert isinstance(build_adapter(cfg.validate(), "train"), M3AEAdapter)
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        data_root=iemo_root)
        assert isinstance(build_adapter(cfg.validate(), "train"), Modal3Adapter)


class TestCollate:
    def test_pad_and_scratch_idx(self):
        samples = [{"x": np.ones(3), "label": 1, "idx": 0},
                   {"x": np.zeros(3), "label": 2, "idx": 1}]
        out = collate_pad(samples, 4, n_data=10)
        assert out["x"].shape == (4, 3)
        np.testing.assert_allclose(out["valid"], [1, 1, 0, 0])
        assert list(out["idx"]) == [0, 1, 10, 10]


class TestLoaderCleanup:
    def test_abandoned_iterator_stops_producer(self, cremad_root):
        """Taking one batch and abandoning the iterator must not leak the
        producer thread / worker pool (regression: SIGABRT after many short
        epochs)."""
        import threading
        cfg = MLAConfig(dataset="CREMAD", lorb="base", image_size=64,
                        data_root=cremad_root).validate()
        ad = AVAdapter(cfg, "train")
        before = threading.active_count()
        for e in range(10):
            it = Loader(ad, batch_size=4, shuffle=True, seed=e).epoch(e)
            next(it)
            it.close()   # GeneratorExit -> stop event -> join
        after = threading.active_count()
        assert after - before <= 1, (before, after)
