"""Observability contract (VERDICT r2 weak #6): the driver must emit the
exact TensorBoard scalar groups/names the reference emits
(reference: main.py:865-893), so curve-to-curve comparison against reference
runs works. A recording stub replaces the SummaryWriter — the contract is
pinned even when tensorboardX is absent."""

import numpy as np
import pytest

from mla_tpu.core.config import MLAConfig
from mla_tpu.data import synthetic


class _RecordingWriter:
    def __init__(self):
        self.calls = []          # (group, {name: value}, step)

    def add_scalars(self, group, scalars, step):
        self.calls.append((group, dict(scalars), step))


@pytest.fixture()
def stub_writer(monkeypatch):
    from mla_tpu.runtime import driver
    w = _RecordingWriter()
    monkeypatch.setattr(driver, "_writer", lambda cfg: w)
    return w


def _run_one_epoch(cfg, tmp_path):
    from mla_tpu.runtime.driver import run
    return run(cfg, max_steps_per_epoch=1)


class TestScalarNameContract:
    @pytest.mark.mid
    def test_two_modal_groups_and_names(self, stub_writer, tmp_path):
        root = str(tmp_path / "cre")
        synthetic.make_cremad(root, n_train=4, n_test=4, spec_shape=(64, 80))
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        image_size=32, resnet_stages=(1, 1, 1, 1),
                        train=True, epochs=1, batch_size=4, data_root=root,
                        ckpt_path=str(tmp_path / "ck"), save_last=False,
                        num_workers=2, log_every=10).validate()
        _run_one_epoch(cfg, tmp_path)
        groups = {c[0] for c in stub_writer.calls}
        assert groups == {"Loss", "Evaluation"}
        loss = next(c for c in stub_writer.calls if c[0] == "Loss")
        ev = next(c for c in stub_writer.calls if c[0] == "Evaluation")
        # exact 2-modal names (reference main.py:887-893)
        assert set(loss[1]) == {"Total Loss", "Audio Loss", "Visual Loss"}
        assert set(ev[1]) == {"Total Accuracy", "Audio Accuracy",
                              "Visual Accuracy"}
        assert loss[2] == 0 and ev[2] == 0   # step = epoch
        for v in list(loss[1].values()) + list(ev[1].values()):
            assert np.isfinite(v)

    def test_modal3_adds_text_names(self):
        """modal3 adds the Text pair (reference main.py:865-873). Unit-level
        via the driver's scalar_groups helper (a full modal3 m3ae driver run
        is slow-tier CPU work; the 2-modal test above covers the wiring)."""
        from mla_tpu.runtime.driver import scalar_groups
        cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                        gs_flag=True).validate()
        metrics = {"loss": 1.0, "loss_a": 0.5, "loss_v": 0.3, "loss_t": 0.2}
        accs = {"acc": 0.9, "acc_a": 0.7, "acc_v": 0.6, "acc_t": 0.5}
        loss, ev = scalar_groups(cfg, metrics, accs)
        assert set(loss) == {"Total Loss", "Audio Loss", "Visual Loss",
                             "Text Loss"}
        assert set(ev) == {"Total Accuracy", "Audio Accuracy",
                           "Visual Accuracy", "Text Accuracy"}
        assert loss["Text Loss"] == 0.2 and ev["Text Accuracy"] == 0.5

    def test_missing_tensorboardx_is_silent_noop(self, monkeypatch, tmp_path):
        """driver._writer returns None when tensorboardX is unavailable; the
        epoch loop must run without it (reference requires tensorboardX)."""
        import builtins
        real_import = builtins.__import__

        def no_tbx(name, *a, **kw):
            if name.startswith("tensorboardX"):
                raise ImportError(name)
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", no_tbx)
        from mla_tpu.runtime import driver
        cfg = MLAConfig(use_tensorboard=True,
                        tensorboard_path=str(tmp_path)).validate()
        assert driver._writer(cfg) is None
