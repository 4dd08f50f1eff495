"""End-to-end regime parity vs torch simulations of the reference math.

These pin the full loss compositions — not just individual pieces — using a
tiny linear "classifier" whose params are copied into both frameworks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from mla_tpu.core.config import MLAConfig
from mla_tpu.train import optim, steps
from mla_tpu.train.state import TrainState, init_qmf_state

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

B, D, C, NDATA = 6, 8, 4, 20


class TinyClassifier(nn.Module):
    """Linear encoders + shared/QMF heads with the production param layout
    (audio_net / visual_net / fusion_module / audio_fc / visual_fc)."""
    gs_flag: bool = False
    qmf: bool = False
    modal3: bool = False
    fusion_method: str = "concat"

    def setup(self):
        self.audio_net = nn.Dense(D, name="audio_net")
        self.visual_net = nn.Dense(D, name="visual_net")
        if self.gs_flag:
            from mla_tpu.models.fusion import SharedHead
            self.fusion_module = SharedHead(C, name="fusion_module")
        else:
            from mla_tpu.models.fusion import ConcatFusion
            self.fusion_module = ConcatFusion(C, name="fusion_module")
        if self.qmf:
            self.audio_fc = nn.Dense(C, name="audio_fc")
            self.visual_fc = nn.Dense(C, name="visual_fc")

    def encode(self, batch, modality, train=True):
        if modality == "a":
            return self.audio_net(batch["xa"])
        return self.visual_net(batch["xv"])

    def head(self, feat):
        return self.fusion_module(feat)

    def __call__(self, batch, train=True):
        a, v = self.encode(batch, "a"), self.encode(batch, "v")
        if self.qmf:
            return {"a": self.audio_fc(a), "v": self.visual_fc(v)}
        if self.gs_flag:
            return {"a": a, "v": v, "out_a": self.head(a), "out_v": self.head(v)}
        _, _, out = self.fusion_module(a, v)
        return {"a": a, "v": v, "out": out}


def _rand_batch(rng):
    return {"xa": jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)),
            "xv": jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)),
            "label": jnp.asarray(rng.integers(0, C, B), jnp.int32),
            "idx": jnp.asarray(rng.permutation(NDATA)[:B], jnp.int32),
            "valid": jnp.ones((B,), jnp.float32)}


def _torch_params(params):
    """flax kernel (in, out) -> torch Linear weight (out, in)."""
    out = {}
    for name in params:
        sub = params[name]
        if "fc_out" in sub:
            sub = sub["fc_out"]
        out[name] = (torch.tensor(np.asarray(sub["kernel"]).T),
                     torch.tensor(np.asarray(sub["bias"])))
    return out


def _linear(x, wb):
    return x @ wb[0].T + wb[1]


class TestQMFBaseLossParity:
    def test_loss_matches_torch_composition(self):
        """QMF base path: loss = cml + clf + 0.1*crl with post-update history
        (main.py:170-268 lorb-base branch)."""
        rng = np.random.default_rng(0)
        cfg = MLAConfig(dataset="CREMAD", lorb="base", modulation="QMF",
                        train=True).validate()
        model = TinyClassifier(qmf=True)
        batch = _rand_batch(rng)
        variables = model.init(jax.random.key(0), batch)
        params = variables["params"]
        spec = optim.OptimizerSpec(kind="sgd")
        corr0 = rng.random(NDATA + 1).astype(np.float32)
        corr0[-1] = 0
        qmf0 = init_qmf_state(NDATA, ("a", "v"))
        qmf0 = qmf0.replace(correctness={
            "a": jnp.asarray(corr0), "v": jnp.asarray(corr0 * 0.5)})
        state = TrainState(params=params, batch_stats={},
                           opt_state=optim.init_opt_state(spec, params),
                           gs=None, qmf=qmf0, rng=jax.random.key(0),
                           step=jnp.int32(0))
        step = steps.make_qmf_train_step(model, cfg, spec)
        _, metrics = jax.jit(step)(state, batch, jnp.float32(1e-3),
                                   jnp.int32(0), jnp.int32(0))

        # ---- torch re-composition (fresh implementation of main.py math) ----
        tp = _torch_params(params)
        xa, xv = torch.tensor(np.asarray(batch["xa"])), \
            torch.tensor(np.asarray(batch["xv"]))
        label = torch.tensor(np.asarray(batch["label"]), dtype=torch.long)
        idx = torch.tensor(np.asarray(batch["idx"]), dtype=torch.long)
        out_a = _linear(_linear(xa, tp["audio_net"]), tp["audio_fc"])
        out_v = _linear(_linear(xv, tp["visual_net"]), tp["visual_fc"])
        conf_a = (torch.logsumexp(out_a, dim=1) / 10).reshape(-1, 1)
        conf_v = (torch.logsumexp(out_v, dim=1) / 10).reshape(-1, 1)
        out = out_a * conf_a + out_v * conf_v
        ce = torch.nn.CrossEntropyLoss()
        clf = ce(out_a, label) + ce(out_v, label)
        cml = ce(out, label)
        per_a = torch.nn.CrossEntropyLoss(reduction="none")(out_a, label)
        per_v = torch.nn.CrossEntropyLoss(reduction="none")(out_v, label)

        def rank(conf, corr, per):
            c = torch.tensor(corr[:-1]).clone()
            c[idx] += per  # post-update history (main.py:194-199)
            c1, c2 = c[idx], c[torch.roll(idx, -1)]
            gmin, gmax = c.min(), c.max()
            n1, n2 = (c1 - gmin) / (gmax - gmin), (c2 - gmin) / (gmax - gmin)
            target = (n1 > n2).float() - (n1 < n2).float()
            margin = (n1 - n2).abs()
            tnz = target.clone()
            tnz[tnz == 0] = 1
            x2 = torch.roll(conf, -1, dims=0) + (margin / tnz).reshape(-1, 1)
            return torch.nn.MarginRankingLoss(0.0)(conf, x2,
                                                   -target.reshape(-1, 1))

        crl = rank(conf_a, corr0, per_a) + rank(conf_v, corr0 * 0.5, per_v)
        ref_loss = float(cml + clf + 0.1 * crl)
        assert abs(float(metrics["loss"]) - ref_loss) < 1e-4


class TestMLAFirstSubstepParity:
    def test_first_substep_matches_torch_sgd(self):
        """The audio sub-step (no prior in-batch update) must match a torch
        loop exactly: CE -> backward -> SGD on (audio_net, head)."""
        rng = np.random.default_rng(1)
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        train=True, ghost_updates=True).validate()
        model = TinyClassifier(gs_flag=True)
        batch = _rand_batch(rng)
        variables = model.init(jax.random.key(1), batch)
        params = variables["params"]
        spec = optim.OptimizerSpec(kind="sgd", momentum=0.9, weight_decay=1e-4)
        from mla_tpu.train.gs import init_gs_state
        state = TrainState(params=params, batch_stats={},
                           opt_state=optim.init_opt_state(spec, params),
                           gs=init_gs_state(D), qmf=None,
                           rng=jax.random.key(0), step=jnp.int32(0))
        step = steps.make_mla_train_step(model, cfg, spec, len_dl=4)
        new_state, metrics = jax.jit(step)(state, batch, jnp.float32(1e-2),
                                           jnp.int32(0), jnp.int32(0))

        # torch: replicate the audio sub-step (main.py:431-442), then the
        # ghost momentum+wd-only update the audio encoder receives during the
        # visual sub-step under torch 1.8.1 zero_grad semantics
        # (main.py:439-453; grads zeroed, not deleted).
        wa = torch.tensor(np.asarray(params["audio_net"]["kernel"]).T,
                          requires_grad=True)
        ba = torch.tensor(np.asarray(params["audio_net"]["bias"]),
                          requires_grad=True)
        wh = torch.tensor(
            np.asarray(params["fusion_module"]["fc_out"]["kernel"]).T,
            requires_grad=True)
        bh = torch.tensor(np.asarray(params["fusion_module"]["fc_out"]["bias"]),
                          requires_grad=True)
        opt_a = torch.optim.SGD([wa, ba], lr=1e-2, momentum=0.9,
                                weight_decay=1e-4)
        opt_h = torch.optim.SGD([wh, bh], lr=1e-2, momentum=0.9,
                                weight_decay=1e-4)
        xa = torch.tensor(np.asarray(batch["xa"]))
        label = torch.tensor(np.asarray(batch["label"]), dtype=torch.long)
        a = xa @ wa.T + ba
        out_a = a @ wh.T + bh
        loss_a = torch.nn.CrossEntropyLoss()(out_a, label)
        loss_a.backward()
        opt_a.step()
        opt_h.step()
        assert abs(float(metrics["loss_a"]) - float(loss_a)) < 1e-5
        # ghost update of the visual sub-step on the audio encoder
        wa.grad.zero_()
        ba.grad.zero_()
        opt_a.step()
        np.testing.assert_allclose(
            np.asarray(new_state.params["audio_net"]["kernel"]),
            wa.detach().numpy().T, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_state.params["audio_net"]["bias"]),
            ba.detach().numpy(), atol=1e-6)


class TestOGMParity:
    def test_coeffs_match_torch_2modal(self):
        rng = np.random.default_rng(2)
        out_a = rng.standard_normal((B, C)).astype(np.float32)
        out_v = rng.standard_normal((B, C)).astype(np.float32) + 1.0
        label = rng.integers(0, C, B)
        valid = jnp.ones((B,), jnp.float32)
        coeffs, _ = steps._ogm_coeffs(
            {"a": jnp.asarray(out_a), "v": jnp.asarray(out_v)},
            jnp.asarray(label, jnp.int32), valid, alpha=0.3, modal3=False)

        # torch composition (main.py:373-386)
        sm = torch.softmax
        ta, tv = torch.tensor(out_a), torch.tensor(out_v)
        tl = torch.tensor(label, dtype=torch.long)
        score_a = sum(sm(ta, dim=1)[i][tl[i]] for i in range(B))
        score_v = sum(sm(tv, dim=1)[i][tl[i]] for i in range(B))
        ratio_v = score_v / score_a
        if ratio_v > 1:
            cv = 1 - torch.tanh(0.3 * torch.relu(ratio_v))
            ca = torch.tensor(1.0)
        else:
            ca = 1 - torch.tanh(0.3 * torch.relu(1 / ratio_v))
            cv = torch.tensor(1.0)
        np.testing.assert_allclose(float(coeffs["a"]), float(ca), atol=1e-5)
        np.testing.assert_allclose(float(coeffs["v"]), float(cv), atol=1e-5)

    def test_coeffs_3modal_elif_priority(self):
        """3-modal: damp v if ratio_v>1, elif t, else a (main.py:324-338)."""
        big = jnp.full((B, C), 0.0)
        # craft: v dominant
        out = {"a": big, "v": big + 0.0, "t": big}
        label = jnp.zeros((B,), jnp.int32)
        out["v"] = out["v"].at[:, 0].set(5.0)
        coeffs, _ = steps._ogm_coeffs(out, label, jnp.ones((B,)), 0.3, True)
        assert float(coeffs["v"]) < 1.0
        assert float(coeffs["a"]) == 1.0 and float(coeffs["t"]) == 1.0

    def test_modulate_grads_scales_only_4d_of_modality(self):
        g = {"audio_net": {"conv": jnp.ones((3, 3, 2, 4)),
                           "dense": jnp.ones((8, 4))},
             "visual_net": {"conv": jnp.ones((3, 3, 2, 4))},
             "fusion_module": {"fc_out": {"kernel": jnp.ones((8, 4))}}}
        coeffs = {"a": jnp.float32(0.5), "v": jnp.float32(1.0)}
        out = steps._modulate_grads(g, coeffs, jax.random.key(0),
                                    use_ge=False, active=jnp.bool_(True),
                                    modal3=False)
        np.testing.assert_allclose(np.asarray(out["audio_net"]["conv"]), 0.5)
        np.testing.assert_allclose(np.asarray(out["audio_net"]["dense"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["visual_net"]["conv"]), 1.0)
        # window inactive -> untouched
        out2 = steps._modulate_grads(g, coeffs, jax.random.key(0),
                                     use_ge=False, active=jnp.bool_(False),
                                     modal3=False)
        np.testing.assert_allclose(np.asarray(out2["audio_net"]["conv"]), 1.0)

    def test_2modal_mae_modules_not_modulated(self):
        """Reference 2-modal OGM matches only 'audio'/'visual' name
        substrings (main.py:396-407), so lorb=m3ae/large encoders (mae_*)
        are never modulated there — parity requires the same here."""
        g = {"mae_a": {"conv": jnp.ones((3, 3, 2, 4))},
             "mae_v": {"conv": jnp.ones((3, 3, 2, 4))}}
        coeffs = {"a": jnp.float32(0.5), "v": jnp.float32(0.5)}
        out = steps._modulate_grads(g, coeffs, jax.random.key(0),
                                    use_ge=False, active=jnp.bool_(True),
                                    modal3=False)
        np.testing.assert_allclose(np.asarray(out["mae_a"]["conv"]), 1.0)
        # 3-modal DOES modulate mae_* (main.py:352-368)
        coeffs3 = {"a": jnp.float32(0.5), "v": jnp.float32(1.0),
                   "t": jnp.float32(1.0)}
        out3 = steps._modulate_grads(g, coeffs3, jax.random.key(0),
                                     use_ge=False, active=jnp.bool_(True),
                                     modal3=True)
        np.testing.assert_allclose(np.asarray(out3["mae_a"]["conv"]), 0.5)


class TestCavOptiLrGroups:
    def test_full_lr_only_on_fc_out_weight(self):
        """Reference mlp_list quirk (main.py:738): the bias entry carries a
        stray 'module.' prefix and never matches, so ONLY
        fusion_module.fc_out.weight trains at full lr; the bias — like the
        encoders — gets lr/10."""
        from mla_tpu.core.config import MLAConfig
        from mla_tpu.train import optim

        cfg = MLAConfig(dataset="CREMAD", lorb="large", cav_opti=True,
                        train=True).validate()
        params = {"fusion_module": {"fc_out": {"kernel": jnp.ones((4, 2)),
                                               "bias": jnp.ones((2,))}},
                  "mae_a": {"conv": jnp.ones((3, 3))}}
        spec = optim.make_spec(cfg, params)
        sc = spec.lr_scales
        assert sc["fusion_module"]["fc_out"]["kernel"] == 1.0
        assert sc["fusion_module"]["fc_out"]["bias"] == 0.1
        assert sc["mae_a"]["conv"] == 0.1
