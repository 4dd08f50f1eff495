"""Train-step parity + behavior tests (SURVEY.md §4).

Parity fixtures compare against live torch implementations of the reference's
documented math (optimizer updates, GS RLS projection, batch-axis entropy
gating, margin-rank loss) on fixed seeds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mla_tpu.core.config import MLAConfig
from mla_tpu.evals import fusion_eval
from mla_tpu.evals.metrics import make_eval_step, per_class_counts, summarize_counts
from mla_tpu.models.classifiers import AVClassifier
from mla_tpu.train import optim, steps
from mla_tpu.train.gs import gs_before_update, init_gs_state
from mla_tpu.train.state import create_train_state

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


def _rand_tree(rng, shapes):
    return {k: jnp.asarray(rng.standard_normal(s).astype(np.float32))
            for k, s in shapes.items()}


class TestTorchSGDParity:
    def test_three_steps_match_torch(self):
        rng = np.random.default_rng(0)
        shapes = {"w": (4, 3), "b": (3,)}
        params = _rand_tree(rng, shapes)
        spec = optim.OptimizerSpec(kind="sgd", momentum=0.9, weight_decay=1e-4)
        opt_state = optim.init_opt_state(spec, params)

        tp = {k: torch.tensor(np.asarray(v), requires_grad=True)
              for k, v in params.items()}
        topt = torch.optim.SGD(tp.values(), lr=1e-2, momentum=0.9,
                               weight_decay=1e-4)
        for step_i in range(3):
            grads = _rand_tree(np.random.default_rng(step_i + 10), shapes)
            params, opt_state = optim.apply_updates(spec, params, grads,
                                                    opt_state, 1e-2)
            for k in tp:
                tp[k].grad = torch.tensor(np.asarray(grads[k]))
            topt.step()
        for k in tp:
            np.testing.assert_allclose(np.asarray(params[k]),
                                       tp[k].detach().numpy(), atol=1e-6)

    def test_adam_matches_torch(self):
        rng = np.random.default_rng(1)
        shapes = {"w": (5, 2)}
        params = _rand_tree(rng, shapes)
        spec = optim.OptimizerSpec(kind="adam", weight_decay=5e-7,
                                   b1=0.95, b2=0.999)
        opt_state = optim.init_opt_state(spec, params)
        tp = {k: torch.tensor(np.asarray(v), requires_grad=True)
              for k, v in params.items()}
        topt = torch.optim.Adam(tp.values(), lr=1e-3, betas=(0.95, 0.999),
                                weight_decay=5e-7)
        for step_i in range(4):
            grads = _rand_tree(np.random.default_rng(step_i + 20), shapes)
            params, opt_state = optim.apply_updates(spec, params, grads,
                                                    opt_state, 1e-3)
            for k in tp:
                tp[k].grad = torch.tensor(np.asarray(grads[k]))
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp["w"].detach().numpy(), atol=1e-6)

    def test_ghost_mode_is_momentum_plus_wd_only(self):
        # GHOST == torch step with a zeroed (but present) grad
        p = {"w": jnp.ones((2, 2))}
        spec = optim.OptimizerSpec(kind="sgd", momentum=0.9, weight_decay=1e-2)
        st = {"momentum": {"w": jnp.full((2, 2), 0.5)}}
        modes = {"w": optim.GHOST}
        newp, newst = optim.apply_updates(
            spec, p, {"w": jnp.full((2, 2), 7.0)}, st, 0.1, modes)
        # d = 0 + wd*p = .01 ; buf = .9*.5+.01 = .46 ; p = 1 - .1*.46
        np.testing.assert_allclose(np.asarray(newp["w"]), 0.954, atol=1e-6)

    def test_skip_mode_untouched(self):
        p = {"w": jnp.ones((2, 2))}
        spec = optim.OptimizerSpec(kind="sgd")
        st = {"momentum": {"w": jnp.full((2, 2), 0.5)}}
        newp, newst = optim.apply_updates(
            spec, p, {"w": jnp.ones((2, 2))}, st, 0.1, {"w": optim.SKIP})
        np.testing.assert_allclose(np.asarray(newp["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(newst["momentum"]["w"]), 0.5)


class TestGSPlugin:
    def _torch_rls(self, Pl, feats, grad_t, batch_index, len_dl):
        """Verbatim utils/utils.py:26-41 math in torch (fresh implementation)."""
        lamda = batch_index / len_dl + 1
        alpha = 1.0 * 0.1 ** lamda
        r = torch.mean(feats, 0, True)
        k = torch.mm(Pl, torch.t(r))
        Pl = torch.sub(Pl, torch.mm(k, torch.t(k)) / (alpha + torch.mm(k, r)))
        Pl = Pl / torch.norm(Pl, p="fro")
        return Pl, torch.mm(grad_t, torch.t(Pl))

    def test_rls_matches_torch(self):
        rng = np.random.default_rng(3)
        d, c, b = 16, 6, 8
        feats = rng.standard_normal((b, d)).astype(np.float32)
        kernel_grad = rng.standard_normal((d, c)).astype(np.float32)  # flax layout
        gs = init_gs_state(d).replace(exp_count=jnp.ones((), jnp.int32))
        new_gs, new_grad = gs_before_update(
            gs, jnp.asarray(feats), jnp.asarray(kernel_grad),
            jnp.int32(3), 10, rls_active=True)
        tPl, tgrad = self._torch_rls(torch.eye(d), torch.tensor(feats),
                                     torch.tensor(kernel_grad.T), 3, 10)
        np.testing.assert_allclose(np.asarray(new_gs.Pl), tPl.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_grad), tgrad.numpy().T,
                                   atol=1e-4)

    def test_first_substep_skips(self):
        gs = init_gs_state(4)
        g = jnp.ones((4, 2))
        new_gs, new_grad = gs_before_update(gs, jnp.ones((3, 4)), g,
                                            jnp.int32(0), 10, rls_active=True)
        np.testing.assert_allclose(np.asarray(new_gs.Pl), np.eye(4))
        np.testing.assert_allclose(np.asarray(new_grad), np.asarray(g))
        assert int(new_gs.exp_count) == 1

    def test_dead_mode_is_noop(self):
        gs = init_gs_state(4).replace(exp_count=jnp.int32(5))
        g = jnp.ones((4, 2)) * 3
        new_gs, new_grad = gs_before_update(gs, jnp.ones((3, 4)), g,
                                            jnp.int32(2), 10, rls_active=False)
        np.testing.assert_allclose(np.asarray(new_grad), np.asarray(g))
        assert int(new_gs.exp_count) == 6


class TestEntropyGating:
    def test_matches_torch_dim0_softmax(self):
        rng = np.random.default_rng(4)
        a = rng.standard_normal((8, 6)).astype(np.float32)
        v = rng.standard_normal((8, 6)).astype(np.float32)
        valid = jnp.ones((8,), jnp.float32)
        ws = fusion_eval.gating_weights({"a": jnp.asarray(a), "v": jnp.asarray(v)},
                                        valid)

        def tent(x):
            p = torch.softmax(torch.tensor(x), dim=0)
            return -(p * torch.log(p)).sum()
        ea, ev = tent(a), tent(v)
        mx = torch.max(ea, ev)
        wa, wv = torch.exp(mx - ea), torch.exp(mx - ev)
        s = wa + wv
        np.testing.assert_allclose(float(ws["a"]), float(wa / s), atol=1e-5)
        np.testing.assert_allclose(float(ws["v"]), float(wv / s), atol=1e-5)

    def test_gating_sums_to_one_3modal(self):
        rng = np.random.default_rng(5)
        outs = {m: jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
                for m in "avt"}
        ws = fusion_eval.gating_weights(outs, jnp.ones((4,)))
        assert abs(sum(float(w) for w in ws.values()) - 1.0) < 1e-6


class TestRankLoss:
    def test_matches_torch_margin_ranking(self):
        rng = np.random.default_rng(6)
        b, n = 6, 20
        conf = rng.standard_normal(b).astype(np.float32)
        idx = rng.permutation(n)[:b].astype(np.int32)
        correctness = rng.random(n + 1).astype(np.float32)
        valid = jnp.ones((b,), jnp.float32)
        ours = steps._rank_loss(jnp.asarray(conf), jnp.asarray(idx),
                                jnp.asarray(correctness), valid, jnp.float32(b))
        # torch: main.py:108-125 semantics
        tconf = torch.tensor(conf).reshape(-1, 1)
        tidx = torch.tensor(idx, dtype=torch.long)
        tc = torch.tensor(correctness[:-1])
        c1, c2 = tc[tidx], tc[torch.roll(tidx, -1)]
        gmin, gmax = tc.min(), tc.max()
        n1, n2 = (c1 - gmin) / (gmax - gmin), (c2 - gmin) / (gmax - gmin)
        target = (n1 > n2).float() - (n1 < n2).float()
        margin = (n1 - n2).abs()
        tnz = target.clone()
        tnz[tnz == 0] = 1
        x2 = torch.roll(tconf, -1, dims=0) + (margin / tnz).reshape(-1, 1)
        ref = torch.nn.MarginRankingLoss(margin=0.0)(
            tconf, x2, -target.reshape(-1, 1))
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-5)


def _tiny_batch(rng, b=8, n_classes=2):
    """Learnable synthetic AV data: class signal injected into both modalities."""
    labels = rng.integers(0, n_classes, b)
    spec = rng.standard_normal((b, 1, 64, 80)).astype(np.float32) * 0.1
    image = rng.standard_normal((b, 3, 1, 32, 32)).astype(np.float32) * 0.1
    for i, y in enumerate(labels):
        spec[i, :, y * 20:(y + 1) * 20, :] += 1.0
        image[i, :, :, y * 10:(y + 1) * 10, :] += 1.0
    return {"spec": jnp.asarray(spec), "image": jnp.asarray(image),
            "label": jnp.asarray(labels, jnp.int32),
            "idx": jnp.arange(b, dtype=jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


class TestEndToEnd:
    @pytest.mark.parametrize(
        "regime",
        [pytest.param("mla", marks=pytest.mark.mid),
         pytest.param("normal", marks=pytest.mark.slow),
         pytest.param("ogm", marks=pytest.mark.slow),
         pytest.param("qmf", marks=pytest.mark.slow)])
    def test_loss_decreases(self, regime):
        kw = {"mla": dict(gs_flag=True),
              "normal": dict(),
              "ogm": dict(modulation="OGM_GE"),
              "qmf": dict(modulation="QMF")}[regime]
        cfg = MLAConfig(dataset="CREMAD", lorb="base", train=True,
                        **kw).validate()
        model = AVClassifier(n_classes=6, gs_flag=cfg.gs_flag,
                             qmf=cfg.modulation == "QMF", dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        rng = np.random.default_rng(0)
        batch = _tiny_batch(rng, n_classes=2)
        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, batch, spec, n_data=8)
        step = jax.jit(steps.make_train_step(model, cfg, spec, len_dl=10),
                       donate_argnums=0)
        first = None
        for i in range(8):
            state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i % 10))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first

    @pytest.mark.slow
    def test_mla_gs_rls_changes_training(self):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        train=True).validate()
        rng = np.random.default_rng(0)
        batch = _tiny_batch(rng)
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        spec = optim.make_spec(cfg)
        results = {}
        for rls in (False, True):
            c = cfg.replace(gs_rls=rls)
            state = create_train_state(model, c, batch, spec)
            step = jax.jit(steps.make_train_step(model, c, spec, len_dl=10),
                           donate_argnums=0)
            for i in range(3):
                state, m = step(state, batch, jnp.float32(1e-2), jnp.int32(i))
            results[rls] = np.asarray(
                state.params["fusion_module"]["fc_out"]["kernel"])
        assert not np.allclose(results[False], results[True])

    @pytest.mark.slow
    def test_ghost_updates_affect_audio_encoder(self):
        cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                        train=True).validate()
        rng = np.random.default_rng(0)
        batch = _tiny_batch(rng)
        model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                             stages=(1, 1, 1, 1))
        spec = optim.make_spec(cfg)
        outs = {}
        for ghost in (False, True):
            c = cfg.replace(ghost_updates=ghost)
            state = create_train_state(model, c, batch, spec)
            step = jax.jit(steps.make_train_step(model, c, spec, len_dl=10),
                           donate_argnums=0)
            for i in range(2):
                state, _ = step(state, batch, jnp.float32(1e-2), jnp.int32(i))
            outs[ghost] = np.asarray(
                state.params["audio_net"]["conv1"]["kernel"])
        assert not np.allclose(outs[False], outs[True])


class TestEvalMetrics:
    def test_per_class_counts(self):
        logits = jnp.asarray([[5., 0.], [0., 5.], [5., 0.], [0., 5.]])
        label = jnp.asarray([0, 1, 1, 1])
        valid = jnp.asarray([1., 1., 1., 0.])
        acc = per_class_counts(logits, label, valid, 2)
        np.testing.assert_allclose(np.asarray(acc), [1.0, 1.0])

    def test_summarize(self):
        totals = {"num": jnp.asarray([2., 2.]), "acc": jnp.asarray([1., 2.])}
        assert summarize_counts(totals)["acc"] == 0.75
