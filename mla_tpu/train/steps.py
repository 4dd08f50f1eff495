"""Training algorithms as pure step functions (one XLA graph each).

Covers all four reference regimes (reference: main.py:127-484):
  - MLA alternating unimodal adaptation (gs_flag branch, main.py:419-476):
    K sequential (encoder_m + shared-head) sub-updates per batch, unrolled
    statically inside ONE jitted step with donated state — the hard part from
    SURVEY.md §7 #1. Each sub-step recomputes its own modality's features with
    the then-current head (grad-equivalent to the reference's
    forward-once-then-K-backwards, which computes head grads from saved
    activations and encoder grads through the already-updated head weight).
  - Joint fusion 'Normal' + OGM / OGM_GE gradient modulation (main.py:165-418)
  - QMF quality-aware fusion with History + margin-rank loss (main.py:108-125,
    170-268)

All steps take a `lr` scalar (epoch schedule applied host-side, no recompile),
a `valid` mask for padded final batches, and run under pjit with batch-sharded
inputs — the gradient all-reduce is GSPMD-inserted over the data mesh axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mla_tpu.models.classifiers import modalities_of
from mla_tpu.train import optim
from mla_tpu.train.gs import gs_before_update
from mla_tpu.train.state import TrainState, modality_of_path

# ---------------------------------------------------------------------------
# losses / helpers
# ---------------------------------------------------------------------------


def ce_per_sample(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def masked_ce(logits, labels, valid):
    nll = ce_per_sample(logits, labels)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    """Immutable nested-dict update."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


HEAD_KERNEL_PATH = ("fusion_module", "fc_out", "kernel")


def _microbatches(batch, k: int):
    """Contiguous reshape of every leaf (b, ...) -> (k, b//k, ...) for
    lax.scan gradient accumulation (--grad_accum). The split preserves row
    order, so reshaping per-microbatch outputs back to (b, ...) reproduces
    the full-batch arrays exactly — which is what lets GS (full-batch feature
    mean) and OGM (full-batch score coefficients) run on the reassembled
    tensors with unchanged semantics."""
    def split(x):
        if x.shape[0] % k:
            raise ValueError(f"--grad_accum {k} does not divide the batch "
                             f"dimension {x.shape[0]}")
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])
    return jax.tree_util.tree_map(split, batch)


def _accum_grads(mb_loss, params, mbs, bs, accum_dtype="float32"):
    """Scan `mb_loss(params, microbatch, batch_stats) -> (loss, (aux, bs))`
    over the leading microbatch axis, summing gradients and losses into ONE
    update's worth. Each microbatch loss is normalised by the FULL batch's
    valid count (the caller builds that into mb_loss), so the summed gradient
    equals the full-batch gradient bit-for-bit up to fp addition order.
    Activation memory is one microbatch's worth — the --grad_accum lever for
    the large/huge configs. BN stats thread sequentially (torch-style
    accumulation semantics). accum_dtype 'bfloat16' halves the param-sized
    carry (the scan's live accumulator, the state term that OOMed huge+accum
    single-chip): each partial sum computes in the grad dtype and rounds to
    bf16 at the carry boundary. Returns (grads, loss, bs, stacked_aux)."""
    sd = jnp.dtype(accum_dtype)

    def body(carry, mb):
        g_acc, bs_c, l_acc = carry
        (l, (aux, bs_n)), g = jax.value_and_grad(
            mb_loss, has_aux=True)(params, mb, bs_c)
        g_acc = jax.tree_util.tree_map(
            lambda a, gg: (a.astype(gg.dtype) + gg).astype(a.dtype), g_acc, g)
        return (g_acc, bs_n, l_acc + l), aux

    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, sd), params)
    (grads, bs, loss), aux_k = jax.lax.scan(
        body, (zeros, bs, jnp.float32(0.0)), mbs)
    return grads, loss, bs, aux_k


def _unsplit(x):
    """(k, mb, ...) -> (b, ...): inverse of _microbatches on stacked aux."""
    return x.reshape((-1,) + x.shape[2:])


def sliced_modality_logits(feats: Dict[str, jnp.ndarray], fusion_params,
                           fusion_method: str, modal3: bool,
                           bias_div: bool):
    """Per-modality logits reconstructed from the fused head by column-slicing
    its weight (reference: main.py:274-302 train, 593-620 eval).

    bias_div: the reference divides the bias by K at eval but NOT at train for
    'sum' fusion (main.py:277-283 vs 596-600); concat always divides.
    """
    out = {}
    if fusion_method == "sum":
        div = 2.0 if bias_div else 1.0
        wx, bx = fusion_params["fc_x"]["kernel"], fusion_params["fc_x"]["bias"]
        wy, by = fusion_params["fc_y"]["kernel"], fusion_params["fc_y"]["bias"]
        out["a"] = feats["a"] @ wx + bx / div
        out["v"] = feats["v"] @ wy + by / div
        return out
    w = fusion_params["fc_out"]["kernel"]   # (K*D, C)
    b = fusion_params["fc_out"]["bias"]
    k = 3 if modal3 else 2
    d = w.shape[0] // k
    order = ("a", "v", "t")[:k]
    for i, m in enumerate(order):
        out[m] = feats[m] @ w[i * d:(i + 1) * d] + b / k
    return out


def _apply_encode_head(model, params, batch_stats, batch, modality):
    """Run one modality's encoder + shared head, collecting new BN stats."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def fwd(mdl, b):
        feat = mdl.encode(b, modality, train=True)
        return mdl.head(feat), feat

    (logits, feat), new_state = model.apply(
        variables, batch, method=fwd, mutable=["batch_stats"])
    new_bs = new_state.get("batch_stats", batch_stats)
    return logits, feat, new_bs


# ---------------------------------------------------------------------------
# MLA alternating step (gs branch, main.py:419-476)
# ---------------------------------------------------------------------------

def make_mla_train_step(model, cfg, spec: optim.OptimizerSpec, len_dl: int):
    modalities = modalities_of(cfg)
    k = cfg.grad_accum

    def step(state: TrainState, batch, lr, batch_index, epoch=0):
        del epoch
        params, bs, opt, gs = (state.params, state.batch_stats,
                               state.opt_state, state.gs)
        valid = batch["valid"]
        label = batch["label"]
        n_total = jnp.maximum(jnp.sum(valid), 1.0)
        mbs = _microbatches(batch, k) if k > 1 else None
        losses = {}
        stepped = []
        for m in modalities:  # static unroll (heterogeneous encoders)
            if k > 1:
                # --grad_accum: per-microbatch losses normalised by the full
                # batch's valid count sum to the full-batch masked_ce, so the
                # accumulated grad equals the one-shot grad (fp order aside)
                def mb_loss(p, mb, bs_c, m=m):
                    logits, feat, new_bs = _apply_encode_head(
                        model, p, bs_c, mb, m)
                    nll = ce_per_sample(logits, mb["label"])
                    return jnp.sum(nll * mb["valid"]) / n_total, (feat, new_bs)

                grads, loss, bs, feats_k = _accum_grads(mb_loss, params,
                                                        mbs, bs,
                                                        cfg.accum_dtype)
                feat = _unsplit(feats_k)  # full-batch features for GS
            else:
                def loss_fn(p, bs=bs, m=m):
                    logits, feat, new_bs = _apply_encode_head(model, p, bs,
                                                              batch, m)
                    return masked_ce(logits, label, valid), (feat, new_bs)

                (loss, (feat, bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            # GS plugin on the shared-head kernel grad (main.py:437,449,461)
            head_grad = _get(grads, HEAD_KERNEL_PATH)
            gs, head_grad = gs_before_update(gs, feat, head_grad, batch_index,
                                             len_dl, cfg.gs_rls)
            grads = _set(grads, HEAD_KERNEL_PATH, head_grad)
            modes = optim.modality_mode_tree(params, modality_of_path, m,
                                             tuple(stepped), cfg.ghost_updates)
            params, opt = optim.apply_updates(spec, params, grads, opt, lr, modes)
            stepped.append(m)
            losses[m] = loss

        # av_alpha-weighted epoch loss (main.py:472); .get() keeps reduced
        # modality subsets (bench bisection) traceable
        total = losses.get("a", 0.0) * cfg.av_alpha \
            + losses.get("v", 0.0) * (1 - cfg.av_alpha)
        metrics = {"loss": total}
        metrics.update({f"loss_{m}": l for m, l in losses.items()})
        new_state = state.replace(params=params, batch_stats=bs, opt_state=opt,
                                  gs=gs, step=state.step + 1)
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Joint step: Normal / OGM / OGM_GE (main.py:165-418)
# ---------------------------------------------------------------------------

def _ogm_coeffs(out_m: Dict[str, jnp.ndarray], label, valid, alpha, modal3):
    """Discriminative-score ratios -> per-modality grad coefficients
    (main.py:345-368 2-modal, main.py:315-338 3-modal)."""
    def score(o):
        p = jax.nn.softmax(o.astype(jnp.float32), axis=1)
        return jnp.sum(jnp.take_along_axis(p, label[:, None], 1)[:, 0] * valid)

    s = {m: score(o) for m, o in out_m.items()}
    damp = lambda r: 1.0 - jnp.tanh(alpha * jax.nn.relu(r))
    one = jnp.float32(1.0)
    if modal3:
        ratio_v = s["v"] / (s["a"] + s["t"])
        ratio_a = s["a"] / (s["v"] + s["t"])
        ratio_t = s["t"] / (s["v"] + s["a"])
        # if ratio_v>1: damp v; elif ratio_t>1: damp t; else damp a
        cv = jnp.where(ratio_v > 1, damp(ratio_v), one)
        ct = jnp.where((ratio_v <= 1) & (ratio_t > 1), damp(ratio_t), one)
        ca = jnp.where((ratio_v <= 1) & (ratio_t <= 1), damp(ratio_a), one)
        return {"a": ca, "v": cv, "t": ct}, ratio_v
    ratio_v = s["v"] / s["a"]
    cv = jnp.where(ratio_v > 1, damp(ratio_v), one)
    ca = jnp.where(ratio_v > 1, one, damp(1.0 / ratio_v))
    return {"a": ca, "v": cv}, ratio_v


def _ogm_grad_label(top: str, modal3: bool):
    """Which coefficient (if any) scales params under this top-level module.

    Name-substring parity with the reference: the 3-modal branch matches
    'mae_a'/'mae_v'/'mae_t' (main.py:352-368), but the 2-modal branch only
    matches 'audio'/'visual' (main.py:396-407) — so for lorb=m3ae/large
    (modules named mae_*) 2-modal OGM modulates NOTHING in the reference,
    and neither do we."""
    if modal3:
        return {"mae_a": "a", "mae_v": "v", "mae_t": "t"}.get(top)
    if "audio" in top:
        return "a"
    if "visual" in top:
        return "v"
    return None


def _modulate_grads(grads, coeffs, rng, use_ge: bool, active, modal3: bool):
    """Scale 4-D (conv) grads of each modality's encoder by its coefficient;
    OGM_GE adds N(0, grad.std()) noise (main.py:346-369,396-407). `active` is
    the traced modulation_starts <= epoch <= modulation_ends window."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, g), kk in zip(flat, keys):
        names = tuple(optim._key_str(k) for k in path)
        lbl = _ogm_grad_label(names[0] if names else "", modal3)
        if lbl in coeffs and g.ndim == 4:
            c = coeffs[lbl]
            mod = g * c
            if use_ge:
                mod = mod + jax.random.normal(kk, g.shape, g.dtype) * \
                    (jnp.std(g) + 1e-8)
            g = jnp.where(active, mod, g)
        new_leaves.append(g)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def make_joint_train_step(model, cfg, spec: optim.OptimizerSpec):
    use_ogm = cfg.modulation in ("OGM", "OGM_GE")
    use_ge = cfg.modulation == "OGM_GE"
    k = cfg.grad_accum

    def step(state: TrainState, batch, lr, batch_index, epoch=0):
        del batch_index
        valid, label = batch["valid"], batch["label"]
        bs = state.batch_stats
        n_total = jnp.maximum(jnp.sum(valid), 1.0)

        def _forward(p, b, bs_c):
            variables = {"params": p}
            if bs_c:
                variables["batch_stats"] = bs_c
            out, new_state = model.apply(variables, b, train=True,
                                         mutable=["batch_stats"])
            new_bs = new_state.get("batch_stats", bs_c)
            feats = {m: out[m] for m in out if m in ("a", "v", "t")}
            out_m = sliced_modality_logits(
                feats, p["fusion_module"], cfg.fusion_method, cfg.modal3,
                bias_div=cfg.fusion_method != "sum")
            return out["out"], out_m, new_bs

        if k > 1:
            # --grad_accum: grads sum to the full-batch gradient; the stacked
            # per-microbatch modality logits reassemble to the full-batch
            # out_m, so the OGM coefficients below see identical inputs
            def mb_loss(p, mb, bs_c):
                fused, out_m, new_bs = _forward(p, mb, bs_c)
                nll = ce_per_sample(fused, mb["label"])
                return jnp.sum(nll * mb["valid"]) / n_total, (out_m, new_bs)

            grads, loss, new_bs, out_m_k = _accum_grads(
                mb_loss, state.params, _microbatches(batch, k), bs,
                cfg.accum_dtype)
            out_m = {m: _unsplit(v) for m, v in out_m_k.items()}
        else:
            def loss_fn(p, bs=bs):
                fused, out_m, new_bs = _forward(p, batch, bs)
                return masked_ce(fused, label, valid), (out_m, new_bs)

            (loss, (out_m, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)

        rng, sub = jax.random.split(state.rng)
        ogm_scalars = {}
        if use_ogm:
            coeffs, ratio_v = _ogm_coeffs(out_m, label, valid, cfg.alpha,
                                          cfg.modal3)
            active = (cfg.modulation_starts <= epoch) & \
                     (epoch <= cfg.modulation_ends)
            grads = _modulate_grads(grads, coeffs, sub, use_ge, active,
                                    cfg.modal3)
            # per-iteration TB scalars 'data/ratio v' + 'data/coefficient *'
            # (main.py:339-344, 386-390); the driver writes them only when
            # --use_tensorboard is on (each write is a host sync)
            ogm_scalars = {"ratio_v": ratio_v,
                           **{f"coeff_{m}": c for m, c in coeffs.items()}}

        params, opt = optim.apply_updates(spec, state.params, grads,
                                          state.opt_state, lr)
        metrics = {"loss": loss, **ogm_scalars}
        for m, o in out_m.items():
            metrics[f"loss_{m}"] = masked_ce(o, label, valid)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt, rng=rng, step=state.step + 1)
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# QMF step (main.py:108-125 rank loss; 170-268 per-path losses)
# ---------------------------------------------------------------------------

def _energy_conf(logits):
    """confidence = logsumexp(logits)/10 per sample (main.py:173-181)."""
    e = jnp.log(jnp.sum(jnp.exp(logits.astype(jnp.float32)), axis=1))
    return e / 10.0


def _rank_loss(conf, idx, correctness, valid, n_valid):
    """Margin-rank loss over rolled batch pairs (main.py:108-125), with the
    roll confined to valid rows (padding is a suffix)."""
    b = conf.shape[0]
    pos = jnp.arange(b)
    nxt = jnp.where(pos + 1 >= n_valid, 0, pos + 1)
    idx2 = idx[nxt]
    c1, c2 = correctness[idx], correctness[idx2]
    # reference normalizes by global min/max of the whole history array
    gmin, gmax = jnp.min(correctness[:-1]), jnp.max(correctness[:-1])
    rng = jnp.maximum(gmax - gmin, 1e-12)
    n1, n2 = (c1 - gmin) / rng, (c2 - gmin) / rng
    target = jnp.sign(n1 - n2)
    margin = jnp.abs(n1 - n2)
    target_nz = jnp.where(target == 0, 1.0, target)
    x1 = conf
    x2 = conf[nxt] + margin / target_nz
    per = jax.nn.relu(target * (x1 - x2))
    return jnp.sum(per * valid) / jnp.maximum(n_valid, 1.0)


def make_qmf_train_step(model, cfg, spec: optim.OptimizerSpec):
    modalities = modalities_of(cfg)
    # base path: loss = cml + clf + 0.1*crl (main.py:264-268);
    # m3ae paths: loss = mean(clf + crl), fused CE not in the loss
    # (main.py:203-207, 230-235)
    base_path = cfg.lorb == "base"

    def step(state: TrainState, batch, lr, batch_index, epoch=0):
        del batch_index
        valid, label, idx = batch["valid"], batch["label"], batch["idx"]
        n_valid = jnp.sum(valid)
        qmf = state.qmf
        bs = state.batch_stats

        def loss_fn(p, bs=bs):
            variables = {"params": p}
            if bs:
                variables["batch_stats"] = bs
            out_m, new_state = model.apply(variables, batch, train=True,
                                           mutable=["batch_stats"])
            new_bs = new_state.get("batch_stats", bs)
            confs = {m: _energy_conf(out_m[m]) for m in modalities}
            fused = sum(out_m[m] * jax.lax.stop_gradient(confs[m])[:, None]
                        for m in modalities)
            clf = sum(masked_ce(out_m[m], label, valid) for m in modalities)
            # rank loss against the POST-update history (main.py:194-199)
            per_losses = {m: ce_per_sample(out_m[m], label) * valid
                          for m in modalities}
            new_corr, new_conf, crl = {}, {}, 0.0
            for m in modalities:
                corr = qmf.correctness[m].at[idx].add(
                    jax.lax.stop_gradient(per_losses[m]))
                cfd = qmf.confidence[m].at[idx].set(
                    jax.lax.stop_gradient(confs[m]) * valid)
                new_corr[m], new_conf[m] = corr, cfd
                crl = crl + _rank_loss(confs[m], idx, corr, valid, n_valid)
            if base_path:
                loss = masked_ce(fused, label, valid) + clf + 0.1 * crl
            else:
                loss = clf + crl
            new_qmf = qmf.replace(correctness=new_corr, confidence=new_conf)
            return loss, (out_m, new_bs, new_qmf)

        (loss, (out_m, new_bs, new_qmf)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        params, opt = optim.apply_updates(spec, state.params, grads,
                                          state.opt_state, lr)
        metrics = {"loss": loss}
        for m in modalities:
            metrics[f"loss_{m}"] = masked_ce(out_m[m], label, valid)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt, qmf=new_qmf,
                                  step=state.step + 1)
        return new_state, metrics

    return step


def make_train_step(model, cfg, spec, len_dl):
    """Regime dispatch on cfg.regime — the single routing source of truth
    (core/config.py), mirroring train_epoch's branches (main.py:164,419)."""
    if cfg.regime == "mla":
        return make_mla_train_step(model, cfg, spec, len_dl)
    if cfg.regime == "qmf":
        return make_qmf_train_step(model, cfg, spec)
    if cfg.modulation == "QMF":
        # reference branch order: `if lorb == "large"` precedes the QMF
        # check (main.py:166-170), so CAV runs the joint path no matter
        # the modulation flag — CAVClassifier has no QMF heads
        print("NOTE: --modulation QMF is inert for --lorb large "
              "(reference main.py:166-170 runs the joint path)")
    return make_joint_train_step(model, cfg, spec)
