"""Optimizers as pure pytree functions with torch-exact semantics.

The reference uses torch.optim.SGD(lr, momentum .9, wd 1e-4) and, for
``--cav_opti``, Adam with split lr groups (reference: main.py:735-760).
MLA's alternating sub-steps need *per-sub-step masked* updates with three
per-leaf modes the reference's torch-1.8.1 behavior implies:

  REAL : normal update (grad present)
  GHOST: grad zeroed by optimizer.zero_grad() but still present — momentum
         decay + weight-decay-only update (torch<2.0 zero_grad() zeroes rather
         than deletes grads, so encoders stepped earlier in the same batch
         keep being updated — main.py:439-440,452-453)
  SKIP : grad is None — untouched (params deleted via ``del p.grad`` at batch
         end, main.py:468-470, start each batch as None)

optax transforms keep one state for one mask, so the three-mode per-sub-step
masking is implemented directly: torch-SGD is
  d = g + wd*p;  buf = mu*buf + d;  p -= lr*buf
(coupled weight decay *before* momentum), torch-Adam is the coupled-wd variant
with bias correction and a per-leaf step count that only advances when updated.
Masks are static pytrees (modality structure is static), so the whole update
stays a single fused XLA graph with donated buffers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

REAL, GHOST, SKIP = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    kind: str = "sgd"              # 'sgd' | 'adam'
    momentum: float = 0.9
    weight_decay: float = 1e-4     # coupled (torch-style)
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # per-leaf lr multiplier tree (cav_opti: head 1.0, rest 0.1 — main.py:739-746);
    # None = 1.0 everywhere
    lr_scales: Optional[Any] = None
    # moment-buffer storage dtype (--opt_dtype): 'bfloat16' halves the
    # momentum/m/v HBM (huge SGD: 5.4 -> 2.7 GB). Math runs in the param
    # dtype; the stored (rounded) moment drives the param update, so a
    # checkpoint-resume replays the exact same update stream.
    state_dtype: str = "float32"


def init_opt_state(spec: OptimizerSpec, params) -> Dict[str, Any]:
    sd = jnp.dtype(spec.state_dtype)
    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, sd), params)
    if spec.kind == "sgd":
        return {"momentum": zeros}
    if spec.kind == "adam":
        steps = jax.tree_util.tree_map(
            lambda p: jnp.zeros((), jnp.int32), params)
        return {"m": zeros,
                "v": jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, sd), params),
                "t": steps}
    raise ValueError(spec.kind)


def _leaf_sgd(spec, lr_scale, p, g, buf, lr, mode):
    # modes are static Python ints (the modality partition is static):
    # short-circuit SKIP leaves entirely — no read/write traffic at all
    if mode == SKIP:
        return p, buf
    d = spec.weight_decay * p if mode == GHOST else g + spec.weight_decay * p
    # compute in the param dtype, round to the storage dtype FIRST, then
    # apply the rounded buffer — all astype calls are no-ops at fp32
    new_buf = (spec.momentum * buf.astype(p.dtype) + d).astype(buf.dtype)
    new_p = p - lr * lr_scale * new_buf.astype(p.dtype)
    return new_p, new_buf


def _leaf_adam(spec, lr_scale, p, g, m, v, t, lr, mode):
    if mode == SKIP:
        return p, m, v, t
    d = spec.weight_decay * p if mode == GHOST else g + spec.weight_decay * p
    new_t = t + 1
    new_m = (spec.b1 * m.astype(p.dtype) + (1 - spec.b1) * d).astype(m.dtype)
    new_v = (spec.b2 * v.astype(p.dtype)
             + (1 - spec.b2) * d * d).astype(v.dtype)
    tf = new_t.astype(jnp.float32)
    mhat = new_m.astype(p.dtype) / (1 - spec.b1 ** tf)
    vhat = new_v.astype(p.dtype) / (1 - spec.b2 ** tf)
    new_p = p - lr * lr_scale * mhat / (jnp.sqrt(vhat) + spec.eps)
    return new_p, new_m, new_v, new_t


def apply_updates(spec: OptimizerSpec, params, grads, opt_state,
                  lr, mode_tree=None):
    """One optimizer step. ``mode_tree``: per-leaf REAL/GHOST/SKIP ints
    (None = REAL everywhere). lr is a traced scalar (epoch schedule applied by
    the driver — no recompile on decay)."""
    tm = jax.tree_util.tree_map
    if mode_tree is None:
        mode_tree = tm(lambda p: REAL, params)
    scales = spec.lr_scales or tm(lambda p: 1.0, params)
    if spec.kind == "sgd":
        out = tm(lambda p, g, b, mo, s: _leaf_sgd(spec, s, p, g, b, lr, mo),
                 params, grads, opt_state["momentum"], mode_tree, scales)
        new_params = tm(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_buf = tm(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return new_params, {"momentum": new_buf}
    if spec.kind == "adam":
        out = tm(lambda p, g, m, v, t, mo, s:
                 _leaf_adam(spec, s, p, g, m, v, t, lr, mo),
                 params, grads, opt_state["m"], opt_state["v"], opt_state["t"],
                 mode_tree, scales)
        pick = lambda i: tm(lambda o: o[i], out,
                            is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), {"m": pick(1), "v": pick(2), "t": pick(3)}
    raise ValueError(spec.kind)


# ---------------------------------------------------------------------------
# Epoch LR schedules (reference: main.py:749-760)
# ---------------------------------------------------------------------------

def step_lr(lr0: float, decay_step: int, decay_ratio: float, epoch: int) -> float:
    """torch StepLR: lr0 * ratio**(epoch // step)."""
    return lr0 * (decay_ratio ** (epoch // decay_step))


def cav_multistep_lr(lr0: float, epoch: int, start: int = 2, step: int = 1,
                     gamma: float = 0.5) -> float:
    """torch MultiStepLR(range(2, 1000, 1), 0.5) — main.py:752-757."""
    n_milestones = max(0, min(epoch, 999) - start + 1) if epoch >= start else 0
    return lr0 * (gamma ** n_milestones)


def lr_for_epoch(cfg, epoch: int) -> float:
    if cfg.lorb == "large" and cfg.cav_lrs:
        return cav_multistep_lr(cfg.learning_rate, epoch)
    return step_lr(cfg.learning_rate, cfg.lr_decay_step, cfg.lr_decay_ratio, epoch)


def make_spec(cfg, params=None) -> OptimizerSpec:
    """Optimizer selection mirroring main.py:735-751."""
    sd = cfg.opt_dtype
    if cfg.lorb == "large" and cfg.cav_opti:
        scales = None
        if params is not None:
            def scale_of(path):
                # Full lr applies ONLY to fusion_module.fc_out.weight: the
                # reference's mlp_list second entry carries a stray
                # 'module.' prefix ('module.fusion_module.fc_out.bias',
                # main.py:738) that never matches model.module.named_
                # parameters(), so the bias — like everything else — trains
                # at lr/10. Flax kernel == torch weight.
                return 1.0 if tuple(path) == ("fusion_module", "fc_out",
                                              "kernel") else 0.1
            scales = _label_tree(params, scale_of)
        return OptimizerSpec(kind="adam", weight_decay=5e-7, b1=0.95, b2=0.999,
                             lr_scales=scales, state_dtype=sd)
    if cfg.optimizer == "adam":
        return OptimizerSpec(kind="adam", weight_decay=0.0, b1=0.9, b2=0.999,
                             state_dtype=sd)
    return OptimizerSpec(kind="sgd", momentum=0.9, weight_decay=1e-4,
                         state_dtype=sd)


def _label_tree(params, fn):
    """Map fn(path_tuple) over the tree, keeping structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    labels = [fn(tuple(_key_str(k) for k in path)) for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], labels)


def _key_str(k):
    return getattr(k, "key", getattr(k, "name", getattr(k, "idx", str(k))))


def modality_mode_tree(params, modality_of_path, current: str,
                       already_stepped, ghost_updates: bool):
    """Static REAL/GHOST/SKIP tree for one MLA sub-step.

    modality_of_path(path) -> 'a'|'v'|'t'|'head'|'other'. REAL for the current
    modality's encoder + head; GHOST for encoders already stepped this batch
    (torch-1.8.1 parity) ; SKIP otherwise.
    """
    def mode(path):
        lbl = modality_of_path(path)
        if lbl == current or lbl == "head":
            return REAL
        if ghost_updates and lbl in already_stepped:
            return GHOST
        return SKIP
    return _label_tree(params, mode)
