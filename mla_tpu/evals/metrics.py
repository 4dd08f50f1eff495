"""On-device per-class accuracy + the jitted eval step.

Replaces the reference's per-sample numpy/argmax D2H loop (main.py:659-676 —
a CPU sync per sample) with one segment-sum per batch on device; the driver
only pulls (n_classes,) count vectors per epoch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mla_tpu.evals.fusion_eval import fuse_outputs
from mla_tpu.models.classifiers import modalities_of
from mla_tpu.train.steps import _energy_conf, sliced_modality_logits


def top1_accuracy(logits, label, valid=None):
    """Plain top-1 accuracy (reference: utils/evaluation.py:4-15
    obtain_top1_accuracy — defined but unused there)."""
    pred = jnp.argmax(logits.astype(jnp.float32), axis=1)
    correct = (pred == label).astype(jnp.float32)
    if valid is None:
        return jnp.mean(correct)
    return jnp.sum(correct * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def per_class_counts(logits, label, valid, n_classes):
    pred = jnp.argmax(logits.astype(jnp.float32), axis=1)
    correct = (pred == label).astype(jnp.float32) * valid
    return jax.ops.segment_sum(correct, label, num_segments=n_classes)


def eval_logits(model, cfg, params, batch_stats, batch, valid, q8=None):
    """Inference forward shared by the eval step and the serving export:
    -> (out_m: {modality: (B, n_classes)}, fused: (B, n_classes)) with the
    regime's eval-time fusion (valid() fusion branches, main.py:617-651).

    q8: optional dequant-scale collection for int8 serving params
    (runtime/export.py:split_q8) — the int8 kernels sit in `params` at their
    usual positions and QDense/m3ae read their scales from this collection."""
    modalities = modalities_of(cfg)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if q8:
        variables["q8"] = q8
    out = model.apply(variables, batch, train=False)

    if cfg.gs_flag:
        out_m = {m: out[f"out_{m}"] for m in modalities}
        fused = fuse_outputs(out_m, valid, cfg)
    elif cfg.modulation == "QMF" and cfg.lorb != "large":
        # lorb=large has no QMF heads and the reference's branch order makes
        # QMF inert for it (main.py:166-170) — fall through to the joint eval
        out_m = {m: out[m] for m in modalities}
        fused = sum(out_m[m] * _energy_conf(out_m[m])[:, None]
                    for m in modalities)
    else:
        feats = {m: out[m] for m in modalities}
        fused = out["out"]
        out_m = sliced_modality_logits(
            feats, params["fusion_module"], cfg.fusion_method, cfg.modal3,
            bias_div=True)
    return out_m, fused


def make_eval_step(model, cfg):
    """Returns step(params, batch_stats, batch) -> dict of (n_classes,) counts
    {'num','acc','acc_a','acc_v'[,'acc_t']} to be accumulated by the driver
    (valid() semantics, main.py:486-679)."""
    modalities = modalities_of(cfg)
    n_classes = cfg.n_classes

    def step(params, batch_stats, batch):
        valid, label = batch["valid"], batch["label"]
        out_m, fused = eval_logits(model, cfg, params, batch_stats, batch,
                                   valid)

        counts = {
            "num": jax.ops.segment_sum(valid, label, num_segments=n_classes),
            "acc": per_class_counts(fused, label, valid, n_classes),
        }
        for m in modalities:
            counts[f"acc_{m}"] = per_class_counts(out_m[m], label, valid,
                                                  n_classes)
        return counts

    return step


def summarize_counts(totals: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """sum(acc)/sum(num) per head (main.py:677-679)."""
    num = float(jnp.sum(totals["num"]))
    out = {}
    for k, v in totals.items():
        if k != "num":
            out[k] = float(jnp.sum(v)) / max(num, 1.0)
    return out
