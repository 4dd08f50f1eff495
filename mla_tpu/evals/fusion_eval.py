"""Test-time fusion: fixed-alpha and entropy-gated dynamic weighting.

Reference: main.py:65-106 (calculate_entropy / calculate_gating_weights{,3})
and the valid() gs branch (main.py:622-651). Parity quirk preserved: the
softmax runs over dim=0 — the BATCH axis — so each modality gets ONE scalar
weight per eval batch, not per sample (SURVEY.md §7 hard-parts #3; results
depend on eval batch size/order). A per-sample variant is provided behind
``per_sample=True`` as the documented improvement.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def calculate_entropy(output: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """-sum(p log p) with p = softmax over the batch axis (main.py:65-70),
    restricted to valid rows (padding exclusion == reference's ragged batch)."""
    x = output.astype(jnp.float32)
    x = jnp.where(valid[:, None] > 0, x, -jnp.inf)
    p = jax.nn.softmax(x, axis=0)
    logp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-38)), 0.0)
    return -jnp.sum(p * logp)


def gating_weights(outputs: Dict[str, jnp.ndarray], valid: jnp.ndarray
                   ) -> Dict[str, jnp.ndarray]:
    """softmax(max_entropy - entropy_m) over modalities (main.py:72-106)."""
    ents = {m: calculate_entropy(o, valid) for m, o in outputs.items()}
    max_ent = jnp.max(jnp.stack(list(ents.values())))
    ws = {m: jnp.exp(max_ent - e) for m, e in ents.items()}
    total = sum(ws.values())
    return {m: w / total for m, w in ws.items()}


def per_sample_gating_weights(outputs: Dict[str, jnp.ndarray]
                              ) -> Dict[str, jnp.ndarray]:
    """Per-sample entropy gating (improvement, not parity): entropy of
    softmax over classes per row."""
    ents = {}
    for m, o in outputs.items():
        p = jax.nn.softmax(o.astype(jnp.float32), axis=1)
        ents[m] = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-38)), axis=1)  # (B,)
    max_ent = jnp.maximum(*list(ents.values())) if len(ents) == 2 else \
        jnp.max(jnp.stack(list(ents.values()), axis=0), axis=0)
    ws = {m: jnp.exp(max_ent - e) for m, e in ents.items()}
    total = sum(ws.values())
    return {m: (w / total)[:, None] for m, w in ws.items()}


def fuse_outputs(outputs: Dict[str, jnp.ndarray], valid, cfg,
                 per_sample: bool = False) -> jnp.ndarray:
    """Dynamic or fixed-alpha fusion of per-modality logits (main.py:640-651)."""
    if cfg.dynamic:
        ws = per_sample_gating_weights(outputs) if per_sample else \
            gating_weights(outputs, valid)
        return sum(outputs[m] * ws[m] for m in outputs)
    if cfg.modal3:
        return (cfg.a_alpha * outputs["a"] + cfg.v_alpha * outputs["v"] +
                cfg.t_alpha * outputs["t"])
    return cfg.av_alpha * outputs["a"] + (1 - cfg.av_alpha) * outputs["v"]
