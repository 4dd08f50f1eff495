"""Train state pytree: params + BN stats + optimizer state + GS projector +
QMF history + PRNG, checkpointable as one Orbax tree (SURVEY.md §5.4)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from mla_tpu.train.gs import GSState, init_gs_state
from mla_tpu.train.optim import OptimizerSpec, init_opt_state


@flax.struct.dataclass
class QMFState:
    """Per-sample cumulative-loss + confidence stores, one per modality
    (reference: utils/utils.py:44-95 History; numpy -> device arrays here).
    Slot n_data is a scratch slot for padded batch rows."""
    correctness: Dict[str, jnp.ndarray]
    confidence: Dict[str, jnp.ndarray]


def init_qmf_state(n_data: int, modalities) -> QMFState:
    z = {m: jnp.zeros((n_data + 1,), jnp.float32) for m in modalities}
    return QMFState(correctness=z,
                    confidence={m: jnp.zeros((n_data + 1,), jnp.float32)
                                for m in modalities})


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    gs: Optional[GSState]
    qmf: Optional[QMFState]
    rng: jax.Array
    step: jnp.ndarray  # () int32


def create_train_state(model, cfg, sample_batch, spec: OptimizerSpec,
                       n_data: int = 0, seed: int = 0) -> TrainState:
    """Init params (same init laws as the reference — see models/) + state.

    Init uses only the SHAPES of the sample batch: flax skips running-stat
    updates while initializing (is_initializing), so sample values never reach
    any variable. Zeros on the default device avoid two real failure modes of
    initializing on the mesh-sharded batch itself: (1) flax init runs eagerly,
    and eager ops on a sharded batch each dispatch an independent multi-device
    collective program (BatchNorm stats -> one all-reduce per op) — independent
    audio/visual chains can exhaust XLA:CPU's execute-thread pool and deadlock
    the rendezvous ("Expected 8 threads to join ... only 7 arrived" aborts);
    (2) under multi-host DP the global batch isn't process-addressable at all.
    The driver replicates the returned state onto the mesh afterwards.
    """
    sample_batch = jax.tree_util.tree_map(
        lambda x: jnp.zeros(jnp.shape(x), jnp.result_type(x)), sample_batch)
    variables = model.init(jax.random.key(seed), sample_batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    gs = None
    if cfg.gs_flag:
        # size Pl to the actual shared-head width (fixes the reference's
        # hardcoded 512 that would shape-error on 768-wide heads, SURVEY C10)
        head_dim = params["fusion_module"]["fc_out"]["kernel"].shape[0]
        gs = init_gs_state(head_dim)
    qmf = None
    if cfg.modulation == "QMF":
        from mla_tpu.models.classifiers import modalities_of
        qmf = init_qmf_state(n_data, modalities_of(cfg))
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=init_opt_state(spec, params),
                      gs=gs, qmf=qmf,
                      rng=jax.random.key(seed),
                      step=jnp.zeros((), jnp.int32))


# Top-level param collection -> modality label ('a'/'v'/'t'/'head'/'other').
# Mirrors the reference's name-substring matching: 'audio'/'visual'
# (main.py:396-407) and 'mae_a'/'mae_v'/'mae_t' (main.py:348-368).
TOP_LEVEL_LABELS = {
    "audio_net": "a", "visual_net": "v",
    "mae_a": "a", "mae_v": "v", "mae_t": "t",
    "fusion_module": "head",
    "audio_fc": "a", "visual_fc": "v", "txtual_fc": "t",
}


def modality_of_path(path) -> str:
    if not path:
        return "other"
    return TOP_LEVEL_LABELS.get(path[0], "other")
