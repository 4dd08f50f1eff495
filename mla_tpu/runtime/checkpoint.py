"""Checkpoint / resume / weight averaging.

Reference behavior replicated (main.py:682-694, 721-728, 900-953): best-acc
checkpoint with metadata, warm-start load that drops the shared-head weights,
eval-only load, offline weight averaging. Added beyond the reference
(SURVEY.md §5.4): full mid-run resume — the checkpoint holds the complete
TrainState pytree (params, BN stats, optimizer buffers, GS projector Pl +
exp_count, QMF history, PRNG key, step) via Orbax.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from mla_tpu.train.state import TrainState


def _localize(x):
    """Host-local full view of a global array.

    Under multi-host DP the state is fully replicated and reading a local
    shard is a pure D2H copy — no program dispatch (dispatching from only
    some processes at checkpoint time would hang on a half-formed collective
    clique). Under multi-host TP (mesh (d, m>1)) the transformer kernels are
    model-sharded, so those leaves are first resharded to replicated with an
    identity jit; that IS a collective, which is safe exactly because every
    process runs save_checkpoint over the identical tree in the same order."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if not x.is_fully_replicated:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(x.sharding.mesh, PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=repl)(x)
        return x.addressable_shards[0].data
    return x


def _to_saveable(state: TrainState) -> Dict[str, Any]:
    state = jax.tree_util.tree_map(_localize, state)
    # typed PRNG keys are not serializable; store raw key data
    d = {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state,
         "rng": jax.random.key_data(state.rng),
         "step": state.step}
    if state.gs is not None:
        d["gs"] = {"Pl": state.gs.Pl, "exp_count": state.gs.exp_count}
    if state.qmf is not None:
        d["qmf"] = {"correctness": state.qmf.correctness,
                    "confidence": state.qmf.confidence}
    return jax.tree_util.tree_map(np.asarray, d)


def save_checkpoint(ckpt_dir: str, state: TrainState, meta: Dict[str, Any],
                    name: str = "best") -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    # multi-host: EVERY process must call ocp.save — it contains a
    # sync_global_processes barrier (orbax writes from the primary process
    # only; ckpt_dir should be shared storage at real scale). Skipping it on
    # non-primary hosts deadlocks the barrier ("GetKeyValue() timed out").
    saveable = _to_saveable(state)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, saveable, force=True)
    if jax.process_index() == 0:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


# -- async best-checkpoint saves ---------------------------------------------
# The reference blocks the epoch loop on torch.save of the best model
# (main.py:684-694). Here the D2H snapshot (_to_saveable) is still taken
# synchronously — it must see a consistent state — but the file write happens
# on Orbax's background thread, so the next epoch's device work overlaps the
# disk I/O. One AsyncCheckpointer is shared per process; a new save (or
# process exit) first waits for the previous one, and multi-host barriers are
# handled inside Orbax.

_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None
_PENDING_META: Optional[tuple] = None       # (path, meta) of the in-flight save


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint_async(ckpt_dir: str, state: TrainState,
                          meta: Dict[str, Any], name: str = "best") -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    saveable = _to_saveable(state)          # sync D2H snapshot
    wait_for_async_saves()                  # flush previous save + its meta
    _async_ckptr().save(path, saveable, force=True)
    # meta.json is written only AFTER the data write commits (at the next
    # flush point), preserving the sync path's data-then-meta ordering: a
    # crash mid-write can leave stale/partial data, but never a meta file
    # describing a checkpoint that was not fully committed.
    global _PENDING_META
    _PENDING_META = (path, meta)
    return path


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint write has committed, then
    write its meta.json (call before reading the checkpoint back or exiting
    the driver)."""
    global _PENDING_META
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    if _PENDING_META is not None:
        path, meta = _PENDING_META
        _PENDING_META = None
        if jax.process_index() == 0:
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing (template) TrainState."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(path)
    new = state.replace(
        params=raw["params"], batch_stats=raw["batch_stats"],
        opt_state=raw["opt_state"],
        rng=jax.random.wrap_key_data(jnp.asarray(raw["rng"])),
        step=jnp.asarray(raw["step"]))
    if state.gs is not None and "gs" in raw:
        new = new.replace(gs=state.gs.replace(
            Pl=jnp.asarray(raw["gs"]["Pl"]),
            exp_count=jnp.asarray(raw["gs"]["exp_count"])))
    if state.qmf is not None and "qmf" in raw:
        new = new.replace(qmf=state.qmf.replace(
            correctness={k: jnp.asarray(v)
                         for k, v in raw["qmf"]["correctness"].items()},
            confidence={k: jnp.asarray(v)
                        for k, v in raw["qmf"]["confidence"].items()}))
    return new


def load_meta(path: str) -> Dict[str, Any]:
    """Checkpoint metadata. A crash between the async data commit and the
    deferred meta.json write (save_checkpoint_async) can leave a fully
    committed checkpoint with no meta file — the weights are valid, so
    reconstruct what the directory name encodes instead of failing."""
    path = os.path.abspath(path)
    try:
        with open(path + ".meta.json") as f:
            return json.load(f)
    except FileNotFoundError:
        if not os.path.isdir(path):
            raise
        meta: Dict[str, Any] = {"reconstructed": True}
        # best-ckpt names embed epoch/acc (driver.py name template)
        import re
        m = re.search(r"epoch_(\d+)_acc_([\d.]+)$", os.path.basename(path))
        if m:
            meta["saved_epoch"] = int(m.group(1))
            meta["acc"] = float(m.group(2).rstrip("."))
        return meta


def warm_start_params(path: str, params):
    """Load params but drop only the shared head's output layer, exactly as
    the reference warm-start does (main.py:721-728 deletes
    fusion_module.fc_out.weight/.bias — other fusion params, e.g.
    SumFusion's fc_x/fc_y, ARE loaded)."""
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    loaded = raw["params"]
    merged = jax.tree_util.tree_map(lambda x: x, params)
    for top, sub in loaded.items():
        if top not in merged:
            continue
        if top == "fusion_module":
            sub = {k: v for k, v in sub.items() if k != "fc_out"}
            merged[top] = {**merged[top],
                           **jax.tree_util.tree_map(jnp.asarray, sub)}
        else:
            merged[top] = jax.tree_util.tree_map(jnp.asarray, sub)
    return merged


def wa_params(ckpt_dir: str):
    """Average weights over every checkpoint in a directory, INCLUDING the
    BatchNorm running stats — the reference's wa_model averages the full
    state_dict (main.py:682-694). Returns (params, batch_stats); batch_stats
    is {} for BN-free models."""
    names = [n for n in sorted(os.listdir(ckpt_dir))
             if os.path.isdir(os.path.join(ckpt_dir, n))]
    assert names, f"no checkpoints in {ckpt_dir}"
    ckptr = ocp.PyTreeCheckpointer()
    acc_p = acc_s = None
    for n in names:
        raw = ckptr.restore(os.path.abspath(os.path.join(ckpt_dir, n)))
        p, s = raw["params"], raw.get("batch_stats") or {}
        acc_p = p if acc_p is None else \
            jax.tree_util.tree_map(jnp.add, acc_p, p)
        acc_s = s if acc_s is None else \
            jax.tree_util.tree_map(jnp.add, acc_s, s)
    k = float(len(names))
    return (jax.tree_util.tree_map(lambda x: x / k, acc_p),
            jax.tree_util.tree_map(lambda x: x / k, acc_s))
