"""Device mesh + sharding for data-parallel MLA training.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(reference: main.py:732) — per-GPU batch shards with a gather onto cuda:0.
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all chips; batches are
sharded on the leading axis, parameters/optimizer state are replicated, and the
gradient all-reduce is inserted by GSPMD (riding ICI intra-slice). A second
(currently size-1) ``model`` axis is kept in the mesh so tensor-parallel
shardings can be introduced without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              mesh_shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if mesh_shape is None:
        mesh_shape = (len(devices), 1)
    if len(mesh_shape) == 1:
        mesh_shape = (mesh_shape[0], 1)
    if any(int(m) < 1 for m in mesh_shape):
        # numpy-reshape-style -1 would silently drop devices (devices[:-1])
        # or build a 0-device mesh; sizes must be explicit
        raise ValueError(f"mesh_shape entries must be >= 1, got "
                         f"{tuple(mesh_shape)}")
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh_shape {tuple(mesh_shape)} needs {n} devices, "
                         f"have {len(devices)}")
    grid = devices[:n].reshape(mesh_shape)  # subset meshes allowed
    if n < len(devices) and jax.process_count() > 1:
        # A subset mesh that excludes every device of some process would make
        # that process's loader row-block empty and fail later with an opaque
        # IndexError (data/pipeline.py host_row_block); diagnose it here.
        procs = {d.process_index for d in grid.flat}
        missing = sorted(set(range(jax.process_count())) - procs)
        if missing:
            raise ValueError(
                f"mesh_shape {tuple(mesh_shape)} uses only the first {n} of "
                f"{len(devices)} devices and leaves process(es) {missing} "
                "with no mesh device; in a multi-host run every process must "
                "own at least one mesh device (use a process-aligned subset "
                "or the full device set)")
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Every leaf must have a leading batch dimension divisible by the data-axis
    size (the loader pads partial batches — see mla_tpu/data/pipeline.py).
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def path_names(path) -> list:
    """tree_map_with_path key path -> plain name list (dict keys / attrs)."""
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
    return out


def place_sharded(mesh: Mesh, state, shardings):
    """Place a host-local TrainState onto the mesh under a precomputed
    sharding pytree (the shared flow behind tp.shard_state / fsdp.shard_state).

    Multi-host: promote the (identically seeded) host-local tree to a
    replicated global array first — device_put cannot target non-addressable
    devices — then reshard on-device via a donated identity jit (donation
    avoids holding replica + shard simultaneously: 2x peak HBM at startup
    for 'huge'). Single-host: direct device_put per leaf."""
    if jax.process_count() > 1:
        state = replicate(mesh, state)
        return jax.jit(lambda s: s, donate_argnums=0,
                       out_shardings=shardings)(state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated (params, optimizer state, Pl).

    Multi-host: every process holds an identical host-local copy (init is
    seeded identically), promoted to a global replicated array — device_put
    can't target non-addressable devices directly."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def promote(x):
            # Re-placing a partially-restored state (eval-only restore swaps
            # params for host-local arrays but leaves opt_state/batch_stats
            # as the global arrays of the first placement) must pass the
            # already-global leaves through — host_local_array_to_global_
            # array rejects non-fully-addressable inputs.
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return multihost_utils.host_local_array_to_global_array(
                x, mesh, P())
        return jax.tree_util.tree_map(promote, tree)
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
