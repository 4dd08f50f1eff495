"""ZeRO-3 / FSDP: shard parameters + optimizer state over the DATA axis.

The reference replicates all model state per device (single-process
``torch.nn.DataParallel``, reference: main.py:732), and plain DP here does
the same. That replication is the binding constraint for the large M3AE
configs (m3ae.py:226-268): fp32 params + momentum for 'huge' are 5.4 GB
each, and PARALLELISM.md's scaling model shows the DP gradient ring
all-reduce reaching 100% of step time at small per-chip batches.

FSDP is expressed purely as placements — the idiomatic GSPMD formulation,
no manual collectives: every sufficiently large leaf of ``params`` and
``opt_state`` is sharded on its widest divisible dimension over the mesh
'data' axis. XLA then

  * all-gathers each weight at its use sites (forward and backward),
  * reduce-scatters the gradients instead of all-reducing them,
  * runs the optimizer update on the local 1/d-th shard,

so each device stores 1/d of the params + moments instead of a full
replica, and the weight gathers overlap the per-layer compute under XLA's
scheduler. Total per-step comm volume matches plain DP (all-gather +
reduce-scatter ≈ all-reduce) — the win is memory: per-chip state for
'huge' under SGD drops from 10.8 GB to 10.8/d GB, freeing HBM for batch
(the real throughput lever on this model family, BASELINE.md) or for
running 'huge' without remat.

Composes with tensor parallelism: on a (d, m) mesh with m > 1 the TP
column/row rules (parallel/tp.py) claim their dimension first and FSDP
shards the widest remaining one — the classic 2-D (fsdp, tp) layout.
Small leaves (biases, LayerNorm/BN vectors, heads, scalars) and the
non-parameter state (batch_stats, GS projector, QMF history, RNG) stay
replicated: sharding them saves nothing and the GS/QMF stores have
sequential in-step update semantics best left to one copy.

Enable with ``--fsdp`` (any mesh; a data axis of 1 degenerates to the
plain replicate). Incompatible with --pp_microbatches, which owns the
block-stack layout (config validation).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.parallel import tp
from mla_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, path_names

# Leaves smaller than this stay replicated: a 768-wide LN vector is 3 KB —
# sharding it buys nothing and costs a gather. 2^16 fp32 elements = 256 KB.
MIN_SHARD_ELEMS = 2 ** 16

# Only model parameters and their mirrored optimizer moments shard;
# batch_stats / gs / qmf / rng / step replicate (docstring rationale).
_FSDP_ROOTS = ("params", "opt_state")

# Embedding tables stay replicated (as the reference keeps them,
# reference models/m3ae.py:317): a jnp.take from a sharded table makes
# GSPMD replicate-then-repartition the gather ("Involuntary full
# rematerialization", spmd_partitioner.cc) — an unscheduled all-gather of
# the whole table every step, worse than the replicated copy it was meant
# to save. Pinned by tests/test_fsdp.py::test_embedding_stays_replicated.
_FSDP_REPLICATED_LEAVES = ("embedding", "text_embedding")


# Trace-time switch (sp.py pattern): batch-shard constraint for embedding
# LOOKUP OUTPUTS under FSDP. The qkv kernel's FSDP sharding makes the
# text-embedding cotangent arrive feature-sharded over 'data' at the
# gather's transpose (a scatter-add); inside the grad-accum loop GSPMD then
# falls back to "Involuntary full rematerialization" to reshard it. Pinning
# the lookup output (and therefore, through with_sharding_constraint's
# transpose rule, its cotangent) to plain batch sharding keeps the scatter
# partitioning on the local-scatter + all-reduce path. Installed by the
# driver when --fsdp runs on a data-axis mesh; identity otherwise.
_EMBED_MESH: "Mesh | None" = None


def enable_embed_constraint(mesh: Mesh) -> bool:
    global _EMBED_MESH
    if mesh.shape.get(DATA_AXIS, 1) <= 1:
        _EMBED_MESH = None
        return False
    _EMBED_MESH = mesh
    return True


def disable_embed_constraint():
    global _EMBED_MESH
    _EMBED_MESH = None


def constrain_embed(x):
    """Pin a (B, ...) embedding-lookup activation to batch sharding (the
    natural layout) when the FSDP constraint is installed; identity off."""
    if _EMBED_MESH is None:
        return x
    spec = P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_EMBED_MESH, spec))


def leaf_pspec(path, leaf, n_data: int, n_model: int = 1) -> P:
    """PartitionSpec for one TrainState leaf under (fsdp × tp) rules."""
    base = tp.leaf_pspec(path, leaf, n_model) if n_model > 1 else P()
    names = path_names(path)
    if n_data <= 1 or not names or names[0] not in _FSDP_ROOTS:
        return base
    if names[-1] in _FSDP_REPLICATED_LEAVES:
        return base
    shape = jax.numpy.shape(leaf)
    if not shape or int(np.prod(shape)) < MIN_SHARD_ELEMS:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    cands = [i for i in range(len(shape))
             if spec[i] is None and shape[i] % n_data == 0]
    if not cands:
        return base  # nothing divides evenly — replicate, never error
    # widest dimension wins; ties go to the lowest index
    i = max(cands, key=lambda j: (shape[j], -j))
    spec[i] = DATA_AXIS
    return P(*spec)


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState under FSDP (× TP if the mesh
    has a model axis > 1)."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, leaf_pspec(path, leaf, n_data, n_model)),
        state)


def shard_state(mesh: Mesh, state):
    """Place a host-local TrainState FSDP-sharded onto the mesh (placement
    flow shared with tp.shard_state — mesh.place_sharded)."""
    from mla_tpu.parallel.mesh import place_sharded, replicate
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if n_data <= 1 and n_model <= 1:
        return replicate(mesh, state)
    return place_sharded(mesh, state, state_shardings(mesh, state))
