"""Tensor parallelism for the transformer encoders (M3AE / CAV-MAE).

The reference's only parallelism is single-process DataParallel
(reference: main.py:732). Here the second mesh axis (``model``) carries
Megatron-style tensor parallelism over every transformer block, expressed
purely as parameter shardings — GSPMD inserts the collectives:

  qkv / fc1 kernels  (C, K)  -> P(None, 'model')   column-parallel
  qkv / fc1 biases   (K,)    -> P('model')
  proj / fc2 kernels (K, C)  -> P('model', None)   row-parallel (all-reduce
                                                   rides the ICI after the dot)
  proj / fc2 biases  (C,)    -> replicated
  everything else            -> replicated

With the fused-attention head reshape (B, N, 3, H, D), GSPMD propagates the
qkv output sharding onto the head axis, so attention itself stays sharded
between the two projections. Activations: batch on 'data', features on
'model' inside each block — the classic 2-D (dp, tp) layout.

Enable with ``--mesh_shape d,m`` (m > 1); a rule only applies when the
dimension divides evenly, so head counts / widths that don't split stay
replicated rather than erroring.

Note: the Pallas fused-attention kernels carry a custom_partitioning rule
(ops/attention.py) declaring them embarrassingly parallel over (batch, head),
so GSPMD splits the kernel itself over the model-sharded head axis — no
gather around the custom call on either the inference path or the
Pallas-backward path (tests/test_tp.py::test_pallas_attention_partitions).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.parallel.mesh import MODEL_AXIS, path_names

# (parent module, leaf name) -> which dim is model-sharded for 2-D kernels
_COL_PARALLEL = {"qkv", "fc1"}   # shard output features (dim 1)
_ROW_PARALLEL = {"proj", "fc2"}  # shard input features (dim 0)

# back-compat alias (pp.py / fsdp.py / tests imported the private name)
_path_names = path_names


def leaf_pspec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one state leaf under (data, model) TP rules."""
    names = path_names(path)
    if len(names) < 2 or n_model <= 1:
        return P()
    parent, leaf_name = names[-2], names[-1]
    shape = jax.numpy.shape(leaf)
    # --scan_blocks stacks every block leaf with a leading (L, ...) depth dim
    # under a 'blocks' subtree (parallel/pp.py to_scan_layout); the TP rules
    # apply to the trailing feature dims, depth stays unsharded.
    stacked = "blocks" in names
    if parent in _COL_PARALLEL:
        if leaf_name == "kernel" and len(shape) == 2 \
                and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if stacked and leaf_name == "kernel" and len(shape) == 3 \
                and shape[2] % n_model == 0:
            return P(None, None, MODEL_AXIS)
        if leaf_name == "bias" and len(shape) == 1 \
                and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        if stacked and leaf_name == "bias" and len(shape) == 2 \
                and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
    if parent in _ROW_PARALLEL and leaf_name == "kernel":
        if len(shape) == 2 and shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
        if stacked and len(shape) == 3 and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS, None)
    return P()


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState (params + mirrored optimizer
    moments get the TP specs; BN stats, GS/QMF stores, counters replicate)."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, leaf_pspec(path, leaf, n_model)),
        state)


def shard_state(mesh: Mesh, state):
    """Place a host-local TrainState onto the mesh: TP-sharded where the
    rules apply, replicated elsewhere (a model axis of 1 degenerates to the
    plain DP replicate). Placement flow shared with fsdp.shard_state
    (mesh.place_sharded)."""
    from mla_tpu.parallel.mesh import place_sharded, replicate
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return replicate(mesh, state)
    return place_sharded(mesh, state, state_shardings(mesh, state))
