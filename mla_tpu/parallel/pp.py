"""GPipe-style pipeline parallelism over transformer blocks.

The reference's only parallelism is single-process DataParallel
(reference: main.py:732); dp/tp/sp already go beyond it (parallel/tp.py,
sp.py). This module adds the remaining axis: the encoder's L blocks are
split into S contiguous stages over the mesh's 'model' axis, and a batch is
driven through as n_micro microbatches on a classic GPipe schedule —
microbatch t occupies stage s at step t + s, activations hop stages over the
ICI via ``lax.ppermute``. Built with ``shard_map`` (manual SPMD), so the
schedule is explicit and XLA overlaps each stage's compute with the
neighbor transfer.

At this model family's flagship sizes (ViT-Base, 12 blocks) one chip holds
the whole model, so pp is not the production default — it is the scaling
path for the 'large'/'huge' configs (24/32 blocks, m3ae.py:226-268) and is
certified the same way as dp/tp/sp: numerics vs the sequential encoder
(tests/test_pp.py) and a multi-chip dryrun leg (__graft_entry__.dryrun_pp).

Layout contract:
  - block params are stacked: every leaf (L, ...) with dim 0 sharded
    P('model') -> stage s holds rows [s*L/S, (s+1)*L/S)
  - activations/batch enter sharded P('data') (pp composes with DP on the
    'data' axis; each data-slice runs its own pipeline)
  - the pipeline is differentiable end-to-end (ppermute/where/scan all have
    transposes), so ``jax.grad`` through ``pipeline_blocks`` yields the
    GPipe backward schedule automatically.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_block_params(params: Any, depth: int):
    """Stack per-block param subtrees ``block_0..block_{L-1}`` (as produced
    by the unrolled encoders, models/m3ae.py) into one pytree whose leaves
    carry a leading (L,) block dimension."""
    per_block = [params[f"block_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_block)


def unstack_block_params(stacked: Any, depth: int):
    """Inverse of :func:`stack_block_params` (for checkpoint export)."""
    return {f"block_{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(depth)}


def to_scan_layout(params: Any):
    """Recursively convert every unrolled ``block_0..block_{L-1}`` family in
    a param tree into the stacked ``blocks`` entry the scan_blocks encoders
    use (models/m3ae.py). Dicts without block_i keys recurse unchanged —
    works on whole classifier trees (mae_a / mae_v / mae_t)."""
    if not isinstance(params, dict):
        return params
    if "block_0" in params:
        depth = sum(1 for k in params if k.startswith("block_"))
        out = {k: to_scan_layout(v) for k, v in params.items()
               if not k.startswith("block_")}
        out["blocks"] = stack_block_params(params, depth)
        return out
    return {k: to_scan_layout(v) for k, v in params.items()}


def from_scan_layout(params: Any):
    """Inverse of :func:`to_scan_layout`."""
    if not isinstance(params, dict):
        return params
    if "blocks" in params and isinstance(params["blocks"], dict):
        depth = jax.tree_util.tree_leaves(params["blocks"])[0].shape[0]
        out = {k: from_scan_layout(v) for k, v in params.items()
               if k != "blocks"}
        out.update(unstack_block_params(params["blocks"], depth))
        return out
    return {k: from_scan_layout(v) for k, v in params.items()}


def shard_stacked(mesh: Mesh, stacked: Any):
    """Place stacked block params with dim 0 (blocks) over the 'model' axis."""
    sh = NamedSharding(mesh, P(MODEL_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def _stage_apply(block, stage_params, x, mask, remat=False):
    """Run this stage's L/S blocks sequentially (lax.scan over the local
    stacked params). With ``remat`` each block's activations are
    rematerialized in the backward (GPipe's standard memory/FLOP trade —
    without it every microbatch x block activation is live until its
    backward step)."""
    def body(h, p):
        return block.apply({"params": p}, h, mask), None
    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, x, stage_params)
    return h


def pipeline_blocks(block, stacked_params, x, padding_mask, mesh: Mesh,
                    n_micro: int, remat: bool = False):
    """Apply L stacked transformer blocks as an S-stage GPipe pipeline.

    block: the (stateless) Flax block module (e.g. models.layers.M3AEBlock)
    stacked_params: pytree with leading (L, ...) leaves, dim 0 sharded over
        'model' (see shard_stacked)
    x: (B, N, C) tokens, batch sharded over 'data'
    padding_mask: (B, N) float mask, batch sharded over 'data'
    n_micro: microbatches per data-slice; B/data_axis must divide by it.
        Pipeline bubble fraction = (S-1)/(n_micro + S - 1).
    """
    n_stages = mesh.shape.get(MODEL_AXIS, 1)
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")

    fn = functools.partial(_pipeline_device, block=block, n_stages=n_stages,
                           n_micro=n_micro, remat=remat)
    pspec = jax.tree_util.tree_map(lambda _: P(MODEL_AXIS), stacked_params)
    out = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(stacked_params, x, padding_mask)
    return out


def _pipeline_device(stage_params, x, mask, *, block, n_stages, n_micro,
                     remat=False):
    """Per-device pipeline program (inside shard_map; 'model' = stage axis).

    Every stage device holds its slice of the blocks and the full local
    batch; stage 0 injects microbatch t at step t, stage s processes
    microbatch t at step t + s, the last stage emits it at step
    t + n_stages - 1. One activation hops per step via ppermute.
    """
    bl, n, c = x.shape
    if n_micro < 1 or bl % n_micro:
        raise ValueError(
            f"--pp_microbatches={n_micro} must be >= 1 and divide the "
            f"per-data-slice batch {bl} (global batch / data-axis size)")
    mb = bl // n_micro
    x_mb = x.reshape(n_micro, mb, n, c)
    m_mb = mask.reshape(n_micro, mb, n)
    sidx = jax.lax.axis_index(MODEL_AXIS)

    carry = jnp.zeros_like(x_mb[0])
    outs = jnp.zeros_like(x_mb)
    fwd_ring = [(i, i + 1) for i in range(n_stages - 1)]

    for t in range(n_micro + n_stages - 1):          # static schedule
        # microbatch index this stage works on at step t (clipped; masked out
        # when outside [0, n_micro) — those steps are bubble slots)
        midx = jnp.clip(t - sidx, 0, n_micro - 1)
        mask_in = m_mb[midx]
        feed = x_mb[min(t, n_micro - 1)]
        x_in = jnp.where(sidx == 0, feed, carry)
        y = _stage_apply(block, stage_params, x_in, mask_in, remat=remat)
        if t >= n_stages - 1:
            oidx = t - (n_stages - 1)
            outs = outs.at[oidx].set(
                jnp.where(sidx == n_stages - 1, y, outs[oidx]))
        if n_stages > 1:
            carry = jax.lax.ppermute(y, MODEL_AXIS, fwd_ring)

    # only the last stage holds real outputs; make them stage-replicated
    outs = jax.lax.psum(
        jnp.where(sidx == n_stages - 1, outs, jnp.zeros_like(outs)),
        MODEL_AXIS)
    return outs.reshape(bl, n, c)


# ---------------------------------------------------------------------------
# Train-path integration (--pp_microbatches): a trace-time switch, same
# pattern as sp.enable (parallel/sp.py). When enabled, M3AEEncoder.__call__
# (models/m3ae.py) routes its stacked --scan_blocks stack through
# pipeline_blocks instead of nn.scan, so every regime's jitted train step and
# the eval step pipeline the 'large'/'huge' encoders with no other changes.
# ---------------------------------------------------------------------------

_TRAIN_PP = None     # (mesh, n_micro, remat) or None


def enable_train(mesh: Mesh, n_micro: int, remat: bool = False) -> bool:
    """Install pipeline-parallel training. Returns True if active (model
    axis > 1); degenerates to off on a pure-DP mesh."""
    global _TRAIN_PP
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        _TRAIN_PP = None
        return False
    _TRAIN_PP = (mesh, int(n_micro), bool(remat))
    return True


def disable_train():
    global _TRAIN_PP
    _TRAIN_PP = None


def train_config():
    """(mesh, n_micro, remat) when PP training is enabled, else None."""
    return _TRAIN_PP


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for PP training: every leaf under a 'blocks'
    subtree (the stacked block params and their mirrored optimizer moments)
    is stage-sharded on dim 0 over 'model'; everything else replicates."""
    from mla_tpu.parallel.mesh import path_names as _path_names

    def spec(path, leaf):
        names = _path_names(path)
        if "blocks" in names and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_train(mesh: Mesh, state):
    """Place a host-local TrainState for PP training (stage-sharded blocks).
    Multi-host: promote replicated first, then reshard on-device (same
    reasoning as tp.shard_state)."""
    from mla_tpu.parallel.mesh import replicate
    if jax.process_count() > 1:
        state = replicate(mesh, state)
        # donate: without it every device holds the full replicated tree AND
        # its shard during the reshard (2x peak HBM at startup for 'huge')
        return jax.jit(lambda s: s, donate_argnums=0,
                       out_shardings=state_shardings(mesh, state))(state)
    return jax.tree_util.tree_map(jax.device_put, state,
                                  state_shardings(mesh, state))


def pipeline_m3ae_encoder(encoder, variables, stacked_blocks, image, text,
                          text_padding_mask, mesh: Mesh, n_micro: int):
    """Full pipelined M3AE encoder forward: embed (stage-replicated, tiny)
    -> S-stage pipelined block stack -> final LayerNorm.

    ``stacked_blocks`` is the pre-stacked/sharded block pytree
    (shard_stacked(mesh, stack_block_params(variables['params'], depth)));
    pre-placing it once keeps the per-step cost to the pipeline itself.
    """
    from mla_tpu.models.layers import M3AEBlock
    c = encoder.config
    x, pmask = encoder.apply(variables, image, text, text_padding_mask,
                             method=encoder.embed)
    block = M3AEBlock(c.emb_dim, c.num_heads, c.mlp_ratio,
                      dtype=encoder.dtype)
    x = pipeline_blocks(block, stacked_blocks, x, pmask, mesh, n_micro)
    return encoder.apply(variables, x, method=encoder.finalize)
