"""Sequence parallelism (Megatron-SP) for the transformer encoders.

Under plain TP (parallel/tp.py) the residual stream (B, N, C) is replicated
over the model axis between blocks: every chip runs the full LayerNorms and
residual adds, and the row-parallel proj/fc2 outputs are combined with an
all-reduce. SP shards the token axis N over 'model' in those between-block
regions instead: GSPMD then lowers the row-parallel combine to a
reduce-scatter and re-gathers tokens just before the column-parallel
qkv/fc1 — identical total bytes on the ICI, but LayerNorm/residual compute
and activation residency drop by the model-axis size (the standard
Megatron-LM SP layout; there is no reference equivalent — its only
parallelism is single-process DataParallel, reference main.py:732).

Mechanism: pure GSPMD. The blocks call :func:`constrain` on the residual
stream; when the driver has installed a token sharding (``enable(mesh)``,
driven by ``--seq_parallel``), that is a ``with_sharding_constraint`` pinning
(B, N, C) -> P('data', 'model', None), and the partitioner propagates
collectives from there. When disabled (the default) it is an identity, so
single-device traces and TP-only runs are untouched. The combine collective
is the backend's choice: TPU fuses the partial-sum + slice into a
reduce-scatter; the XLA:CPU test backend keeps all-reduce + dynamic-slice
(same layout, unfused) — tests therefore pin the token-sharded layout, not
the collective's name.

Token counts need not divide the model axis — GSPMD pads uneven shards.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mla_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Installed by the driver before tracing; None = SP off (identity constrain).
_TOKEN_SHARDING: Optional[NamedSharding] = None


def enable(mesh: Mesh) -> bool:
    """Install the sequence-sharded activation spec. Returns True if SP is
    active (model axis > 1); degenerates to off on a pure-DP mesh."""
    global _TOKEN_SHARDING
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        _TOKEN_SHARDING = None
        return False
    _TOKEN_SHARDING = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    return True


def disable():
    global _TOKEN_SHARDING
    _TOKEN_SHARDING = None


def is_enabled() -> bool:
    return _TOKEN_SHARDING is not None


def constrain(x):
    """Pin a (B, N, C) residual-stream activation to the SP token sharding.

    Identity unless SP is enabled (trace-time decision: the flag is read
    when the block is traced, so jitted steps bake in the layout).
    """
    if _TOKEN_SHARDING is None or x.ndim != 3:
        return x
    return jax.lax.with_sharding_constraint(x, _TOKEN_SHARDING)
