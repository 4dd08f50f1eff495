"""Multi-host data parallelism (SURVEY.md §5.8).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference: main.py:732). At real TPU-pod scale the equivalent is one process
per host: ``jax.distributed.initialize()`` connects them, the ``(data, model)``
mesh spans every host's chips, gradients all-reduce over ICI inside the jitted
step, and each host feeds only its rows of the global batch, assembled into a
global sharded array with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np

_initialized = False


def initialize(cfg) -> bool:
    """Connect this process to the multi-host cluster (no-op if single-host).

    Must run before any other JAX API touches the backend. Returns True when
    running multi-process.
    """
    global _initialized
    if cfg.dist_coordinator is None or cfg.dist_num_processes <= 1:
        return False
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=cfg.dist_coordinator,
            num_processes=cfg.dist_num_processes,
            process_id=cfg.dist_process_id)
        _initialized = True
    return True


def host_row_block(global_batch: int, sharding) -> tuple:
    """This process's contiguous [lo, hi) row range of a batch-sharded array.

    With ``PartitionSpec('data')`` over a mesh whose device order is
    process-contiguous (the jax.devices() default), each process owns a
    contiguous row block. Computed exactly from the sharding's index map so a
    reordered mesh fails loudly rather than silently misfeeding rows.
    Devices along the model axis replicate the same rows, so the per-device
    ranges are deduplicated before the contiguity check (a (d, m>1) mesh
    yields each row block once per model replica).
    """
    imap = sharding.addressable_devices_indices_map((global_batch,))
    rows = sorted({(idx[0].start or 0, idx[0].stop if idx[0].stop is not None
                    else global_batch) for idx in imap.values()})
    lo, hi = rows[0][0], rows[-1][1]
    covered = sum(b - a for a, b in rows)
    if covered != hi - lo:
        raise ValueError(
            f"process rows are not contiguous under this mesh: {rows}")
    return lo, hi


def make_global_batch(mesh, local_batch, global_batch_size: int):
    """Assemble per-host row blocks into global batch-sharded arrays."""
    from mla_tpu.parallel.mesh import batch_sharding
    sh = batch_sharding(mesh)
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (global_batch_size,) + x.shape[1:])
    return jax.tree_util.tree_map(put, local_batch)
