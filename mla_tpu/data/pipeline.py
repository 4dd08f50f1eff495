"""Host input pipeline: threaded sample loading, static-shape batches,
device-put with batch sharding, double-buffered prefetch.

Replaces the reference's 32-worker torch DataLoader (main.py:813-817).
Batches are padded to a fixed batch_size (divisible by the data-mesh axis)
with a ``valid`` mask so every step compiles once; the final device transform
(crop/resize/normalize/SpecAug) runs fused on-device after the device_put.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from mla_tpu.parallel.mesh import batch_sharding


def pad_rows(hb: Dict[str, np.ndarray], n_real: int, width: int,
             idx_sentinel: int) -> Dict[str, np.ndarray]:
    """Single source of the padded-batch semantics: zero rows beyond
    ``n_real`` up to ``width``, a float ``valid`` mask, and padded ``idx``
    rows pointed at the sentinel slot (``n_data`` — the QMF scratch row).
    Used by both collate_pad and the loader's host-batch path."""
    if n_real < width:
        hb = {k: np.concatenate(
            [v[:n_real], np.zeros((width - n_real,) + v.shape[1:], v.dtype)])
            for k, v in hb.items()}
    hb["valid"] = np.concatenate(
        [np.ones(n_real, np.float32), np.zeros(width - n_real, np.float32)])
    if "idx" in hb:
        hb["idx"] = hb["idx"].astype(np.int32)
        hb["idx"][n_real:] = idx_sentinel
    return hb


def collate_pad(samples, batch_size: int, n_data: int) -> Dict[str, np.ndarray]:
    """Stack sample dicts; pad to batch_size with zero rows, valid=0 and
    idx=n_data (the QMF scratch slot) for padded rows."""
    out = {k: np.stack([np.asarray(s[k]) for s in samples])
           for k in samples[0].keys()}
    return pad_rows(out, len(samples), batch_size, n_data)


class Loader:
    """Iterates device-ready batch dicts for one adapter.

    shuffle per epoch with a seed-derived numpy RNG (reference: DataLoader
    shuffle=True train / False eval, main.py:813-817); drop_last=False."""

    def __init__(self, adapter, batch_size: int, mesh=None, shuffle=True,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 2,
                 transform_key=None):
        self.adapter = adapter
        if mesh is not None:
            # static batch must shard evenly over the data axis
            n_data_axis = mesh.shape.get("data", 1)
            batch_size = ((batch_size + n_data_axis - 1) // n_data_axis
                          ) * n_data_axis
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.key = transform_key if transform_key is not None else \
            jax.random.key(seed)
        self.n = len(adapter)

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def _row_window(self):
        """This host's [lo, hi) row block of every global batch.

        Single-process: the whole batch. Multi-host (jax.distributed): the
        contiguous block owned by this process's devices (SURVEY §5.8), so
        each host reads only 1/num_hosts of the files."""
        if self.mesh is None or jax.process_count() == 1:
            return 0, self.batch_size
        from mla_tpu.parallel import distributed
        return distributed.host_row_block(self.batch_size,
                                          batch_sharding(self.mesh))

    def _host_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield this host's row block of each padded global batch.

        The permutation and per-sample RNG streams are keyed by (seed, epoch,
        dataset index), so every host derives identical global batches and the
        concatenation of all hosts' blocks bit-matches the single-host batch.
        """
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        lo, hi = self._row_window()
        width = hi - lo
        batch_host = getattr(self.adapter, "batch_host", None)
        pool = None if batch_host is not None else \
            cf.ThreadPoolExecutor(self.num_workers)
        try:
            for start in range(0, self.n, self.batch_size):
                chunk = order[start:start + self.batch_size]
                n_global = len(chunk)
                # real global-row positions owned by this host
                idxs = [int(chunk[j]) for j in range(lo, min(hi, n_global))]
                rngs = [np.random.default_rng((self.seed, epoch, i))
                        for i in idxs]
                n_real = len(idxs)
                if n_real == 0:
                    # shape template: load one row, zero it (host owns only
                    # padding rows of a short final batch)
                    idxs, rngs = [int(chunk[0])], \
                        [np.random.default_rng((self.seed, epoch,
                                                int(chunk[0])))]
                if batch_host is not None:
                    # native (C++ thread pool) batch path: one call loads the
                    # rows GIL-free into contiguous buffers
                    hb = batch_host(idxs, rngs)
                else:
                    from mla_tpu.data.datasets import stack_samples
                    samples = list(pool.map(
                        lambda t: self.adapter.sample_host(t[0], t[1]),
                        zip(idxs, rngs)))
                    hb = stack_samples(samples)
                yield pad_rows(hb, n_real, width, self.n)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def epoch(self, epoch: int = 0) -> Iterator[Dict]:
        """Device-ready batches with background prefetch.

        Abandoning the iterator mid-epoch (e.g. taking only the first batch)
        stops the producer thread and shuts the worker pool down — no thread
        leak across many short epochs."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []
        stop = threading.Event()

        def producer():
            try:
                for hb in self._host_batches(epoch):
                    while not stop.is_set():
                        try:
                            q.put(hb, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as e:   # surfaced on the consumer side
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        step = 0
        try:
            while True:
                hb = q.get()
                if hb is sentinel:
                    if err:
                        raise err[0]
                    return
                if self.mesh is not None:
                    if jax.process_count() > 1:
                        from mla_tpu.parallel import distributed
                        hb = distributed.make_global_batch(
                            self.mesh, hb, self.batch_size)
                    else:
                        sh = batch_sharding(self.mesh)
                        hb = {k: jax.device_put(v, sh) for k, v in hb.items()}
                # two-level fold: the old epoch*100003+step linearization
                # collided across epochs once an epoch exceeded 100003 steps
                key = jax.random.fold_in(
                    jax.random.fold_in(self.key, epoch), step)
                yield self.adapter.finish_batch(hb, key)
                step += 1
        finally:
            stop.set()
            t.join(timeout=5.0)
