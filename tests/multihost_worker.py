"""Subprocess worker for the multi-host DP test (not collected by pytest).

Runs one MLA train step on a synthetic CREMA-D fixture over a mesh that spans
all processes, then writes digests (batch bytes hash, params checksum) for the
parent to compare across topologies.

argv: out_path data_root n_procs proc_id coordinator(port or '-') [mode]
mode: 'dp' (default — CREMA-D AVClassifier, pure-DP mesh) or 'tp'
(MVSA m3ae debug classifier over a (2, 2) mesh with Megatron shardings +
sharded-loader row blocks + a TP checkpoint save — the multi-host x TP
combination fixed in the round-2 review).
Env (set by the parent): JAX_PLATFORMS=cpu,
  XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>
"""

import hashlib
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _batch_digest(batch, n_procs):
    from jax.experimental import multihost_utils
    if n_procs > 1:
        host_batch = {k: np.asarray(multihost_utils.process_allgather(
            v, tiled=True)) for k, v in batch.items()}
    else:
        host_batch = {k: np.asarray(v) for k, v in batch.items()}
    d = hashlib.sha256()
    for k in sorted(host_batch):
        d.update(np.ascontiguousarray(host_batch[k]).tobytes())
    return d.hexdigest()


def run_tp(out_path, data_root, n_procs, proc_id, coord):
    from mla_tpu.core.config import MLAConfig
    from mla_tpu.parallel import distributed

    cfg = MLAConfig(
        dataset="MVSA", lorb="m3ae", gs_flag=True, train=True,
        batch_size=4, data_root=data_root, num_workers=2,
        use_tensorboard=False, mesh_shape=(2, 2),
        dist_coordinator=None if coord == "-" else f"127.0.0.1:{coord}",
        dist_num_processes=n_procs, dist_process_id=proc_id).validate()
    distributed.initialize(cfg)

    import os
    from jax.sharding import PartitionSpec as P

    from mla_tpu.data.datasets import build_adapter
    from mla_tpu.data.pipeline import Loader
    from mla_tpu.models.classifiers import M3AEClassifier
    from mla_tpu.parallel import tp
    from mla_tpu.parallel.mesh import make_mesh, shard_batch
    from mla_tpu.runtime import checkpoint as ckpt_lib
    from mla_tpu.train import optim, steps
    from mla_tpu.train.state import create_train_state

    assert len(jax.devices()) == 4, jax.devices()
    mesh = make_mesh(mesh_shape=(2, 2))
    model = M3AEClassifier(n_classes=3, gs_flag=True, model_type="debug",
                           text_vocab_size=30522, dtype=jnp.float32)
    adapter = build_adapter(cfg, "train")
    # the loader's host row window must dedupe model-axis replicas
    loader = Loader(adapter, cfg.batch_size, mesh=mesh, shuffle=True,
                    seed=cfg.random_seed, num_workers=2)
    gen = loader.epoch(0)
    batch = next(gen)
    gen.close()
    batch_sha = _batch_digest(batch, n_procs)

    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec,
                               n_data=len(adapter), seed=cfg.random_seed)
    state = tp.shard_state(mesh, state)
    qkv = state.params["mae_v"]["block_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model"), qkv.sharding

    step = jax.jit(steps.make_mla_train_step(model, cfg, spec,
                                             len_dl=len(loader)),
                   donate_argnums=0)
    new_state, metrics = step(state, batch, jnp.float32(1e-3), jnp.int32(0))
    jax.block_until_ready(metrics)

    # TP checkpoint save: model-sharded leaves must reshard + localize
    ckpt_dir = os.path.join(os.path.dirname(out_path), f"ck_tp{n_procs}")
    path = ckpt_lib.save_checkpoint(ckpt_dir, new_state, {"acc": 0.0},
                                    name="tp")
    restored = ckpt_lib.restore_checkpoint(path, new_state)
    head = np.asarray(jax.device_get(
        restored.params["fusion_module"]["fc_out"]["kernel"]))
    with open(out_path, "w") as f:
        json.dump({"batch_sha": batch_sha,
                   "loss": float(metrics["loss"]),
                   "head_kernel": head.ravel()[:16].tolist()}, f)
    print("tp worker", proc_id, "ok")


def main():
    out_path, data_root, n_procs, proc_id, coord = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "dp"
    n_procs, proc_id = int(n_procs), int(proc_id)
    if mode == "tp":
        run_tp(out_path, data_root, n_procs, proc_id, coord)
        return

    from mla_tpu.core.config import MLAConfig
    from mla_tpu.parallel import distributed

    cfg = MLAConfig(
        dataset="CREMAD", lorb="base", gs_flag=True, train=True,
        image_size=32, batch_size=4, data_root=data_root, num_workers=2,
        use_tensorboard=False,
        dist_coordinator=None if coord == "-" else f"127.0.0.1:{coord}",
        dist_num_processes=n_procs, dist_process_id=proc_id).validate()
    distributed.initialize(cfg)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mla_tpu.data.datasets import build_adapter
    from mla_tpu.data.pipeline import Loader
    from mla_tpu.models.classifiers import AVClassifier
    from mla_tpu.parallel.mesh import make_mesh, replicate
    from mla_tpu.train import optim, steps
    from mla_tpu.train.state import create_train_state

    assert len(jax.devices()) == 4, jax.devices()
    mesh = make_mesh()
    model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.float32,
                         stages=(1, 1, 1, 1))
    adapter = build_adapter(cfg, "train")
    loader = Loader(adapter, cfg.batch_size, mesh=mesh, shuffle=True,
                    seed=cfg.random_seed, num_workers=2)
    gen = loader.epoch(0)
    batch = next(gen)
    gen.close()

    # the global batch must be identical whatever the host topology
    from jax.experimental import multihost_utils
    if n_procs > 1:
        host_batch = {k: np.asarray(multihost_utils.process_allgather(
            v, tiled=True)) for k, v in batch.items()}
    else:
        host_batch = {k: np.asarray(v) for k, v in batch.items()}
    batch_digest = hashlib.sha256()
    for k in sorted(host_batch):
        batch_digest.update(np.ascontiguousarray(host_batch[k]).tobytes())

    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec,
                               n_data=len(adapter), seed=cfg.random_seed)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state = replicate(mesh, state)
    step = jax.jit(steps.make_mla_train_step(model, cfg, spec,
                                             len_dl=len(loader)),
                   in_shardings=(repl, shard, None, None), donate_argnums=0)
    new_state, metrics = step(state, batch, jnp.float32(1e-3), jnp.int32(0))
    jax.block_until_ready(new_state)

    leaves = jax.tree_util.tree_leaves(new_state.params)
    checksum = float(sum(
        np.abs(np.asarray(l.addressable_shards[0].data)).sum()
        for l in leaves))
    first_kernel = np.asarray(
        new_state.params["fusion_module"]["fc_out"]["kernel"]
        .addressable_shards[0].data)
    with open(out_path, "w") as f:
        json.dump({"batch_sha": batch_digest.hexdigest(),
                   "loss": float(metrics["loss"]),
                   "params_checksum": checksum,
                   "head_kernel": first_kernel.ravel()[:16].tolist()}, f)
    print("worker", proc_id, "ok")


if __name__ == "__main__":
    main()
