"""Epoch orchestration: the main() / train_epoch() / valid() driver.

Reference: main.py:697-968. Same control flow (seed -> model -> optional
warm-start -> loaders -> epoch loop -> best-ckpt on val accuracy -> eval-only
branch), with TPU-native machinery: a (data, model) device mesh, one jitted
train step per regime with donated state, jitted eval accumulating on-device
per-class counts, jax.profiler-annotated steps, TensorBoard scalars under the
reference's names (Loss/Evaluation, main.py:865-893).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.core.config import MLAConfig
from mla_tpu.data.datasets import build_adapter
from mla_tpu.data.pipeline import Loader
from mla_tpu.evals.metrics import make_eval_step, summarize_counts
from mla_tpu.models.classifiers import build_classifier, modalities_of
from mla_tpu.parallel.mesh import make_mesh
from mla_tpu.parallel.tp import shard_state
from mla_tpu.runtime import checkpoint as ckpt_lib
from mla_tpu.train import optim, steps as steps_lib
from mla_tpu.train.state import create_train_state


def _writer(cfg: MLAConfig):
    if not cfg.use_tensorboard:
        return None
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None
    tag = "GS" if cfg.gs_flag else cfg.modulation
    log_name = "{}_{}_{}".format(
        cfg.fusion_method, tag,
        datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    path = os.path.join(cfg.tensorboard_path, cfg.dataset, log_name)
    os.makedirs(path, exist_ok=True)
    return SummaryWriter(path)


def scalar_groups(cfg: MLAConfig, epoch_metrics: Dict[str, float],
                  accs: Dict[str, float]):
    """TensorBoard scalar groups, exactly the reference's names
    (main.py:865-893) — the contract curve-to-curve comparison depends on
    (tests/test_observability.py)."""
    loss_scalars = {"Total Loss": epoch_metrics.get("loss", 0.0),
                    "Audio Loss": epoch_metrics.get("loss_a", 0.0),
                    "Visual Loss": epoch_metrics.get("loss_v", 0.0)}
    eval_scalars = {"Total Accuracy": accs.get("acc", 0.0),
                    "Audio Accuracy": accs.get("acc_a", 0.0),
                    "Visual Accuracy": accs.get("acc_v", 0.0)}
    if cfg.modal3:
        loss_scalars["Text Loss"] = epoch_metrics.get("loss_t", 0.0)
        eval_scalars["Text Accuracy"] = accs.get("acc_t", 0.0)
    return loss_scalars, eval_scalars


def _export_torch(cfg: MLAConfig, state, epoch: int, acc: float) -> None:
    """--export_torch: write a reference-loadable .pth from the live state
    (models/torch_export.py). Sharded states are fetched to host first
    (host_fetch gathers single-process shards, fails loudly on cross-process
    model shards); only process 0 writes."""
    from mla_tpu.models.torch_export import save_torch_checkpoint
    from mla_tpu.runtime.export import host_fetch
    host = (host_fetch(state.params),
            host_fetch(state.batch_stats) if state.batch_stats else {})
    if jax.process_index() == 0:
        save_torch_checkpoint(cfg.export_torch, host, cfg,
                              epoch=epoch, acc=acc)
        print(f"Exported torch checkpoint to {cfg.export_torch}")


def evaluate(cfg, model, state, loader, eval_step) -> Dict[str, float]:
    totals = None
    for batch in loader.epoch(0):
        counts = eval_step(state.params, state.batch_stats, batch)
        totals = counts if totals is None else \
            jax.tree_util.tree_map(jnp.add, totals, counts)
    if totals is None:
        return {}
    # wait for ALL shards (a replicated array's float() read only forces
    # device 0); leaves no in-flight multi-device work behind
    totals = jax.block_until_ready(totals)
    return summarize_counts(totals)


def run(cfg: MLAConfig, max_steps_per_epoch: Optional[int] = None):
    """Train (cfg.train) or evaluate a checkpoint (not cfg.train)."""
    from mla_tpu.ops import attention as attn_lib
    from mla_tpu.parallel import fsdp, pp, sp
    sp.disable()          # never inherit a previous run's token sharding
    pp.disable_train()    # or its pipeline schedule
    fsdp.disable_embed_constraint()
    attn_lib.set_flat_attention(True)
    try:
        return _run(cfg, max_steps_per_epoch)
    finally:
        sp.disable()  # the trace-time globals must not outlive this run
        pp.disable_train()
        fsdp.disable_embed_constraint()
        attn_lib.set_flat_attention(True)


def _run(cfg: MLAConfig, max_steps_per_epoch: Optional[int] = None):
    np.random.seed(cfg.random_seed)          # setup_seed (utils.py:98-103);
    # JAX randomness is explicit PRNG-key threading — deterministic by design.

    if cfg.compile_cache:
        # Persistent XLA compilation cache: the unrolled large/huge block
        # stacks compile in minutes cold but load in seconds on every later
        # run — production can take the unrolled layout's step-time win over
        # --scan_blocks as a one-time cost (BASELINE.md scan-blocks trade).
        jax.config.update("jax_compilation_cache_dir", cfg.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mla_tpu.parallel import distributed
    distributed.initialize(cfg)              # no-op unless --dist_coordinator
    mesh = make_mesh(mesh_shape=cfg.mesh_shape)
    if mesh.shape.get("model", 1) > 1:
        # the flat (transpose-free) attention kernels carry no
        # custom_partitioning rules; under a model axis use the (B,H,S,D)
        # kernels GSPMD can split over heads (ops/attention.py)
        from mla_tpu.ops import attention as attn_lib
        attn_lib.set_flat_attention(False)
    model = build_classifier(cfg)
    train_adapter = build_adapter(cfg, "train")
    test_adapter = build_adapter(cfg, "test")
    train_loader = Loader(train_adapter, cfg.batch_size, mesh=mesh,
                          shuffle=True, seed=cfg.random_seed,
                          num_workers=cfg.num_workers)
    test_loader = Loader(test_adapter, cfg.batch_size, mesh=mesh,
                         shuffle=False, seed=cfg.random_seed,
                         num_workers=cfg.num_workers)

    sample_gen = train_loader.epoch(0)
    sample = next(sample_gen)
    sample_gen.close()  # stop the prefetch producer deterministically
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, sample, spec,
                               n_data=len(train_adapter),
                               seed=cfg.random_seed)
    # cav_opti lr groups need the param tree (main.py:739-746); state layout
    # is unchanged, only per-leaf lr scales are attached
    spec = optim.make_spec(cfg, state.params)
    if cfg.pretrained_a or cfg.pretrained_v or cfg.pretrained_t:
        from mla_tpu.models.torch_import import load_pretrained_encoders
        state = state.replace(params=load_pretrained_encoders(cfg, state.params))
    if cfg.ckpt_load_path_train:
        state = state.replace(params=ckpt_lib.warm_start_params(
            cfg.ckpt_load_path_train, state.params))
        print("Trained model loaded!")
    # Parallel layout over the (data, model) mesh: PP stage-shards the
    # stacked blocks (parallel/pp.py); --fsdp ZeRO-shards params+moments
    # over the data axis (parallel/fsdp.py, composing with TP); else TP
    # column/row-shards the transformer kernels (parallel/tp.py). All
    # degenerate to the plain DP replicate on a 1-device mesh.
    pp_on = False
    if cfg.pp_microbatches:
        from mla_tpu.parallel import pp as pp_lib
        pp_on = pp_lib.enable_train(mesh, cfg.pp_microbatches, cfg.pp_remat)
        if not pp_on:
            print("WARNING: --pp_microbatches ignored — mesh has no model "
                  "axis (need --mesh_shape d,m with m > 1)")
    if pp_on:
        from mla_tpu.parallel import pp as pp_lib
        place_state = lambda s: pp_lib.shard_state_train(mesh, s)  # noqa: E731
    elif cfg.fsdp:
        # ZeRO-3: params + optimizer moments live 1/d-sharded over the data
        # axis (parallel/fsdp.py); subsumes the TP rules when the mesh also
        # has a model axis > 1
        from mla_tpu.parallel import fsdp as fsdp_lib
        place_state = lambda s: fsdp_lib.shard_state(mesh, s)      # noqa: E731
        fsdp_lib.enable_embed_constraint(mesh)  # clean embedding-grad scatter
    else:
        place_state = lambda s: shard_state(mesh, s)               # noqa: E731
    state = place_state(state)
    if cfg.seq_parallel:
        # token-shard the residual stream between blocks (parallel/sp.py);
        # trace-time switch — must be set before the steps below are jitted
        from mla_tpu.parallel import sp
        if not sp.enable(mesh):
            print("WARNING: --seq_parallel ignored — mesh has no model axis "
                  "(need --mesh_shape d,m with m > 1)")

    len_dl = len(train_loader)
    train_step = jax.jit(
        steps_lib.make_train_step(model, cfg, spec, len_dl),
        donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, cfg))

    if not cfg.train:
        # eval-only: cfg.ckpt_path is the checkpoint to load (main.py:946-953).
        # .pth checkpoints (e.g. the released Zenodo models, README.md:29) are
        # imported through the torch->flax shim.
        if cfg.ckpt_path.endswith((".pth", ".pt", ".pkl")):
            from mla_tpu.models.torch_import import load_torch_checkpoint
            params, stats = load_torch_checkpoint(cfg.ckpt_path, cfg)
            state = state.replace(params=params,
                                  batch_stats=stats or state.batch_stats)
        else:
            state = ckpt_lib.restore_checkpoint(cfg.ckpt_path, state)
        # restored leaves are host-local; promote back onto the global mesh
        state = place_state(state)
        accs = evaluate(cfg, model, state, test_loader, eval_step)
        print("Accuracy:", accs)
        if cfg.export_dir:
            # after evaluate: export clears the trace-time parallel switches
            # (the serving graph is single-device), which would otherwise
            # break a subsequent sp/pp-sharded eval step
            from mla_tpu.runtime.export import export_from_driver
            export_from_driver(cfg, model, state, sample)
        if cfg.export_torch:
            _export_torch(cfg, state, epoch=0, acc=accs.get("acc", 0.0))
        return jax.block_until_ready(state), accs

    start_epoch = 0
    best_acc = 0.0
    if cfg.resume:
        # mid-run resume (beyond the reference, SURVEY.md §5.4): the full
        # TrainState — params, optimizer buffers, BN stats, GS Pl/exp_count,
        # QMF history, PRNG key, step — plus epoch/best-acc come back, so an
        # interrupted run bit-matches an uninterrupted one (test_driver.py).
        state = ckpt_lib.restore_checkpoint(cfg.resume, state)
        state = place_state(state)
        meta = ckpt_lib.load_meta(cfg.resume)
        if "saved_epoch" not in meta:
            raise ValueError(
                f"cannot resume from {cfg.resume}: metadata has no "
                "saved_epoch (meta.json missing and the name encodes none)")
        start_epoch = int(meta["saved_epoch"]) + 1
        best_acc = float(meta.get("best_acc", meta.get("acc", 0.0)))
        print(f"Resumed from {cfg.resume}: epoch {start_epoch}, "
              f"best acc {best_acc:.3f}")

    writer = _writer(cfg)
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        print(f"Epoch: {epoch}: ")
        lr = jnp.float32(optim.lr_for_epoch(cfg, epoch))
        t0 = time.time()
        msum = None  # device-side accumulation: no per-step host sync
        n_batches = 0
        profiling = cfg.profile_dir and epoch == 0
        prof_started = False
        with jax.profiler.StepTraceAnnotation("train_epoch", epoch=epoch):
            for bi, batch in enumerate(train_loader.epoch(epoch)):
                if max_steps_per_epoch and bi >= max_steps_per_epoch:
                    break
                if profiling and bi == 2:
                    jax.profiler.start_trace(cfg.profile_dir)
                    prof_started = True
                state, metrics = train_step(state, batch, lr,
                                            jnp.int32(bi), jnp.int32(epoch))
                if profiling and bi == 6:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                ogm = {k: metrics.pop(k) for k in
                       ("ratio_v", "coeff_a", "coeff_v", "coeff_t")
                       if k in metrics}
                if writer is not None and ogm:
                    # per-iteration modulation scalars (main.py:339-344,
                    # 386-390); each float() is a host sync — the cost the
                    # reference pays too, opted into via --use_tensorboard
                    it = epoch * len_dl + bi
                    writer.add_scalar("data/ratio v",
                                      float(ogm["ratio_v"]), it)
                    for m in ("v", "a", "t"):
                        if f"coeff_{m}" in ogm:
                            writer.add_scalar(f"data/coefficient {m}",
                                              float(ogm[f"coeff_{m}"]), it)
                msum = metrics if msum is None else \
                    jax.tree_util.tree_map(jnp.add, msum, metrics)
                n_batches += 1
                if (bi + 1) % cfg.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(f"  step {bi + 1}/{len_dl} "
                          + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        if profiling and prof_started:
            # epoch ended before the bi==6 stop point (short dataset /
            # max_steps_per_epoch); a dangling active trace would crash the
            # next start_trace in this process
            jax.profiler.stop_trace()
            profiling = False
        # epoch means, as train_epoch returns _loss/len(dataloader)
        # (main.py:482-484)
        epoch_metrics = {k: float(v) / max(n_batches, 1)
                         for k, v in msum.items()}
        accs = evaluate(cfg, model, state, test_loader, eval_step)
        dt = time.time() - t0
        acc = accs.get("acc", 0.0)
        history.append({"epoch": epoch, "acc": acc, **epoch_metrics,
                        "wall_s": dt})
        if writer is not None:
            loss_scalars, eval_scalars = scalar_groups(cfg, epoch_metrics,
                                                       accs)
            writer.add_scalars("Loss", loss_scalars, epoch)
            writer.add_scalars("Evaluation", eval_scalars, epoch)

        if acc > best_acc:
            best_acc = acc
            name = ("best_model_of_dataset_{}_{}_alpha_{}_optimizer_{}_"
                    "modulate_starts_{}_ends_{}_epoch_{}_acc_{}").format(
                cfg.dataset, cfg.modulation, cfg.alpha, cfg.optimizer,
                cfg.modulation_starts, cfg.modulation_ends, epoch, acc)
            # async: D2H snapshot now, file write on Orbax's background
            # thread — the next epoch overlaps the disk I/O
            path = ckpt_lib.save_checkpoint_async(
                cfg.ckpt_path, state,
                {"saved_epoch": epoch, "modulation": cfg.modulation,
                 "alpha": cfg.alpha, "fusion": cfg.fusion_method, "acc": acc},
                name=name)
            print(f"The best model has been saved at {path}.")
            print("Loss: {:.3f}, Acc: {:.3f}".format(
                epoch_metrics.get("loss", 0.0), acc))
        else:
            print("Loss: {:.3f}, Acc: {:.3f}, Best Acc: {:.3f}".format(
                epoch_metrics.get("loss", 0.0), acc, best_acc))
        if cfg.modal3:
            # main.py:934-941 prints all three per-modality accuracies
            print("Audio Acc: {:.3f}, Visual Acc: {:.3f}, Text Acc: {:.3f} "
                  .format(accs.get("acc_a", 0.0), accs.get("acc_v", 0.0),
                          accs.get("acc_t", 0.0)))
        else:
            print("Audio Acc: {:.3f}, Visual Acc: {:.3f} ".format(
                accs.get("acc_a", 0.0), accs.get("acc_v", 0.0)))
        if cfg.save_last:
            # rolling restart point for --resume; async write overlaps the
            # next epoch like the best-ckpt save
            ckpt_lib.save_checkpoint_async(
                cfg.ckpt_path, state,
                {"saved_epoch": epoch, "best_acc": best_acc, "acc": acc,
                 "modulation": cfg.modulation, "alpha": cfg.alpha,
                 "fusion": cfg.fusion_method},
                name="last")
    if cfg.export_dir:
        # serving artifact from the final state (for the best-epoch weights,
        # run eval-only with --export_dir on the saved best checkpoint)
        from mla_tpu.runtime.export import export_from_driver
        export_from_driver(cfg, model, state, sample)
    if cfg.export_torch:
        _export_torch(cfg, state, epoch=cfg.epochs - 1, acc=best_acc)
    # quiesce: float() metric reads above only force device 0 of replicated
    # arrays; wait for every shard so no multi-device execution outlives run()
    ckpt_lib.wait_for_async_saves()  # commit any in-flight best-ckpt write
    return jax.block_until_ready(state), {"best_acc": best_acc,
                                          "history": history}
