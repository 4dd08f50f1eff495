"""On-chip bisection of the CREMA-D MLA train step (VERDICT r1 next #3).

The axon relay records no op-level xplane events, so the 66 ms step is
decomposed empirically: each component is timed as its own jitted program on
the real chip, with XLA cost analysis (FLOPs + bytes) per program.

Usage: python benchmarks/profile_step.py [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from mla_tpu.core.config import MLAConfig  # noqa: E402
from mla_tpu.data import transforms as T  # noqa: E402
from mla_tpu.models.classifiers import AVClassifier  # noqa: E402
from mla_tpu.train import optim, steps as steps_lib  # noqa: E402
from mla_tpu.train.state import create_train_state  # noqa: E402

BATCH = 64
SPEC_HW = (129, 626)
IMG = 224
N_FRAMES = 3


def timed(fn, args, reps, read):
    """Compile, then time; read() must force the full dependency chain
    (block_until_ready is unreliable on the axon relay)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    out = compiled(*args)
    read(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    read(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = MLAConfig(dataset="CREMAD", lorb="base", gs_flag=True,
                    train=True).validate()
    model = AVClassifier(n_classes=6, gs_flag=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    canon = T.CANONICAL[IMG]
    frames_u8 = jnp.asarray(rng.integers(
        0, 255, (BATCH, N_FRAMES, canon, canon, 3), dtype=np.uint8))
    boxes = jnp.asarray(np.tile(np.array([10, 10, 200, 200], np.float32),
                                (BATCH, N_FRAMES, 1)))
    flips = jnp.asarray(rng.random((BATCH, N_FRAMES)) < 0.5)
    spec = jnp.asarray(rng.standard_normal((BATCH, 1) + SPEC_HW), jnp.float32)
    image = jnp.asarray(rng.standard_normal(
        (BATCH, 3, N_FRAMES, IMG, IMG)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 6, BATCH), jnp.int32)
    batch = {"spec": spec, "image": image, "label": label,
             "idx": jnp.arange(BATCH, dtype=jnp.int32),
             "valid": jnp.ones((BATCH,), jnp.float32)}

    opt_spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, opt_spec)
    params, bs = state.params, state.batch_stats
    key = jax.random.key(0)

    rows = []

    def report(name, dt, fl, by):
        rows.append((name, dt * 1e3, fl / dt / 1e12, by / dt / 1e9,
                     fl / 1e9, by / 1e9))

    # 1. device-side image preprocess
    fn = lambda f, b, fl, k: T.av_frames_transform(f, b, fl, k, out=IMG)
    dt, fl, by = timed(fn, (frames_u8, boxes, flips, key), reps,
                       lambda o: float(o.sum()))
    report("preprocess(av_frames_transform)", dt, fl, by)

    # 2/3. per-modality encoder fwd (train-mode BN) — inference view
    for m, label_name in (("a", "audio fwd"), ("v", "visual fwd")):
        def fwd(p, b, m=m):
            feat = model.apply({"params": p, "batch_stats": bs}, b, m,
                               train=True, method=model.encode,
                               mutable=["batch_stats"])[0]
            return feat.astype(jnp.float32).sum()
        dt, fl, by = timed(fwd, (params, batch), reps, lambda o: float(o))
        report(label_name, dt, fl, by)

    # 4/5. per-modality fwd+bwd (grad wrt encoder+head params)
    for m, label_name in (("a", "audio fwd+bwd"), ("v", "visual fwd+bwd")):
        def loss_fn(p, b, m=m):
            logits, feat, _ = steps_lib._apply_encode_head(model, p, bs, b, m)
            return steps_lib.masked_ce(logits, b["label"], b["valid"])
        dt, fl, by = timed(lambda p, b, m=m: jax.grad(
            functools.partial(loss_fn, m=m))(p, b)["fusion_module"]["fc_out"]
            ["kernel"].astype(jnp.float32).sum(),
            (params, batch), reps, lambda o: float(o))
        report(label_name, dt, fl, by)

    # 6. full MLA step (preprocess fused in, like bench.py)
    mla_step = steps_lib.make_mla_train_step(model, cfg, opt_spec, len_dl=105)

    def full(state, f, b, fl, sp, lab, k):
        img = T.av_frames_transform(f, b, fl, k, out=IMG)
        bt = {"spec": sp, "image": img, "label": lab,
              "idx": jnp.arange(BATCH, dtype=jnp.int32),
              "valid": jnp.ones((BATCH,), jnp.float32)}
        return mla_step(state, bt, jnp.float32(1e-3), jnp.int32(0))

    dt, fl, by = timed(full, (state, frames_u8, boxes, flips, spec, label,
                              key), reps,
                       lambda o: float(o[1]["loss"]))
    report("FULL MLA step", dt, fl, by)

    print(f"\n{'component':35s} {'ms':>8s} {'TF/s':>7s} {'GB/s':>7s} "
          f"{'GFLOP':>8s} {'GB':>7s}")
    for name, ms, tfs, gbs, gf, gb in rows:
        print(f"{name:35s} {ms:8.2f} {tfs:7.1f} {gbs:7.1f} {gf:8.1f} {gb:7.2f}")


if __name__ == "__main__":
    main()
