"""On-chip bisection of the m3ae MLA train step (Food-101 config, batch 64).

The CREMA-D step sits at ~90% of its conv envelope (profile_step.py); this
asks the same question for the transformer path: the 248 ms m3ae step's
utilization vs the chip's measured matmul ceiling, and where the time goes
(text vs image encoder, fwd vs bwd, attention vs MLP).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/profile_m3ae.py [reps]
"""

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
from mla_tpu.models.classifiers import M3AEClassifier  # noqa: E402
from mla_tpu.train import optim, steps as steps_lib  # noqa: E402
from mla_tpu.train.state import create_train_state  # noqa: E402

B = 64


def timed(fn, args, reps, read):
    compiled = jax.jit(fn).lower(*args).compile()
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


def report(name, dt, fl, by):
    print(f"{name:34s} {dt * 1e3:8.2f} ms  {fl / 1e9:9.1f} GF  "
          f"{by / 1e9:7.2f} GB  {fl / dt / 1e12:6.1f} TF/s  "
          f"{by / dt / 1e9:6.0f} GB/s")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    batch = {
        "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
        "padding_mask": jnp.zeros((B, 256), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}
    cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                    train=True).validate()
    model = M3AEClassifier(n_classes=101, gs_flag=True, dtype=jnp.bfloat16)
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=512)

    def read_scalar(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    # 1. full MLA train step. Return a real updated-param leaf alongside the
    # loss: reading only the loss lets XLA DCE the entire optimizer update
    # (measured 93 ms vs the true 248 ms step — don't re-make that mistake).
    step = steps_lib.make_train_step(model, cfg, spec, len_dl=100)

    def full(s, b):
        new_state, metrics = step(s, b, jnp.float32(1e-3), jnp.int32(0),
                                  jnp.int32(0))
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        return metrics["loss"] + jnp.sum(leaf.astype(jnp.float32) * 0) \
            + leaf.astype(jnp.float32).reshape(-1)[0] * 1e-30

    dt, fl, by = timed(full, (state, batch), reps, read_scalar)
    report("full MLA step", dt, fl, by)

    # 2. per-modality fwd and fwd+bwd
    params, bs = state.params, state.batch_stats

    for m in ("a", "v"):
        def fwd(p, b, m=m):
            feat = model.apply({"params": p, "batch_stats": bs}, b, m,
                               train=True, method=model.encode,
                               mutable=["batch_stats"])[0]
            return jnp.sum(feat.astype(jnp.float32))

        dt, fl, by = timed(fwd, (params, batch), reps, read_scalar)
        report(f"encode[{m}] fwd", dt, fl, by)

        def fwdbwd(p, b, m=m):
            return jax.grad(lambda p_: fwd(p_, b, m))(p)[
                "mae_" + m]

        dt, fl, by = timed(
            lambda p, b, m=m: jax.tree_util.tree_leaves(fwdbwd(p, b, m))[0],
            (params, batch), reps,
            lambda o: float(jnp.asarray(o).reshape(-1)[0]))
        report(f"encode[{m}] fwd+bwd", dt, fl, by)

    # 3. chip matmul ceiling at the step's dominant shape (B*257 x 768 GEMMs)
    x = jnp.asarray(rng.standard_normal((B * 257, 768)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((768, 3072)), jnp.bfloat16)

    def chain(x, w):
        y = x
        for _ in range(8):
            y = jnp.dot(y, w, preferred_element_type=jnp.float32)[
                :, :768].astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    dt, fl, by = timed(chain, (x, w), reps, read_scalar)
    report("gemm chain (B*257,768)x(768,3072)", dt, fl, by)


if __name__ == "__main__":
    main()
