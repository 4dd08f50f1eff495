"""Chained-protocol bisection of the m3ae MLA train step (VERDICT r2 weak #1).

All timings chain donated steps (or grad-chains) so the axon relay's
dispatch floor and its independent-dispatch overlap artifact cancel out —
profile_m3ae.py's independent-dispatch numbers under-read the step by ~2x
(109 vs 214 ms chained) and are kept only for FLOP counts.

Decomposition: full = fixed + A + V, a_only = fixed + A, v_only = fixed + V
=> fixed = a_only + v_only - full. Encoder-only fwd+bwd grad-chains then
split each substep into encoder work vs (optimizer sweep + GS + head).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bisect_m3ae.py
"""

import time

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


def make_batch():
    rng = np.random.default_rng(0)
    return {
        "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
        "padding_mask": jnp.zeros((B, 256), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 101, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}


def time_step(name, cfg, model, batch, modalities=None, n=10):
    """Chained donated-step timing; optionally restrict the MLA substeps."""
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=512)
    if modalities is not None:
        orig = steps_lib.modalities_of
        steps_lib.modalities_of = lambda c: modalities
        try:
            raw = steps_lib.make_mla_train_step(model, cfg, spec, len_dl=100)
        finally:
            steps_lib.modalities_of = orig

        def wrapped(s, b, lr, bi, ep):   # metrics dict lacks loss_v sometimes
            s2, m = raw(s, b, lr, bi, ep)
            return s2, {"loss": m["loss"]}
        step = jax.jit(wrapped, donate_argnums=0)
    else:
        step = jax.jit(steps_lib.make_train_step(model, cfg, spec,
                                                 len_dl=100),
                       donate_argnums=0)
    state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(0),
                    jnp.int32(0))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i),
                        jnp.int32(0))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def time_encoder_grad_chain(name, model, params, bs, batch, modality,
                            chain=6, reps=5):
    """fwd+bwd of ONE encoder, serially chained through a param perturbation
    (the 1e-30-scaled grad-sum feedback keeps XLA from CSEing iterations)."""
    label, valid = batch["label"], batch["valid"]

    def loss_fn(p):
        logits, feat, _ = steps_lib._apply_encode_head(model, p, bs, batch,
                                                       modality)
        return steps_lib.masked_ce(logits, label, valid)

    def g(p):
        acc = jnp.float32(0.0)
        for _ in range(chain):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            gsum = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in jax.tree_util.tree_leaves(grads))
            acc = acc + loss + gsum * 1e-30
            enc = "mae_" + modality          # mae_a / mae_v / mae_t
            k0 = jax.tree_util.tree_leaves(p[enc])[0]
            p = {**p, enc: jax.tree_util.tree_map(
                lambda x: x + acc.astype(x.dtype) * 1e-30, p[enc])}
        return acc

    c = jax.jit(g).lower(params).compile()
    o = c(params)
    _ = float(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = c(params)
    _ = float(o)
    dt = (time.perf_counter() - t0) / reps / chain
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    batch = make_batch()
    cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                    train=True).validate()
    model = M3AEClassifier(n_classes=101, gs_flag=True, dtype=jnp.bfloat16)

    full = time_step("full MLA step (a+v)", cfg, model, batch)
    a_only = time_step("a-substep only", cfg, model, batch,
                       modalities=("a",))
    v_only = time_step("v-substep only", cfg, model, batch,
                       modalities=("v",))
    fixed = a_only + v_only - full
    print(f"{'=> per-substep fixed overhead':42s} {fixed * 1e3:8.2f} ms")

    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=512)
    ea = time_encoder_grad_chain("encoder[a] fwd+bwd (grad chain)", model,
                                 state.params, state.batch_stats, batch, "a")
    ev = time_encoder_grad_chain("encoder[v] fwd+bwd (grad chain)", model,
                                 state.params, state.batch_stats, batch, "v")
    print(f"{'=> a-substep minus encoder[a]':42s} "
          f"{(a_only - fixed - ea) * 1e3:8.2f} ms (opt sweep + GS + misc)")
    print(f"{'=> v-substep minus encoder[v]':42s} "
          f"{(v_only - fixed - ev) * 1e3:8.2f} ms")

def main_b128():
    """Batch-128 economics with the flat kernels (round-2: worse per-clip).
    Standalone (--b128): the full-bisection process has too many live
    executables for the B=128 step to also fit HBM."""
    batch = make_batch()
    cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                    train=True).validate()
    model = M3AEClassifier(n_classes=101, gs_flag=True, dtype=jnp.bfloat16)
    b2 = {k: jnp.concatenate([v, v], axis=0) for k, v in batch.items()}
    b2["idx"] = jnp.arange(2 * B, dtype=jnp.int32)
    time_step("full MLA step, batch 128", cfg, model, b2)


if __name__ == "__main__":
    import sys
    main_b128() if "--b128" in sys.argv else main()
