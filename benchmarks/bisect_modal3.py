"""Chained-protocol bisection of the IEMOCAP modal3 MLA train step
(CAV-MAE audio S=512 + M3AE visual S=257 + M3AE text S=256, bf16, B=64):
which modality owns the 380 ms.

Same protocol as bisect_m3ae.py: full = fixed + A + V + T, substep-only
steps recover the shared fixed overhead, encoder-only grad chains split
each substep into encoder work vs head+GS+optimizer.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bisect_modal3.py
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from mla_tpu.core.config import MLAConfig  # noqa: E402
from mla_tpu.models.classifiers import Modal3Classifier  # noqa: E402
from mla_tpu.train import optim, steps as steps_lib  # noqa: E402
from mla_tpu.train.state import create_train_state  # noqa: E402
from bisect_m3ae import time_step, time_encoder_grad_chain  # noqa: E402

B = 64


def make_batch():
    rng = np.random.default_rng(0)
    return {
        "token": jnp.asarray(rng.integers(0, 30522, (B, 256)), jnp.int32),
        "padding_mask": jnp.zeros((B, 256), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((B, 3, 256, 256)),
                             jnp.float32),
        "fbank": jnp.asarray(rng.standard_normal((B, 1024, 128)),
                             jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), jnp.float32)}


def main():
    batch = make_batch()
    cfg = MLAConfig(dataset="IEMOCAP", lorb="m3ae", modal3=True,
                    gs_flag=True, train=True).validate()
    model = Modal3Classifier(n_classes=4, gs_flag=True, dtype=jnp.bfloat16)

    full = time_step("full MLA step (a+v+t)", cfg, model, batch)
    subs = {}
    for m in ("a", "v", "t"):
        subs[m] = time_step(f"{m}-substep only", cfg, model, batch,
                            modalities=(m,))
    fixed = (sum(subs.values()) - full) / 2
    print(f"{'=> per-substep fixed overhead':42s} {fixed * 1e3:8.2f} ms")

    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, batch, spec, n_data=512)
    for m, tag in (("a", "CAV-MAE S512"), ("v", "M3AE img S257"),
                   ("t", "M3AE txt S256")):
        enc = time_encoder_grad_chain(
            f"encoder[{m}] fwd+bwd ({tag})", model, state.params,
            state.batch_stats, batch, m)
        print(f"{f'=> {m}-substep minus encoder[{m}]':42s} "
              f"{(subs[m] - fixed - enc) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
