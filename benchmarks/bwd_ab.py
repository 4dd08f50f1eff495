"""A/B the m3ae train step: hybrid VJP (XLA fwd+bwd under grad, default) vs
full-Pallas VJP (Pallas fwd + Pallas bwd, set_pallas_backward(True)).

Run from the repo root: PYTHONPATH=... python benchmarks/bwd_ab.py
"""

import numpy as np

from benchmarks.bench_suite import bench_config


def main():
    import jax.numpy as jnp
    from mla_tpu.core.config import MLAConfig
    from mla_tpu.models.classifiers import M3AEClassifier
    from mla_tpu.ops import attention

    rng = np.random.default_rng(0)
    B = 64
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

    # False = force XLA bwd, True = force Pallas bwd, None = shape policy
    # (ABA-style ordering to bound relay drift)
    for use_pallas in (False, True, None):
        attention.set_pallas_backward(use_pallas)
        name = {False: "hybrid", True: "pallas", None: "auto"}[use_pallas]
        r = bench_config(
            f"m3ae_mla_{name}_bwd", cfg,
            M3AEClassifier(n_classes=101, gs_flag=True, dtype=jnp.bfloat16),
            batch)
        print(r)
    attention.set_pallas_backward(None)


if __name__ == "__main__":
    main()
