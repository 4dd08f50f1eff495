"""Runtime/compile trade of --scan_blocks --scan_unroll N on the m3ae MLA
step (VERDICT r2 #8: unroll>1 was the untried formulation).

For each unroll factor: cold-ish compile wall time (persistent cache
disabled for the step so the number is honest) + chained step time,
against the unrolled-stack reference (165.9 ms).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_scan_unroll.py [factors...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mla_tpu.core.config import MLAConfig
from mla_tpu.models.classifiers import M3AEClassifier
from mla_tpu.train import optim, steps as steps_lib
from mla_tpu.train.state import create_train_state

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


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 6]
    batch = make_batch()
    for u in factors:
        cfg = MLAConfig(dataset="Food101", lorb="m3ae", gs_flag=True,
                        train=True, scan_blocks=True,
                        scan_unroll=u).validate()
        model = M3AEClassifier(n_classes=101, gs_flag=True,
                               scan_blocks=True, scan_unroll=u,
                               dtype=jnp.bfloat16)
        spec = optim.make_spec(cfg)
        state = create_train_state(model, cfg, batch, spec, n_data=512)
        step = jax.jit(steps_lib.make_train_step(model, cfg, spec,
                                                 len_dl=100),
                       donate_argnums=0)
        t0 = time.perf_counter()
        state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(0),
                        jnp.int32(0))
        _ = float(m["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(10):
            state, m = step(state, batch, jnp.float32(1e-3), jnp.int32(i),
                            jnp.int32(0))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 10
        print(f"scan_unroll={u}: compile {compile_s:6.1f} s   "
              f"step {dt * 1e3:7.2f} ms   "
              f"({64 / dt:5.0f} clips/s)", flush=True)
        del state, step


if __name__ == "__main__":
    main()
