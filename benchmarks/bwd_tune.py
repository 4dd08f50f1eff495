"""Chain-timed A/B of the attention kernels vs XLA at a given shape.

Serial dependency chains inside ONE jit call — single-call timings on the
axon relay include a ~1.5 ms dispatch floor that swamps sub-ms kernels (that
artifact produced round-1's bogus "20x slower backward").

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bwd_tune.py [B H S D]
Defaults to the m3ae per-modality shape B64 H12 S257 D64 (bf16).
Measured history: BASELINE.md "Round-2 head-chunked attention kernels".
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from mla_tpu.ops import attention as A  # noqa: E402

CHAIN = 20


def chain(name, f, args, reps=5):
    def g(*a):
        y = a[0]
        for _ in range(CHAIN):
            y = f(y, *a[1:])
        return jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(y)[0]).astype(jnp.float32))
    c = jax.jit(g).lower(*args).compile()
    o = c(*args)
    _ = float(o)  # host read: block_until_ready is unreliable on the relay
    t0 = time.perf_counter()
    for _ in range(reps):
        o = c(*args)
    _ = float(o)
    print(f"{name:34s} {(time.perf_counter() - t0) / reps / CHAIN * 1e3:7.3f}"
          " ms/op", flush=True)


def main():
    B, H, S, D = (int(x) for x in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (64, 12, 257, 64)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k, v = q * 0.5, q * 0.3
    mask = jnp.zeros((B, S), jnp.float32)
    print(f"B{B} H{H} S{S} D{D} bf16")

    o = A.flash_attention(q, k, v, mask)
    r = A.attention_reference(q, k, v, mask)
    print("fwd err:", float(jnp.max(jnp.abs(
        o.astype(jnp.float32) - r.astype(jnp.float32)))))

    chain("pallas fwd (head-chunked)",
          lambda y, k_, v_: A.flash_attention(y, k_, v_, mask), (q, k, v))
    chain("xla fwd",
          lambda y, k_, v_: A.attention_reference(y, k_, v_, mask), (q, k, v))
    chain("pallas bwd (head-chunked)",
          lambda y, k_, v_: A.flash_attention_bwd(y, k_, v_, y, mask)[0],
          (q, k, v))
    chain("xla fwd+bwd (vjp)",
          lambda y, k_, v_: jax.vjp(
              lambda q_, k2, v2: A.attention_reference(q_, k2, v2, mask),
              y, k_, v_)[1](y)[0], (q, k, v))


if __name__ == "__main__":
    main()
