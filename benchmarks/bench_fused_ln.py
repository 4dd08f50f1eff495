"""Chained-protocol A/B of the fused LN+Dense kernels (ops/fused_block.py)
at the m3ae block shape (B64 S257 C768, bf16): op-level LN+GEMM fwd and
fwd+bwd, Pallas-fused vs the XLA reference composition.

Measured result (v5e, 2026-08): XLA runs LN+GEMM at ~the bare-GEMM rate
(1.084 ms qkv fwd vs 1.16 fused; 0.80 vs 1.11 fwd+bwd) — its loop fusion
hides the fp32 stats pass behind the MXU, so the Pallas composition loses
and ships default-off (documented negative result; see ops/fused_block.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_fused_ln.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from mla_tpu.ops import fused_block as fb  # noqa: E402

B, S, C, H = 64, 257, 768, 12
CHAIN = 8


def chain_time(name, f, x, *args, reps=5):
    def g(x, *a):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            y = f(x, *a)
            s = jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32))
            acc = acc + s
            x = x + (acc * 1e-30).astype(x.dtype)
        return acc
    c = jax.jit(g).lower(x, *args).compile()
    o = c(x, *args)
    _ = float(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = c(x, *args)
    _ = float(o)
    dt = (time.perf_counter() - t0) / reps / CHAIN
    print(f"{name:46s} {dt * 1e3:7.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((B * S, C)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    for f_out, tag in ((3 * C, "qkv"), (4 * C, "fc1")):
        w = jnp.asarray(rng.standard_normal((C, f_out)) * 0.02, jnp.float32)
        dbias = jnp.zeros((f_out,), jnp.float32)

        def ref(y, w=w, dbias=dbias):
            return fb._ln_dense_ref(y, scale, bias, w, dbias, 1e-5,
                                    jnp.bfloat16)

        def fused(y, w=w, dbias=dbias):
            return fb._ln_dense_fused(y, scale, bias, w, dbias, 1e-5,
                                      jnp.dtype(jnp.bfloat16))

        chain_time(f"LN+{tag} XLA fwd", ref, x2)
        chain_time(f"LN+{tag} fused fwd", fused, x2)

        def bwd(fn):
            return jax.grad(lambda y: jnp.sum(fn(y).astype(jnp.float32)))
        chain_time(f"LN+{tag} XLA fwd+bwd", bwd(ref), x2)
        chain_time(f"LN+{tag} fused fwd+bwd", bwd(fused), x2)


if __name__ == "__main__":
    main()
