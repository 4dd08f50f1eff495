"""Chained-protocol anatomy of one M3AE block at the m3ae step shape
(B64 S257 C768 H12, bf16): where the HBM bytes go.

The m3ae MLA step is ~2x103 ms of encoder fwd+bwd at ~52-64 TF/s effective
but ~580 GB/s of HBM traffic (benchmarks/bisect_m3ae.py + profile_m3ae cost
analysis: 51.6 GB per fwd+bwd) — bandwidth-bound. This times the block and
its pieces and prints the compiled bytes-accessed per piece, to find the
traffic the math doesn't need (prime suspect: the (B,N,3,H,D)->(3,B,H,N,D)
transposes materialized around the Pallas attention custom call, which XLA
cannot fuse into it).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/block_anatomy.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from mla_tpu.models.layers import M3AEBlock, MultiHeadAttention  # noqa: E402
from mla_tpu.ops import attention as A  # noqa: E402

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
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    o = c(x, *args)
    _ = float(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = c(x, *args)
    _ = float(o)
    dt = (time.perf_counter() - t0) / reps / CHAIN
    by = cost.get("bytes accessed", 0.0) / CHAIN
    fl = cost.get("flops", 0.0) / CHAIN
    print(f"{name:38s} {dt * 1e3:7.3f} ms  {fl / 1e9:7.1f} GF "
          f"{by / 1e9:6.2f} GB  {fl / dt / 1e12:6.1f} TF/s "
          f"{by / dt / 1e9:5.0f} GB/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    mask = jnp.zeros((B, S), jnp.float32)

    block = M3AEBlock(C, H, dtype=jnp.bfloat16)
    bp = block.init(jax.random.PRNGKey(0), x, mask)["params"]

    chain_time("block fwd", lambda y: block.apply({"params": bp}, y, mask), x)
    chain_time("block fwd+bwd",
               lambda y: jax.grad(lambda z: jnp.sum(block.apply(
                   {"params": bp}, z, mask).astype(jnp.float32)))(y), x)

    mha = MultiHeadAttention(C, H, dtype=jnp.bfloat16)
    mp = mha.init(jax.random.PRNGKey(1), x, mask)["params"]
    chain_time("mha (qkv+attn+proj) fwd",
               lambda y: mha.apply({"params": mp}, y, mask), x)
    chain_time("mha fwd+bwd",
               lambda y: jax.grad(lambda z: jnp.sum(mha.apply(
                   {"params": mp}, z, mask).astype(jnp.float32)))(y), x)

    # pieces
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)), jnp.bfloat16)
    chain_time("qkv GEMM only", lambda y: jnp.dot(
        y.reshape(B * S, C), wqkv,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        .reshape(B, S, 3 * C)[:, :, :C], x)

    q = jnp.asarray(rng.standard_normal((B, H, S, C // H)), jnp.bfloat16)
    chain_time("attention kernel (B,H,S,D) in/out",
               lambda y: A.flash_attention(y, q, q, mask), q)

    qkv_f = jnp.asarray(rng.standard_normal((B, S, 3, H, C // H)),
                        jnp.bfloat16)
    chain_time("transpose (B,S,3,H,D)->(3,B,H,S,D)",
               lambda y: jax.lax.optimization_barrier(
                   jnp.transpose(y, (2, 0, 3, 1, 4))), qkv_f)

    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C)), jnp.bfloat16)

    def mlp(y):
        h = jnp.dot(y.reshape(B * S, C), w1,
                    preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
        return jnp.dot(h, w2,
                       preferred_element_type=jnp.float32).astype(
            jnp.bfloat16).reshape(B, S, C)
    chain_time("mlp (fc1+gelu+fc2)", mlp, x)

    # clean GEMM ceiling at the fc1/fc2 shape (bf16 in/out, no slices)
    def gemm2(y):
        h = jnp.dot(y.reshape(B * S, C), w1,
                    preferred_element_type=jnp.bfloat16)
        return jnp.dot(h, w2,
                       preferred_element_type=jnp.bfloat16).reshape(B, S, C)
    chain_time("GEMM pair ceiling (bf16 epilogue)", gemm2, x)

    # big-square sanity: the relay measured 181.7 TF/s here in round 2
    xs = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
    chain_time("8192^3 GEMM sanity",
               lambda y: jnp.dot(y, ws, preferred_element_type=jnp.bfloat16),
               xs)


if __name__ == "__main__":
    main()
