"""On-chip: Pallas width-window conv3x3 vs XLA's conv on ResNet-18's body.

Round-2 measured XLA at ~69.6 TF/s on the dominant 3x3/64ch/56^2 class
(BASELINE.md "XLA-conv envelope"); VERDICT r3 #3 asks for >=85 TF/s from a
direct Pallas kernel or a rigorous negative result. Shapes are the CREMA-D
flagship's stride-1 3x3 convs (visual 192=64x3 folded frames; audio 64 at
33x157 after the 129x626 stem).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_conv.py \
           [fwd|grad] [shape,shape,...]   (default fwd, all shapes)
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mla_tpu.ops.conv3x3 import (  # noqa: E402
    conv3x3, conv3x3_reference, conv3x3_vjp, flops)

SHAPES = {  # name: (B, H, W, C) — stride-1 3x3, C==F
    "vis_l1": (192, 56, 56, 64),
    "vis_l2": (192, 28, 28, 128),
    "vis_l3": (192, 14, 14, 256),
    "vis_l4": (192, 7, 7, 512),
    "aud_l1": (64, 33, 157, 64),
    "aud_l2": (64, 17, 79, 128),
}


def _read(out):
    """Force a host read (block_until_ready is unreliable on axon)."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


CHAIN = 20  # dependent applications inside ONE jit — the chained protocol
#             (BASELINE measurement notes): per-dispatch relay overhead
#             (~1.5-3 ms) would otherwise swamp sub-ms device kernels.


def chain(one, n=CHAIN):
    """y_{i+1} = one(y_i, k): data-dependent, so XLA can't overlap or elide
    iterations; C==F keeps shapes fixed. Normalized kernels keep values
    sane over the chain."""
    def f(x, k):
        def body(i, y):
            return one(y, k)
        return jax.lax.fori_loop(0, n, body, x)
    return jax.jit(f)


def timeit(fn, *args, reps=3):
    _read(fn(*args))                      # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _read(out)
    ms_call = (time.perf_counter() - t0) / reps * 1e3
    return ms_call / CHAIN


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(SHAPES)
    rng = np.random.default_rng(0)
    for name, (b, h, w, c) in SHAPES.items():
        if name not in only:
            continue
        # bf16 in/out — the flagship train step's compute dtype (the round-2
        # 69.6 TF/s XLA envelope row was measured bf16; an fp32 harness
        # under-reads XLA ~3x and makes the comparison meaningless)
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) / np.sqrt(9 * c),
                        jnp.bfloat16)
        gf = flops(b, h, w, c, c) / 1e9
        # record the measurement basis: round-2 envelope rows were fp32,
        # round-4+ rows are bf16 — incomparable under the same label
        row = {"shape": name, "BHWC": (b, h, w, c), "gflop": round(gf, 1),
               "dtype": "bf16"}
        if mode == "fwd":
            f_xla = chain(conv3x3_reference)
            f_flat = chain(lambda x, k: conv3x3(x, k, flatten=True))
            f_loop = chain(lambda x, k: conv3x3(x, k, flatten=False))
            ms_x = timeit(f_xla, x, k)
            err = float(jnp.max(jnp.abs(
                jax.jit(lambda x, k: conv3x3(x, k))(x, k)
                - jax.jit(conv3x3_reference)(x, k))))
            ms_f = timeit(f_flat, x, k)
            ms_l = timeit(f_loop, x, k)
            row.update({
                "xla_ms": round(ms_x, 3), "xla_tfs": round(gf / ms_x, 1),
                "flat_ms": round(ms_f, 3), "flat_tfs": round(gf / ms_f, 1),
                "loop_ms": round(ms_l, 3), "loop_tfs": round(gf / ms_l, 1),
                "maxerr": err})
        else:  # grad: fwd+dx+dw through the custom vjp vs XLA end-to-end
            def loss_p(x, k):
                return jnp.sum(conv3x3_vjp(x, k) ** 2)

            def loss_x(x, k):
                return jnp.sum(conv3x3_reference(x, k) ** 2)

            def chain_grad(loss):
                g = jax.grad(loss, (0, 1))

                def f(x, k):
                    def body(i, xc):
                        dx, _ = g(xc, k)
                        # renormalize so 20 chained grads stay finite
                        return dx / jnp.maximum(
                            jnp.max(jnp.abs(dx)), 1e-12)
                    return jax.lax.fori_loop(0, CHAIN, body, x)
                return jax.jit(f)
            ms_p = timeit(chain_grad(loss_p), x, k)
            ms_x = timeit(chain_grad(loss_x), x, k)
            # fwd+dx+dw ~ 3x fwd FLOPs
            row.update({"xla_grad_ms": round(ms_x, 3),
                        "pallas_grad_ms": round(ms_p, 3),
                        "xla_grad_tfs": round(3 * gf / ms_x, 1),
                        "pallas_grad_tfs": round(3 * gf / ms_p, 1)})
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
