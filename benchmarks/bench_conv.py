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


def timeit(fn, *args, reps=20):
    _read(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _read(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(SHAPES)
    rng = np.random.default_rng(0)
    for name, (b, h, w, c) in SHAPES.items():
        if name not in only:
            continue
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) / np.sqrt(9 * c),
                        jnp.float32)
        gf = flops(b, h, w, c, c) / 1e9
        row = {"shape": name, "BHWC": (b, h, w, c), "gflop": round(gf, 1)}
        if mode == "fwd":
            f_xla = jax.jit(conv3x3_reference)
            f_flat = jax.jit(lambda x, k: conv3x3(x, k, flatten=True))
            f_loop = jax.jit(lambda x, k: conv3x3(x, k, flatten=False))
            ms_x = timeit(f_xla, x, k)
            err = float(jnp.max(jnp.abs(f_flat(x, k) - f_xla(x, k))))
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
            g_p = jax.jit(jax.grad(loss_p, (0, 1)))
            g_x = jax.jit(jax.grad(loss_x, (0, 1)))
            ms_p = timeit(g_p, x, k)
            ms_x = timeit(g_x, x, k)
            # fwd+dx+dw ~ 3x fwd FLOPs
            row.update({"xla_grad_ms": round(ms_x, 3),
                        "pallas_grad_ms": round(ms_p, 3),
                        "xla_grad_tfs": round(3 * gf / ms_x, 1),
                        "pallas_grad_tfs": round(3 * gf / ms_p, 1)})
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
