"""On-chip: dequant-fused int8 GEMM vs the XLA dequant path vs bf16 dot.

Shapes are the huge config's per-block GEMMs (emb 2560, mlp 4x — the
weight-read-bound b<=16 serving regime where BASELINE.md measured the
in-graph int8 dequant LOSING to bf16 weights). The question this bench
answers: does streaming int8 straight into the MXU tile loop (ops/
q8_matmul.py) beat both?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_q8.py \
           [B] [gemm,gemm,...]   (default: all four huge GEMM stacks)
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mla_tpu.ops.q8_matmul import (  # noqa: E402
    q8_matmul, q8_matmul_reference, q8_matmul_stacked)

HUGE_GEMMS = {  # models/m3ae.py huge size table: emb 1280, mlp_ratio 4
    "qkv": (1280, 3840),
    "proj": (1280, 1280),
    "fc1": (1280, 5120),
    "fc2": (5120, 1280),
}


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # block (relay-safe host read)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e3


L = 32  # huge depth: one scan dispatch streams all 32 layers' weights,
        # amortizing the per-dispatch relay overhead that swamps a single
        # b=1 GEMM (~1.5-2 ms/dispatch measured) — and mirroring how the
        # scan-blocks serving graph actually consumes the stacked weights.


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(HUGE_GEMMS)
    rng = np.random.default_rng(0)
    rows = []
    for name, (k, n) in HUGE_GEMMS.items():
        if name not in only:
            continue
        x = jnp.asarray(rng.normal(size=(b, k)), jnp.bfloat16)
        w = (rng.normal(size=(L, k, n)) / np.sqrt(k)).astype(np.float32)
        amax = np.max(np.abs(w), axis=1, keepdims=True)
        scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
        q8 = jnp.asarray(np.clip(np.round(w / scale), -127, 127), jnp.int8)
        scale = jnp.asarray(scale)
        wbf = jnp.asarray(w, jnp.bfloat16)
        del w

        def scan_sum(per_layer):
            def f(x, *stacked):
                def body(acc, ws):
                    return acc + per_layer(x, *ws).astype(jnp.float32), None
                y0 = jnp.zeros((x.shape[0], stacked[0].shape[-1]),
                               jnp.float32)
                return jax.lax.scan(body, y0, stacked)[0]
            return jax.jit(f)

        f_pallas = scan_sum(lambda x, q, s: q8_matmul(x, q, s))
        f_xla = scan_sum(lambda x, q, s: q8_matmul_reference(x, q, s))
        f_bf16 = scan_sum(lambda x, w: jnp.dot(x, w))

        # stacked-prefetch: the scan body indexes the FULL (L,K,N) stack by
        # layer id through Pallas scalar prefetch — no per-layer HBM->HBM
        # slice copy (the tax the f_pallas leg pays when lax.scan feeds a
        # sliced operand to a custom call).
        @jax.jit
        def f_stacked(x, q8, scale):
            def body(acc, li):
                return acc + q8_matmul_stacked(
                    x, q8, scale, li).astype(jnp.float32), None
            y0 = jnp.zeros((x.shape[0], q8.shape[-1]), jnp.float32)
            return jax.lax.scan(body, y0, jnp.arange(q8.shape[0]))[0]

        ms_p = timeit(f_pallas, x, q8, scale)
        ms_s = timeit(f_stacked, x, q8, scale)
        ms_x = timeit(f_xla, x, q8, scale)
        ms_b = timeit(f_bf16, x, wbf)
        gbs = q8.size / ms_s / 1e6  # int8 bytes over scan time
        rows.append({"gemm": name, "K": k, "N": n, "B": b, "layers": L,
                     "pallas_q8_ms": round(ms_p, 4),
                     "stacked_q8_ms": round(ms_s, 4),
                     "xla_dequant_ms": round(ms_x, 4),
                     "bf16_dot_ms": round(ms_b, 4),
                     "stacked_weight_GBps": round(gbs, 1),
                     "vs_xla": round(ms_x / ms_s, 2),
                     "vs_bf16": round(ms_b / ms_s, 2)})
        print(json.dumps(rows[-1]), flush=True)
    tot = {k: round(sum(r[k] for r in rows), 3)
           for k in ("pallas_q8_ms", "stacked_q8_ms", "xla_dequant_ms",
                     "bf16_dot_ms")}
    tot["note"] = ("sum over the huge config's 4 GEMM stacks x32 layers "
                   "= the weight streaming of one serving forward")
    print(json.dumps(tot))


if __name__ == "__main__":
    main()
