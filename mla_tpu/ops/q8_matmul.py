"""Dequant-fused int8 GEMM: x @ (q8 * scale) with int8 streamed from HBM.

The --export_dtype int8 serving artifact stores the big kernels as symmetric
per-output-channel int8 (runtime/export.py:_quantize_int8) and dequantizes
in-graph. Measured on-chip (BASELINE.md int8 analysis): XLA materializes the
dequantized bf16 tree instead of fusing the convert×scale into the dot
operand read, so per-weight HBM traffic is ~5 bytes (s8 read + bf16 write +
bf16 read) vs bf16's flat 2 — huge b=1 serving is 15.8 ms vs bf16's 8.8.

This kernel closes that gap: the int8 weight tile is converted to bf16 *in
VMEM* and fed straight into the MXU, so exactly 1 byte/weight crosses HBM.
For the weight-read-bound b<=16 serving regime that is the whole story —
projected huge b=1 ~4 ms (1.34 GB at HBM rate + activations).

Numerics: the export-time law is per-output-channel, so the scale commutes
through the contraction exactly — (x @ (W*s))[b,n] == (x @ W)[b,n] * s[n].
The kernel accumulates the int8-derived dot in fp32 and applies the scale
ONCE per output tile after accumulation, which is strictly more accurate
than the XLA path's pre-scaled bf16 weights (pinned vs both references in
tests/test_q8_matmul.py).

Dispatch mirrors ops/fused_block.py: Pallas on TPU when shapes tile;
otherwise the jnp reference (bit-equal to what the exported graph does
today). Standalone op for now — wiring it under the int8 artifact's Dense
sites is the integration step (TODO round-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def q8_matmul_reference(x, q8, scale, dtype=jnp.bfloat16):
    """What the exported int8 graph computes today: dequantize to bf16
    (export.dequantize_int8), then the module-dtype dot (nn.Dense)."""
    w = q8.astype(dtype) * scale.astype(dtype)
    return jnp.dot(x.astype(dtype), w)


def _pick_block(dim: int, want: int) -> int:
    """Largest power-of-two block <= want that divides dim (>= 128 for the
    lane axis); 0 if none — caller falls back to the reference path."""
    b = want
    while b >= 128:
        if dim % b == 0:
            return b
        b //= 2
    return 0


def _kernel(x_ref, w_ref, s_ref, o_ref, acc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...].astype(jnp.bfloat16)
    acc[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _flush():
        o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def _q8_matmul_pallas(x, q8, scale, block_n, block_k, interpret):
    b, kdim = x.shape
    _, n = q8.shape
    rows = max(8, -(-b // 8) * 8)  # sublane-align the (tiny) row axis
    xp = jnp.zeros((rows, kdim), jnp.bfloat16).at[:b].set(
        x.astype(jnp.bfloat16))
    grid = (n // block_n, kdim // block_k)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, block_k), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, block_n), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, block_n), jnp.float32)],
        interpret=interpret,
    )(xp, q8, scale)
    return out[:b]


def q8_matmul(x, q8, scale, *, block_n: int = 512, block_k: int = 512,
              interpret: bool = False):
    """x (B, K) float -> (B, N) bf16 via the int8 weight (K, N) and its
    per-output-channel scale ((1, N) or (N,)).

    Pallas when K and N tile to (block_k, block_n) (halving blocks down to
    128 as needed); jnp reference otherwise. interpret=True runs the kernel
    in Pallas interpret mode (CPU test tier)."""
    if x.ndim != 2 or q8.ndim != 2:
        raise ValueError(f"q8_matmul takes 2-D operands, got x{x.shape} "
                         f"w{q8.shape}")
    scale = scale.reshape(1, -1)
    if scale.shape[1] != q8.shape[1]:
        raise ValueError(f"scale {scale.shape} is not per-output-channel "
                         f"for w{q8.shape}")
    bn = _pick_block(q8.shape[1], block_n)
    bk = _pick_block(q8.shape[0], block_k)
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not (on_tpu and bn and bk):
        return q8_matmul_reference(x, q8, scale)
    return _q8_matmul_pallas(x, q8, scale, bn, bk, interpret)
