"""Dequant-fused int8 GEMM: x @ (q8 * scale) with int8 streamed from HBM.

The --export_dtype int8 serving artifact stores the big kernels as symmetric
per-output-channel int8 (runtime/export.py:_quantize_int8) and round-3
dequantized them in-graph. Measured on-chip (BASELINE.md int8 analysis): XLA
materializes the dequantized bf16 tree instead of fusing the convert×scale
into the dot operand read, so per-weight HBM traffic is ~5 bytes (s8 read +
bf16 write + bf16 read) vs bf16's flat 2 — huge b=1 serving was 15.8 ms vs
bf16's 8.8.

This kernel closes that gap: the int8 weight tile is converted to bf16 *in
VMEM* and fed straight into the MXU, so exactly 1 byte/weight crosses HBM
when the row count fits one row-block (the whole b<=16 serving regime). For
larger batches the grid row-blocks and the weight matrix is re-read
ceil(rows/block_m) times — by then the GEMM is compute-bound and the extra
int8 traffic is noise.

Block choice is step-count-first: at serving row counts the per-grid-step
dispatch overhead (~1 us) dominates long before HBM does, so the chooser
takes the FEWEST grid steps whose blocks fit a VMEM budget — typically the
whole K dimension and 1-3 MB weight tiles (measured on v5e: 256x256 blocks
ran 32-layer huge qkv at 64 GB/s of weight traffic; see the BASELINE.md
"Round-4/5" int8 ladder for the measured numbers).

Numerics: the export-time law is per-output-channel, so the scale commutes
through the contraction exactly — (x @ (W*s))[b,n] == (x @ W)[b,n] * s[n].
The kernel accumulates the int8-derived dot in fp32 and applies the scale
ONCE per output tile after accumulation, which is strictly more accurate
than the XLA path's pre-scaled bf16 weights (pinned vs both references in
tests/test_q8_matmul.py).

Dispatch mirrors ops/fused_block.py: Pallas on TPU when shapes tile;
otherwise the jnp reference (bit-equal to what the round-3 exported graph
did). Consumed by models/layers.py:QDense — the serving graph's Dense sites
route here whenever their restored kernel is int8 (runtime/export.py
split_q8 puts it there). Forward-only: serving artifacts never
differentiate (no custom VJP — differentiating the Pallas path raises).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def q8_matmul_reference(x, q8, scale, dtype=jnp.bfloat16):
    """What the round-3 exported int8 graph computed: dequantize to bf16
    (export.dequantize_int8), then the module-dtype dot (nn.Dense)."""
    w = q8.astype(dtype) * scale.astype(dtype)
    return jnp.dot(x.astype(dtype), w)


def quantize_rows(x):
    """Symmetric per-row dynamic int8 activation quantization (the A8 side
    of W8A8 serving): (rows, K) float -> ((rows, K) int8, (rows,) f32)."""
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs[:, None]),
                  -127, 127).astype(jnp.int8)
    return xq, xs


def q8_matmul_a8_reference(x, q8, scale):
    """jnp W8A8 law (fallback + test oracle): int32 exact accumulation of
    the s8 x s8 dot, then row x column scales in fp32."""
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(xq, q8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale.reshape(1, -1) * xs[:, None]
    return out.astype(jnp.bfloat16)


def _divisors_desc(dim: int, cap: int, mult: int = 128):
    """Divisors of ``dim`` that are multiples of ``mult`` (lane/sublane
    tiling), <= cap, descending. Empty -> caller falls back to jnp."""
    out = []
    d = (min(dim, cap) // mult) * mult
    while d >= mult:
        if dim % d == 0:
            out.append(d)
        d -= mult
    return out


# VMEM budget for one grid step's working set (double-buffered x/w blocks,
# fp32 accumulator, bf16 output block). v5e has 16 MB more is headroom for
# Mosaic's own scratch.
_VMEM_BUDGET = 10 * 2 ** 20

# Trace-time switch (runtime/export.py calibrate_a8): force the jnp
# reference paths so the serving graph can execute on the CPU backend —
# the A8 calibration forward runs there because the axon TPU relay does
# not support the jax.debug.callback the error probe rides on.
_REFERENCE_ONLY = False


def set_reference_only(enabled: bool):
    global _REFERENCE_ONLY
    _REFERENCE_ONLY = bool(enabled)


# Row-count crossover (in units of block_m row blocks) between the Pallas
# int8 GEMM and the dequantize-then-XLA-dot alternative. The Pallas path
# re-reads the weight once per row block (ceil(rows/block_m) bytes/weight);
# XLA's materialized dequant pays a flat ~5 bytes/weight (s8 read + bf16
# write + bf16 read — BASELINE.md int8 analysis). Measured anchors (huge
# serving artifact, v5e): rows<=512 (b=1, one pass) Pallas wins 11.75->9.99
# ms vs dequant's 15.8; rows=4112 (b=16, 9 passes) Pallas loses 116.2-116.5
# vs the dequant graph's ~104. Four passes keeps the Pallas path strictly
# under the dequant traffic; beyond it the GEMM routes to the reference
# (static per traced batch rung — serving graphs pick per-rung).
_ROWS_CROSSOVER_BLOCKS = 4


def _choose_blocks(rows: int, k: int, n: int, cap_m: int, cap_k: int,
                   cap_n: int, row_mult: int = 16):
    """(bm, bk, bn) minimizing grid steps subject to the VMEM budget;
    None when K or N has no 128-multiple divisor (fallback path).
    row_mult: sublane tile of the activation dtype (16 bf16, 32 int8)."""
    bm = min(-(-rows // row_mult) * row_mult, cap_m)
    best = None
    for bk in _divisors_desc(k, cap_k):
        for bn in _divisors_desc(n, cap_n):
            vmem = 2 * (bm * bk * 2) + 2 * (bk * bn) + bm * bn * 6
            if vmem > _VMEM_BUDGET:
                continue
            steps = (k // bk) * (n // bn)
            key = (steps, -(bk * bn))
            if best is None or key < best[0]:
                best = (key, (bm, bk, bn))
    return best[1] if best else None


def _kernel(x_ref, w_ref, s_ref, o_ref, acc):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    # feed the s8 operand to the MXU directly (Mosaic lowers the mixed
    # bf16 x s8 dot natively) — the explicit VPU convert-to-bf16 cost ~13%
    # end-to-end on the huge b=1 artifact (BASELINE.md "Round-4/5" int8 section)
    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def _kernel_a8(x_ref, w_ref, s_ref, o_ref, acc):
    """W8A8: s8 x s8 into the MXU at the int8 rate, exact int32 accumulate;
    the per-output-channel weight scale applies at flush (the per-row
    activation scale is applied by the caller — XLA fuses it into the
    output's first consumer)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = (acc[...].astype(jnp.float32)
                      * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret", "a8"))
def _q8_matmul_pallas(x, q8, scale, bm, bn, bk, interpret, a8=False):
    b, kdim = x.shape
    _, n = q8.shape
    rows = -(-b // bm) * bm  # sublane-aligned: bm is a multiple of 16 (bf16)
    #                          or 32 (int8 activations)
    if a8:
        xq, xs = quantize_rows(x)
        xp = jnp.zeros((rows, kdim), jnp.int8).at[:b].set(xq)
    else:
        xp = jnp.zeros((rows, kdim), jnp.bfloat16).at[:b].set(
            x.astype(jnp.bfloat16))
    grid = (rows // bm, n // bn, kdim // bk)
    out = pl.pallas_call(
        _kernel_a8 if a8 else _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn),
                                   jnp.int32 if a8 else jnp.float32)],
        interpret=interpret,
    )(xp, q8, scale)
    if a8:
        return (out[:b].astype(jnp.float32) * xs[:, None]
                ).astype(jnp.bfloat16)
    return out[:b]


def _kernel_stacked(l_ref, x_ref, w_ref, s_ref, o_ref, acc):
    """Same math as _kernel; the weight/scale blocks arrive with a leading
    singleton layer axis selected by the scalar-prefetched layer id."""
    del l_ref  # consumed by the index maps only
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = (acc[...] * s_ref[0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def _kernel_stacked_a8(l_ref, x_ref, w_ref, s_ref, o_ref, acc):
    """W8A8 stacked: s8 x s8 into the MXU at the int8 rate with the weight
    stack read in place via scalar prefetch; exact int32 accumulation. The
    per-(layer, out-channel) weight scale applies at flush; the per-row
    activation scale is applied by the caller (XLA fuses it into the
    output's first consumer)."""
    del l_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = (acc[...].astype(jnp.float32)
                      * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret", "a8"))
def _q8_stacked_pallas(x, q8, scale, layer, bm, bn, bk, interpret,
                       a8=False):
    b, kdim = x.shape
    _, _, n = q8.shape
    rows = -(-b // bm) * bm
    if a8:
        xq, xs = quantize_rows(x)
        xp = jnp.zeros((rows, kdim), jnp.int8).at[:b].set(xq)
    else:
        xp = jnp.zeros((rows, kdim), jnp.bfloat16).at[:b].set(
            x.astype(jnp.bfloat16))
    grid = (rows // bm, n // bn, kdim // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((1, bk, bn), lambda i, j, k, l: (l[0], k, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn),
                                   jnp.int32 if a8 else jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel_stacked_a8 if a8 else _kernel_stacked,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xp, q8, scale)
    if a8:
        return (out[:b].astype(jnp.float32) * xs[:, None]
                ).astype(jnp.bfloat16)
    return out[:b]


def q8_matmul_stacked(x, q8, scale, layer, *, block_m: int = 512,
                      block_n: int = 2048, block_k: int = 2048,
                      interpret: bool = False, a8: bool = False):
    """Layer ``layer`` of a stacked int8 GEMM: x @ (q8[layer] * scale[layer]).

    q8 is the FULL (L, K, N) int8 stack living in HBM; the traced layer id
    rides Pallas scalar prefetch, so the kernel's DMAs read the selected
    layer's tiles in place — no HBM->HBM materialization of the per-layer
    slice, which is what a lax.scan body pays when it feeds a sliced
    operand to a Pallas custom call (~+1 byte/weight of HBM traffic; see
    BASELINE.md "Round-4/5" int8 ladder). This is the weight-read law the
    int8 scan-blocks serving graph routes through (models/m3ae.py).

    scale: (L, N) or (L, 1, N) per-(layer, output-channel). Fallback: jnp
    reference on the dynamically sliced layer when shapes don't tile.
    a8=True quantizes the activation rows to int8 so the MXU runs s8 x s8
    at the chip's int8 rate (the --export_dtype int8_a8 stacked law); like
    q8_matmul's a8, it keeps the Pallas path at every row count — falling
    back would give up the int8 rate, not just the weight-read law.
    """
    if q8.ndim != 3:
        raise ValueError(f"q8_matmul_stacked takes (L,K,N), got {q8.shape}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    ldim, kdim, n = q8.shape
    # one clamp law for both paths: the Pallas index maps would otherwise
    # pass a raw OOB id into the DMA while the jnp fallback clamps
    layer = jnp.clip(jnp.asarray(layer, jnp.int32), 0, ldim - 1)
    scale3 = scale.reshape(ldim, 1, n)
    on_tpu = (jax.default_backend() == "tpu" or interpret) \
        and not _REFERENCE_ONLY
    pallas_ok = on_tpu and (
        a8 or x2.shape[0] <= _ROWS_CROSSOVER_BLOCKS * block_m)
    blocks = _choose_blocks(x2.shape[0], kdim, n, block_m, block_k,
                            block_n, row_mult=32 if a8 else 16) \
        if pallas_ok else None
    if blocks is None:
        out = (q8_matmul_a8_reference if a8 else q8_matmul_reference)(
            x2, jax.lax.dynamic_index_in_dim(q8, layer, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(scale3, layer, 0, keepdims=False))
    else:
        bm, bk, bn = blocks
        out = _q8_stacked_pallas(x2, q8, scale3, layer, bm, bn, bk,
                                 interpret, a8)
    return out.reshape(lead + (n,)) if x.ndim != 2 else out


def q8_matmul(x, q8, scale, *, block_m: int = 512, block_n: int = 2048,
              block_k: int = 2048, interpret: bool = False,
              a8: bool = False):
    """x (..., K) float -> (..., N) bf16 via the int8 weight (K, N) and its
    per-output-channel scale ((1, N) or (N,)).

    Pallas on TPU when K and N tile (128-multiple divisors within the
    block caps); jnp reference otherwise. Leading dims are flattened into
    the GEMM row axis; the row block is sublane-padded (multiple of 16,
    or 32 under a8). block_* are upper bounds — the chooser takes the
    fewest grid steps that fit VMEM. interpret=True runs the kernel in
    Pallas interpret mode (CPU test tier).

    a8=True additionally quantizes the activations per-row to int8 (W8A8):
    the MXU consumes s8 x s8 at the chip's int8 rate with exact int32
    accumulation, and the row x column scales apply in fp32 afterward —
    the --export_dtype int8_a8 serving law.
    """
    if q8.ndim != 2:
        raise ValueError(f"q8_matmul takes a 2-D weight, got w{q8.shape}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    scale = scale.reshape(1, -1)
    if scale.shape[1] != q8.shape[1]:
        raise ValueError(f"scale {scale.shape} is not per-output-channel "
                         f"for w{q8.shape}")
    on_tpu = (jax.default_backend() == "tpu" or interpret) \
        and not _REFERENCE_ONLY
    # a8 keeps the Pallas path at every row count: its fallback would give
    # up the int8 MXU rate, not just the weight-read law
    pallas_ok = on_tpu and (
        a8 or x2.shape[0] <= _ROWS_CROSSOVER_BLOCKS * block_m)
    blocks = _choose_blocks(x2.shape[0], q8.shape[0], q8.shape[1],
                            block_m, block_k, block_n,
                            row_mult=32 if a8 else 16) if pallas_ok else None
    if blocks is None:
        out = (q8_matmul_a8_reference if a8 else q8_matmul_reference)(
            x2, q8, scale)
    else:
        bm, bk, bn = blocks
        out = _q8_matmul_pallas(x2, q8, scale, bm, bn, bk, interpret, a8)
    return out.reshape(lead + (q8.shape[1],)) if x.ndim != 2 else out


# -- fused stacked int8 MLP: fc1 -> exact GELU -> fc2 in ONE kernel ----------
# The b=1 serving forward is weight-read-bound AND dispatch-bound (256
# Pallas GEMMs; BASELINE.md "Round-4/5" int8 ladder: stacked 9.99 ms vs
# bf16 8.8). Fusing each block's MLP pair halves its dispatches and removes
# the (M, H) hidden activation's HBM round-trip (~5.6 MB/layer at b=1):
# the hidden tile lives only in VMEM. Weight traffic is unchanged —
# W1/W2 still stream once as int8 via scalar-prefetch layer selection.
# Scope: the single-row-block regime (padded M <= block_m); larger M falls
# back to the two-GEMM path, which row-blocks / crossover-routes correctly.

_SQRT1_2 = 0.7071067811865476


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |error| < 1.5e-7 — below
    bf16 resolution. Mosaic has no erf lowering (only exp), so the kernel
    carries its own."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(t):
    """erf-based GELU, matching nn.gelu(approximate=False) to ~1.5e-7
    in fp32 (the polynomial erf above)."""
    return 0.5 * t * (1.0 + _erf_poly(t * _SQRT1_2))


def q8_mlp_reference(x, q8_1, s1, b1, q8_2, s2, b2, layer):
    """jnp law (fallback + oracle): per-layer slices, dequant dots, exact
    GELU — exactly what the unfused QDense pair computes (bf16 dots,
    bias in bf16, GELU on the bf16 intermediate)."""
    w1 = jax.lax.dynamic_index_in_dim(q8_1, layer, 0, keepdims=False)
    sl1 = jax.lax.dynamic_index_in_dim(s1, layer, 0, keepdims=False)
    w2 = jax.lax.dynamic_index_in_dim(q8_2, layer, 0, keepdims=False)
    sl2 = jax.lax.dynamic_index_in_dim(s2, layer, 0, keepdims=False)
    t = q8_matmul_reference(x, w1, sl1.reshape(1, -1))
    t = t + b1.astype(t.dtype)
    g = jax.nn.gelu(t, approximate=False)
    out = q8_matmul_reference(g, w2, sl2.reshape(1, -1))
    return out + b2.astype(out.dtype)


def _kernel_mlp_stacked(l_ref, x_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                        s2_ref, b2_ref, o_ref, acc):
    """Grid (m_steps, h_steps), h fastest: per step, a (C, bh) fc1 column
    block produces the (bm, bh) hidden tile in fp32 (scale + bias + exact
    GELU applied in VMEM), which immediately contracts with the matching
    (bh, C) fc2 row block into the fp32 output accumulator. The hidden
    activation never touches HBM."""
    del l_ref
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    t = jax.lax.dot_general(
        x_ref[...], w1_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t = t * s1_ref[0].astype(jnp.float32) + b1_ref[...].astype(jnp.float32)
    g = _gelu_exact(t).astype(jnp.bfloat16)
    acc[...] += jax.lax.dot_general(
        g, w2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        o_ref[...] = (acc[...] * s2_ref[0].astype(jnp.float32)
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_mlp_stacked_a8(l_ref, x_ref, xs_ref, w1_ref, s1_ref, b1_ref,
                           w2_ref, s2_ref, b2_ref, o_ref, acc):
    """W8A8 fused MLP: both GEMMs run s8 x s8 at the int8 MXU rate. fc1
    consumes the caller's per-row-quantized activation (xs rides in as a
    lane-broadcast column); the fp32 hidden tile (scales + bias + exact
    GELU) is re-quantized IN VMEM per (row, column-tile) — finer than the
    per-site a8 law's per-row granularity, so its rounding error is
    bounded by the calibrated per-site error — and contracts with the fc2
    row block into the fp32 accumulator."""
    del l_ref
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    t = jax.lax.dot_general(
        x_ref[...], w1_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    xs = xs_ref[...][:, :1]                       # (bm, 1) per-row scale
    t = (t.astype(jnp.float32) * xs * s1_ref[0].astype(jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    g = _gelu_exact(t)
    sg = jnp.maximum(jnp.max(jnp.abs(g), axis=1, keepdims=True),
                     1e-12) / 127.0
    gq = jnp.clip(jnp.round(g / sg), -127, 127).astype(jnp.int8)
    acc[...] += jax.lax.dot_general(
        gq, w2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sg

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        o_ref[...] = (acc[...] * s2_ref[0].astype(jnp.float32)
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bh", "interpret", "a8"))
def _q8_mlp_pallas(x, q8_1, s1, b1, q8_2, s2, b2, layer, bm, bh, interpret,
                   a8=False):
    b, c = x.shape
    ldim, _, h = q8_1.shape
    rows = -(-b // bm) * bm
    if a8:
        xq, xs = quantize_rows(x)
        xp = jnp.zeros((rows, c), jnp.int8).at[:b].set(xq)
        # per-row activation scale, lane-broadcast so the block keeps the
        # (sublane, 128-lane) layout Mosaic wants
        xs2 = jnp.broadcast_to(
            jnp.zeros((rows,), jnp.float32).at[:b].set(xs)[:, None],
            (rows, 128))
    else:
        xp = jnp.zeros((rows, c), jnp.bfloat16).at[:b].set(
            x.astype(jnp.bfloat16))
    grid = (rows // bm, h // bh)
    in_specs = [
        pl.BlockSpec((bm, c), lambda i, j, l: (i, 0)),             # x
        pl.BlockSpec((1, c, bh), lambda i, j, l: (l[0], 0, j)),    # W1
        pl.BlockSpec((1, 1, bh), lambda i, j, l: (l[0], 0, j)),    # s1
        pl.BlockSpec((1, bh), lambda i, j, l: (0, j)),             # b1
        pl.BlockSpec((1, bh, c), lambda i, j, l: (l[0], j, 0)),    # W2
        pl.BlockSpec((1, 1, c), lambda i, j, l: (l[0], 0, 0)),     # s2
        pl.BlockSpec((1, c), lambda i, j, l: (0, 0)),              # b2
    ]
    if a8:
        in_specs.insert(1, pl.BlockSpec((bm, 128),
                                        lambda i, j, l: (i, 0)))   # xs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c), lambda i, j, l: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
    )
    operands = [jnp.asarray(layer, jnp.int32).reshape(1), xp]
    if a8:
        operands.append(xs2)
    operands += [q8_1, s1.reshape(ldim, 1, h),
                 b1.reshape(1, h).astype(jnp.float32),
                 q8_2, s2.reshape(ldim, 1, c),
                 b2.reshape(1, c).astype(jnp.float32)]
    out = pl.pallas_call(
        _kernel_mlp_stacked_a8 if a8 else _kernel_mlp_stacked,
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return out[:b]


def _mlp_bh(rows: int, c: int, h: int, cap: int = 2048, a8: bool = False):
    """Largest 128-multiple divisor of H whose per-step working set (x +
    double-buffered W1/W2 blocks + hidden tile + fp32 accumulator; under
    a8 also the lane-broadcast row scales and the re-quantized s8 hidden)
    fits the VMEM budget; None -> fallback."""
    for bh in _divisors_desc(h, cap):
        vmem = (rows * c * (1 if a8 else 2) + 2 * (c * bh) + 2 * (bh * c)
                + rows * bh * 4 + rows * c * 6)
        if a8:
            vmem += rows * 128 * 4 + rows * bh
        if vmem <= _VMEM_BUDGET:
            return bh
    return None


def _mlp_bm_a8(rows: int, c: int, h: int, cap: int = 1024):
    """Row block for the a8 fused MLP's (m_steps, h_steps) grid: fewest
    row passes first (each re-streams both weight stacks once), then least
    padding — bounded at ~6% wasted rows — then the largest block, subject
    to some bh fitting VMEM. Returns (bm, bh) or None (fallback)."""
    best = None
    top = min(cap, -(-rows // 32) * 32)
    for bm in range(top, 31, -32):
        steps = -(-rows // bm)
        pad = steps * bm - rows
        if pad > max(rows // 16, 32):
            continue
        bh = _mlp_bh(bm, c, h, a8=True)
        if bh is None:
            continue
        key = (steps, pad, -bm)
        if best is None or key < best[0]:
            best = (key, (bm, bh))
    return best[1] if best else None


def q8_mlp_stacked(x, q8_1, s1, b1, q8_2, s2, b2, layer, *,
                   block_m: int = 512, interpret: bool = False,
                   a8: bool = False):
    """Layer ``layer`` of a stacked int8 MLP: GELU(x @ W1s + b1) @ W2s + b2
    with both int8 stacks read in place via scalar prefetch and the hidden
    activation confined to VMEM. q8_1: (L, C, H); q8_2: (L, H, C);
    s1/s2 per-(layer, out-channel); b1 (H,) / b2 (C,) already sliced to
    the current layer (the scan slices small float leaves per step).
    Falls back to the two-GEMM q8_matmul_stacked path (which row-blocks
    and crossover-routes) when M exceeds one row block or shapes don't
    tile.

    a8=True is the W8A8 fused law: both GEMMs run s8 x s8 at the int8 MXU
    rate (x per-row-quantized by the caller-side wrapper, the hidden tile
    re-quantized per (row, column-tile) in VMEM — finer granularity than
    the per-site a8 law, so its error is bounded by the calibrated
    per-site error). The a8 path row-blocks over a (m_steps, h_steps)
    grid (_mlp_bm_a8), so it serves EVERY row count — matching q8_matmul's
    a8 crossover exemption: falling back would give up the int8 rate."""
    if q8_1.ndim != 3 or q8_2.ndim != 3:
        raise ValueError(
            f"q8_mlp_stacked takes (L,C,H)/(L,H,C), got {q8_1.shape} "
            f"{q8_2.shape}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    ldim, c, h = q8_1.shape
    layer = jnp.clip(jnp.asarray(layer, jnp.int32), 0, ldim - 1)
    on_tpu = (jax.default_backend() == "tpu" or interpret) \
        and not _REFERENCE_ONLY
    if a8:
        choice = _mlp_bm_a8(x2.shape[0], c, h) \
            if on_tpu and c % 128 == 0 else None
        if choice is None:
            t = q8_matmul_stacked(x2, q8_1, s1, layer, a8=True) \
                + b1.astype(jnp.bfloat16)
            g = jax.nn.gelu(t, approximate=False)
            out = q8_matmul_stacked(g, q8_2, s2, layer, a8=True) \
                + b2.astype(jnp.bfloat16)
        else:
            bm, bh = choice
            out = _q8_mlp_pallas(x2, q8_1, s1, b1, q8_2, s2, b2, layer,
                                 bm, bh, interpret, a8=True)
        return out.reshape(lead + (c,)) if x.ndim != 2 else out
    rows = -(-x2.shape[0] // 16) * 16
    bh = _mlp_bh(rows, c, h) if on_tpu and rows <= block_m \
        and c % 128 == 0 else None
    if bh is None:
        t = q8_matmul_stacked(x2, q8_1, s1, layer) + b1.astype(jnp.bfloat16)
        g = jax.nn.gelu(t, approximate=False)
        out = q8_matmul_stacked(g, q8_2, s2, layer) \
            + b2.astype(jnp.bfloat16)
    else:
        out = _q8_mlp_pallas(x2, q8_1, s1, b1, q8_2, s2, b2, layer, rows,
                             bh, interpret)
    return out.reshape(lead + (c,)) if x.ndim != 2 else out
