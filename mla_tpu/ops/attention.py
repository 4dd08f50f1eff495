"""Fused masked attention for the ViT encoders (M3AE / CAV-MAE).

The reference materializes (B, H, S, S) score tensors and applies the padding
mask by overwriting masked columns with -1e7 before softmax
(reference: models/m3ae.py:95-127; timm attention in models/cav_mae.py:16).
Here the whole (scores -> mask -> softmax -> weighted sum) pipeline is one
Pallas TPU kernel. At the model family's sequence lengths (<= ~1k tokens) a
head-chunked kernel processes GH whole heads per grid step with everything
VMEM-resident — dots on the MXU in the input dtype with fp32 accumulation,
softmax in fp32 (see _attn_kernel_heads for the measured retune). Longer
sequences fall back to a q-blockwise kernel (128-row q blocks, full-sequence
K/V in VMEM), so context growth needs no architectural change
(SURVEY.md §5.7).

Mask semantics replicated exactly: where mask > 0, the *scaled* score is
replaced by -1e7 (not added), then softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e7
_QBLOCK = 128


def attention_reference(q, k, v, padding_mask=None, scale=None):
    """Plain-XLA reference. q,k,v: (B, H, S, D); padding_mask: (B, S) 1=padded."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if padding_mask is not None:
        m = padding_mask[:, None, None, :] > 0
        scores = jnp.where(m, _NEG, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)            # (QB, D)
    k = k_ref[0, 0].astype(jnp.float32)            # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)            # (S, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (QB, S)
    mask = mask_ref[0]                              # (1, S)
    scores = jnp.where(mask > 0, _NEG, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


# Head-chunked kernels (the production path for the model family's S <= ~1k).
#
# Round-2 retune: the q-blockwise kernel above runs ONE (128, D=64) q-block
# per grid step — at ViT shapes (B64 H12 S257) that is a 2304-step grid of
# ~13 MFLOP invocations, measured 1.96 ms/op in a serial chain (14.8 TF/s),
# i.e. bound by per-invocation overhead and the half-empty D=64 lane tile,
# not by the MXU. Processing GH whole heads per grid step with the dots kept
# in the input dtype (bf16 on the MXU, fp32 accumulation via
# preferred_element_type) measures 0.73-0.74 ms/op at the same shape
# (39.6 TF/s, GH=6/12) and 1.59 ms at S=513/GH=2 (50.6 TF/s) — 2.7x the old
# kernel and 2.3x XLA's fused attention (1.65 ms). GH is the largest divisor
# of H whose live fp32 score tensors fit a VMEM budget; sequences too long
# for even GH=1 fall back to the q-blockwise kernel (long-context path,
# SURVEY.md §5.7).

# Budget for the live fp32 (GH, S, S) score-sized intermediates per grid step
# (n_live of them: fwd keeps ~2, bwd ~3). 7 MB picks the measured-best chunks
# on v5e: GH=6 at S=384 (0.742 ms), GH=2 at S=640 (1.59 ms), GH=1 at S=1024;
# larger chunks gain <2% more but crowd out double-buffering.
_SCORE_VMEM_BUDGET = 7 * 1024 * 1024


def _head_chunk(h: int, sp: int, n_live: int) -> int:
    per_head = sp * sp * 4 * n_live
    gh = max(1, min(h, _SCORE_VMEM_BUDGET // per_head))
    while h % gh:
        gh -= 1
    return gh


def _attn_kernel_heads(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]                                    # (GH, S, D), input dtype
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (GH, S, S) fp32
    mask = mask_ref[0, 0]                           # (S,)
    scores = jnp.where(mask[None, None, :] > 0, _NEG, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(q, k, v, padding_mask=None, scale=None, interpret=False):
    """Pallas fused attention. q,k,v: (B, H, S, D); padding_mask: (B, S) 1=padded.

    Pads S to a multiple of 128 (padded keys masked out via the same -1e7 path,
    padded query rows dropped on return).
    """
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if padding_mask is None:
        padding_mask = jnp.zeros((b, s), dtype=jnp.float32)
    padding_mask = padding_mask.astype(jnp.float32)

    # Head-chunked branch: the sequence is a sublane dimension inside the
    # kernel (scores rows / q rows), so it only needs 8-alignment — padding
    # 257 -> 264 instead of -> 384 measures 0.62 vs 0.75 ms/op at the m3ae
    # shape (17% less score-matrix work). The q-blockwise fallback tiles S
    # into 128-row q blocks and keeps 128-alignment.
    sp8 = s + (-s) % 8
    gh = _head_chunk(h, sp8, n_live=2)
    if gh * sp8 * sp8 * 4 * 2 <= _SCORE_VMEM_BUDGET * 2:
        qp = _pad_to(q, 2, 8)
        kp = _pad_to(k, 2, 8)
        vp = _pad_to(v, 2, 8)
        mp = _pad_to(padding_mask + 0.0, 1, 8)
        if mp.shape[1] != s:
            mp = mp.at[:, s:].set(1.0)   # padded keys masked out
        mp = mp[:, None, :]
        out = pl.pallas_call(
            functools.partial(_attn_kernel_heads, scale=scale),
            out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
            grid=(b, h // gh),
            in_specs=[
                pl.BlockSpec((1, gh, sp8, d), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM)] * 3 + [
                pl.BlockSpec((1, 1, sp8), lambda bi, hi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, gh, sp8, d),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(qp, kp, vp, mp)
        return out[:, :, :s, :]

    qp = _pad_to(q, 2, _QBLOCK)
    kp = _pad_to(k, 2, _QBLOCK)
    vp = _pad_to(v, 2, _QBLOCK)
    # padded key positions must be masked out
    mp = _pad_to(padding_mask + 0.0, 1, _QBLOCK)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    sp = qp.shape[2]
    nq = sp // _QBLOCK
    mp = mp[:, None, :]  # (B, 1, Sp) — TPU block tiling needs >=2 trailing dims

    grid = (b, h, nq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, _QBLOCK, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _QBLOCK, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, mp)
    return out[:, :, :s, :]


def _attn_bwd_kernel_heads(q_ref, k_ref, v_ref, do_ref, mask_ref,
                           dq_ref, dk_ref, dv_ref, *, scale):
    """Head-chunked backward: GH heads per grid step, dots in the input dtype
    (bf16 MXU, fp32 accumulation), softmax recompute + five batched matmuls
    fully VMEM-resident. Same retune rationale as the forward (see
    _attn_kernel_heads)."""
    q = q_ref[0]                                   # (GH, S, D)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    mask = mask_ref[0, 0]                          # (S,)

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[None, None, :] > 0, _NEG, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)     # (GH, S, S) fp32

    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q_ref.dtype)    # (GH, S, S)
    pc = p.astype(q_ref.dtype)
    # masked positions have p == 0 -> ds == 0 already

    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pc, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention_bwd(q, k, v, do, padding_mask, scale=None,
                        interpret=False):
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    # sublane (8-) alignment suffices here too — see the forward's note
    qp = _pad_to(q, 2, 8)
    kp = _pad_to(k, 2, 8)
    vp = _pad_to(v, 2, 8)
    dop = _pad_to(do, 2, 8)
    mp = _pad_to(padding_mask.astype(jnp.float32), 1, 8)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    mp = mp[:, None, :]
    sp = qp.shape[2]

    # Unlike the forward (which has a q-blockwise long-sequence fallback),
    # this kernel needs three fp32 (S, S) intermediates per head chunk; once
    # even GH=1 exceeds the VMEM headroom it would die at Mosaic compile
    # time. Fail with an actionable error instead (_use_pallas_bwd routes to
    # the XLA backward before this point on the default policy path).
    if 3 * sp * sp * 4 > 2 * _SCORE_VMEM_BUDGET:
        raise ValueError(
            f"flash_attention_bwd: padded sequence {sp} exceeds the VMEM "
            "budget even at one head per grid step; use the XLA backward "
            "(set_pallas_backward(False) or the default shape policy)")
    gh = _head_chunk(h, sp, n_live=3)
    hspec = pl.BlockSpec((1, gh, sp, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_heads, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)),
        grid=(b, h // gh),
        in_specs=[hspec, hspec, hspec, hspec,
                  pl.BlockSpec((1, 1, sp), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(hspec, hspec, hspec),
        interpret=interpret,
    )(qp, kp, vp, dop, mp)
    return dq[:, :, :s, :], dk[:, :, :s, :], dv[:, :, :s, :]


# --- flat-layout (transpose-free) kernels ------------------------------------
#
# Round-3 block anatomy (benchmarks/block_anatomy.py, B64 S257 C768 H12 bf16):
# the (B,S,3,H,D)->(3,B,H,S,D) transpose that feeds the head-chunked kernels
# above costs ~1.0 ms/block forward — ~23% of the 4.3 ms block — because XLA
# must materialize the relayout around the opaque Pallas custom call. These
# kernels instead consume the qkv GEMM's output (B, S, 3C) DIRECTLY: the same
# array is passed three times with lane-offset index maps (q at block column
# hi, k at nh+hi, v at 2nh+hi), heads are processed as an unrolled loop of
# 2-D (S, D) matmuls per grid step, and the output lands as (B, S, C) — the
# exact layout the proj GEMM consumes. No HBM relayout anywhere on the fwd or
# bwd path; the backward returns d(qkv) chunks that concat back to (B, S, 3C)
# for the qkv GEMM backward.

def _flat_head_chunk(h: int, sp: int, d: int, n_live: int,
                     n_bufs: int, itemsize: int = 2) -> int:
    """Largest divisor of H for the flat kernels. Scores are per-head
    (looped) so they bound feasibility, not gh; gh is bounded by the
    (n_bufs x sp x gh*d) VMEM-resident operand blocks.

    itemsize: bytes per operand element (2 for the bf16 default; fp32
    compute, --compute_dtype float32, doubles the operand footprint —
    under-accounting it reintroduces the scoped-VMEM OOM class below)."""
    scores = sp * sp * 4 * n_live
    if scores > _SCORE_VMEM_BUDGET:
        return 0                      # even one head's scores don't fit
    gh = h
    while gh:
        # operand blocks are double-buffered by the pipeline (hence the 2x);
        # measured: the old 1x accounting OOM'd scoped vmem (18 MB > 16) on
        # the CAV-MAE S=512 backward at gh=12
        if h % gh == 0 and \
                scores + 2 * n_bufs * sp * gh * d * itemsize \
                <= 2 * _SCORE_VMEM_BUDGET:
            return gh
        gh -= 1
    return 0


def _attn_kernel_flat(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, gh, d):
    mask = mask_ref[0, 0]                           # (S,)
    qb = q_ref[0]                                   # (S, gh*d), input dtype
    kb = k_ref[0]
    vb = v_ref[0]
    for h in range(gh):                             # static unroll
        sl = slice(h * d, (h + 1) * d)
        scores = jax.lax.dot_general(
            qb[:, sl], kb[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (S, S) fp32
        scores = jnp.where(mask[None, :] > 0, _NEG, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[0, :, sl] = jnp.dot(
            probs, vb[:, sl],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "interpret"))
def flash_attention_flat(qkv, padding_mask, num_heads: int, scale=None,
                         interpret=False):
    """Fused attention on the flat qkv layout.

    qkv: (B, S, 3C) — the raw qkv GEMM output, thirds ordered [q | k | v],
    each third = H heads x D lanes. padding_mask: (B, S), 1 = padded.
    Returns (B, S, C) ready for the output projection."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    if padding_mask is None:
        padding_mask = jnp.zeros((b, s), dtype=jnp.float32)
    sp8 = s + (-s) % 8
    qkvp = _pad_to(qkv, 1, 8)
    mp = _pad_to(padding_mask.astype(jnp.float32), 1, 8)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    mp = mp[:, None, :]

    gh = _flat_head_chunk(num_heads, sp8, d, n_live=2, n_bufs=4,
                          itemsize=qkv.dtype.itemsize)
    assert gh, "flat kernel caller must check flat_attention_fits()"
    nh = num_heads // gh
    ghd = gh * d
    spec = lambda third: pl.BlockSpec(        # noqa: E731
        (1, sp8, ghd), lambda bi, hi, t=third: (bi, 0, t * nh + hi),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_flat, scale=scale, gh=gh, d=d),
        out_shape=jax.ShapeDtypeStruct((b, sp8, c), qkv.dtype),
        grid=(b, nh),
        in_specs=[spec(0), spec(1), spec(2),
                  pl.BlockSpec((1, 1, sp8), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, sp8, ghd), lambda bi, hi: (bi, 0, hi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, mp)
    return out[:, :s, :]


def _attn_bwd_kernel_flat(q_ref, k_ref, v_ref, do_ref, mask_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, gh, d):
    mask = mask_ref[0, 0]
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    dob = do_ref[0]
    for h in range(gh):
        sl = slice(h * d, (h + 1) * d)
        q = qb[:, sl]
        k = kb[:, sl]
        v = vb[:, sl]
        do = dob[:, sl]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None, :] > 0, _NEG, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)       # (S, S) fp32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(q_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "interpret"))
def flash_attention_flat_bwd(qkv, do, padding_mask, num_heads: int,
                             scale=None, interpret=False):
    """Backward of the flat kernel: returns (dq, dk, dv), each (B, S, C)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    sp8 = s + (-s) % 8
    qkvp = _pad_to(qkv, 1, 8)
    dop = _pad_to(do, 1, 8)
    mp = _pad_to(padding_mask.astype(jnp.float32), 1, 8)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    mp = mp[:, None, :]

    gh = _flat_head_chunk(num_heads, sp8, d, n_live=4, n_bufs=7,
                          itemsize=qkv.dtype.itemsize)
    assert gh, "flat bwd caller must check flat_attention_fits()"
    nh = num_heads // gh
    ghd = gh * d
    spec = lambda third: pl.BlockSpec(        # noqa: E731
        (1, sp8, ghd), lambda bi, hi, t=third: (bi, 0, t * nh + hi),
        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, sp8, ghd), lambda bi, hi: (bi, 0, hi),
                         memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((b, sp8, c), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_flat, scale=scale,
                          gh=gh, d=d),
        out_shape=(osh, osh, osh),
        grid=(b, nh),
        in_specs=[spec(0), spec(1), spec(2), ospec,
                  pl.BlockSpec((1, 1, sp8), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(ospec, ospec, ospec),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, dop, mp)
    return dq[:, :s, :], dk[:, :s, :], dv[:, :s, :]


def flat_attention_fits(num_heads: int, s: int, d: int,
                        itemsize: int = 2) -> bool:
    sp8 = s + (-s) % 8
    return _flat_head_chunk(num_heads, sp8, d, n_live=4, n_bufs=7,
                            itemsize=itemsize) > 0


# Trace-time switch: the flat kernels have no custom_partitioning rules, so
# under TP/SP the driver disables them and layers fall back to the
# (B,H,S,D)-layout kernels (whose rules GSPMD can split over heads).
_FLAT_ENABLED = True

# Trace-time switch: route EVERY attention through the pure-jnp reference
# (no Pallas custom calls at all). Used when tracing graphs that must be
# serializable AND partitionable by stock GSPMD — e.g. the TP-sharded
# serving artifact (runtime/export.py export_serving_sharded): a
# custom_partitioning handler is a Python callback and does not survive
# jax.export serialization.
_FORCE_REFERENCE = False


def set_reference_attention(enabled: bool):
    global _FORCE_REFERENCE
    _FORCE_REFERENCE = bool(enabled)


def set_flat_attention(enabled: bool):
    global _FLAT_ENABLED
    _FLAT_ENABLED = bool(enabled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _flat_mha(qkv, padding_mask, num_heads):
    return flash_attention_flat(qkv, padding_mask, num_heads)


def _flat_mha_fwd(qkv, padding_mask, num_heads):
    out = flash_attention_flat(qkv, padding_mask, num_heads)
    return out, (qkv, padding_mask)


def _flat_mha_bwd(num_heads, res, g):
    qkv, padding_mask = res
    dq, dk, dv = flash_attention_flat_bwd(qkv, g, padding_mask, num_heads)
    return jnp.concatenate([dq, dk, dv], axis=-1), None


_flat_mha.defvjp(_flat_mha_fwd, _flat_mha_bwd)


def fused_attention_qkv(qkv, padding_mask, num_heads: int):
    """Attention on the raw fused-qkv GEMM output (B, S, 3C) -> (B, S, C).

    TPU + flat kernels enabled + shapes fit: the transpose-free Pallas path.
    Otherwise (CPU tests, TP/SP runs, very long sequences): reconstruct the
    (B, H, S, D) tensors and take the established kernels — identical math.
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if (jax.default_backend() == "tpu" and _FLAT_ENABLED
            and not _FORCE_REFERENCE
            and flat_attention_fits(num_heads, s, d, qkv.dtype.itemsize)):
        if padding_mask is None:
            padding_mask = jnp.zeros((b, s), dtype=jnp.float32)
        return _flat_mha(qkv, padding_mask, num_heads)
    parts = qkv.reshape(b, s, 3, num_heads, d)
    parts = jnp.transpose(parts, (2, 0, 3, 1, 4))
    out = fused_attention(parts[0], parts[1], parts[2], padding_mask)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, c)


# --- GSPMD partitioning for the Pallas kernels -------------------------------
#
# pallas_call lowers to an opaque custom call GSPMD cannot split, so under
# tensor parallelism (parallel/tp.py shards the head axis) the compiler would
# otherwise all-gather q/k/v around the kernel. custom_partitioning teaches the
# partitioner that the kernels are embarrassingly parallel over (batch, head):
# each shard just runs the same kernel on its local block. Sequence and
# head-dim factors stay kernel-local (the kernel needs full K/V rows), which
# matches the TP layout — only 'data' x batch and 'model' x head are ever
# sharded. Verified: no all-gather in the compiled (4,2)-mesh HLO and
# bit-identical output (tests/test_tp.py).

def _keep_dims(sharding, keep):
    """Sharding with only the axes in ``keep`` retained — the kernels need
    the full sequence and head-dim per shard, so S/D (and the mask's token
    axis) must be replicated. Returning a stripped sharding here makes GSPMD
    insert the gather when an upstream pass (e.g. SP's token sharding)
    proposes splitting a kernel-local dim — instead of silently running a
    per-shard softmax over a subset of keys."""
    from jax.sharding import NamedSharding, PartitionSpec
    if not isinstance(sharding, NamedSharding):
        # An opaque (e.g. GSPMDSharding) spec could hide a split sequence
        # dim; passing it through would let a per-shard kernel softmax over
        # a subset of keys silently. Fail loud instead.
        raise TypeError(
            "flash_attention custom_partitioning expected a NamedSharding, "
            f"got {type(sharding).__name__}; wrap the call site in a "
            "Mesh/NamedSharding context (or replicate the operands)")
    spec = list(sharding.spec) + [None] * 4
    new = [spec[i] if i in keep else None for i in range(len(sharding.spec))]
    while new and new[-1] is None:
        new.pop()
    return NamedSharding(sharding.mesh, PartitionSpec(*new))


def _sp_infer(*args):
    # result takes q's sharding on (B, H); S/D stay kernel-local
    arg_shapes = args[-2]
    return _keep_dims(arg_shapes[0].sharding, {0, 1})


def _sp_infer_bwd(*args):
    arg_shapes = args[-2]
    return tuple(_keep_dims(s.sharding, {0, 1}) for s in arg_shapes[:3])


def _sp_partition_fwd(interpret, mesh, arg_shapes, result_shape):
    def lower(q, k, v, m):
        return flash_attention(q, k, v, m, interpret=interpret)
    arg_sh = tuple(_keep_dims(a.sharding, {0, 1}) for a in arg_shapes[:3]) \
        + (_keep_dims(arg_shapes[3].sharding, {0}),)
    return (mesh, lower, _keep_dims(result_shape.sharding, {0, 1}), arg_sh)


def _sp_partition_bwd(interpret, mesh, arg_shapes, result_shape):
    def lower(q, k, v, do, m):
        return flash_attention_bwd(q, k, v, do, m, interpret=interpret)
    arg_sh = tuple(_keep_dims(a.sharding, {0, 1}) for a in arg_shapes[:4]) \
        + (_keep_dims(arg_shapes[4].sharding, {0}),)
    return (mesh, lower,
            tuple(_keep_dims(r.sharding, {0, 1}) for r in result_shape),
            arg_sh)


flash_attention_sp = custom_partitioning(
    lambda q, k, v, m, interpret=False: flash_attention(
        q, k, v, m, interpret=interpret),
    static_argnums=(4,))
flash_attention_sp.def_partition(
    partition=_sp_partition_fwd,
    infer_sharding_from_operands=_sp_infer,
    sharding_rule="b h s d, b h t d, b h t d, b t -> b h s d")

flash_attention_bwd_sp = custom_partitioning(
    lambda q, k, v, do, m, interpret=False: flash_attention_bwd(
        q, k, v, do, m, interpret=interpret),
    static_argnums=(5,))
flash_attention_bwd_sp.def_partition(
    partition=_sp_partition_bwd,
    infer_sharding_from_operands=_sp_infer_bwd,
    sharding_rule=("b h s d, b h t d, b h t d, b h s d, b t "
                   "-> b h s d, b h t d, b h t d"))


@jax.custom_vjp
def _flash_mha(q, k, v, padding_mask):
    return flash_attention_sp(q, k, v, padding_mask)


# Backward selection, decided at trace time from the (static) sequence
# length. With the head-chunked kernels the full-Pallas VJP is the end-to-end
# winner wherever it fits: the m3ae MLA train step (B64, S=256/257) measures
# 226.7 ms full-Pallas vs 249.7 ms hybrid-XLA (benchmarks/bwd_ab.py ABA),
# and at S=513 the chain-timed pair is 6.14 ms vs XLA's 6.67 ms. (Isolated
# 20-op chains at S=257 flatter XLA — 2.12 vs 2.64 ms/layer — because the
# chained vjp CSEs unrealistically; in the real step XLA's materialized
# (B, H, S, S) probs cost more HBM than the Pallas recompute costs FLOPs.)
# Beyond ~1k padded tokens a GH=1 chunk's three fp32 (S, S) intermediates
# outgrow VMEM, so XLA's tiled backward takes over there.
# ``set_pallas_backward`` remains as a manual override for A/B runs.
_FORCE_PALLAS_BWD = None  # None = shape policy; True/False = forced


def set_pallas_backward(enable):
    """Force the backward choice (True/False), or None for the shape policy."""
    global _FORCE_PALLAS_BWD
    _FORCE_PALLAS_BWD = enable


def _use_pallas_bwd(s: int) -> bool:
    if _FORCE_PALLAS_BWD is not None:
        return _FORCE_PALLAS_BWD
    return s + (-s) % 8 <= 1024


def _flash_mha_fwd(q, k, v, padding_mask):
    # Differentiated-path forward. With the XLA backward (very long
    # sequences), use the XLA forward: the backward recomputes the same XLA
    # attention and XLA CSEs the two. With the Pallas backward (the default
    # wherever it fits), run the Pallas forward too (no recompute to CSE
    # against). The undifferentiated primal path (inference) always runs the
    # fused Pallas kernel.
    if _use_pallas_bwd(q.shape[2]):
        out = flash_attention_sp(q, k, v, padding_mask)
    else:
        out = attention_reference(q, k, v, padding_mask)
    return out, (q, k, v, padding_mask)


def _flash_mha_bwd(res, g):
    q, k, v, padding_mask = res
    if _use_pallas_bwd(q.shape[2]):
        dq, dk, dv = flash_attention_bwd_sp(q, k, v, g, padding_mask)
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attention_reference(q_, k_, v_, padding_mask),
            q, k, v)
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def fused_attention(q, k, v, padding_mask=None, scale=None):
    """Dispatch: Pallas kernel (with custom VJP) on TPU at the default scale,
    XLA reference elsewhere."""
    if jax.default_backend() == "tpu" and scale is None \
            and not _FORCE_REFERENCE:
        if padding_mask is None:
            padding_mask = jnp.zeros(
                (q.shape[0], q.shape[2]), dtype=jnp.float32)
        return _flash_mha(q, k, v, padding_mask)
    return attention_reference(q, k, v, padding_mask, scale)
