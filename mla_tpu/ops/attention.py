"""Fused masked attention for the ViT encoders (M3AE / CAV-MAE).

The reference materializes (B, H, S, S) score tensors and applies the padding
mask by overwriting masked columns with -1e7 before softmax
(reference: models/m3ae.py:95-127; timm attention in models/cav_mae.py:16).
Here the whole (scores -> mask -> softmax -> weighted sum) pipeline is one
Pallas TPU kernel: q is processed in 128-row blocks, K/V live in VMEM for the
full (<=1k-token) sequence, softmax accumulates in fp32, and the two matmuls
hit the MXU back to back. Sequence growth stays kernel-local (q-blockwise),
so longer contexts need no architectural change (SURVEY.md §5.7).

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


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, mask_ref,
                     dq_ref, dk_ref, dv_ref, *, scale):
    """One (batch, head) per grid point; at these sequence lengths (<=1k)
    Q/K/V/dO and the (S, S) probability matrix all live in VMEM, so the whole
    backward is five back-to-back MXU matmuls with no output revisiting.

    STATUS (round-2 remeasure, benchmarks/bwd_tune.py): numerically correct
    and ~1.0x XLA's fused grad at S=513/D=64 on v5e (0.75-0.9 ms vs
    0.75-1.1 ms over repeated 50-iter serial chains; in-kernel transposes and
    D-padding-to-128 variants measure the same within relay noise, so the
    plain (0,0)-contraction form is kept). Round 1's "20x slower" was a
    measurement artifact. End-to-end the hybrid XLA VJP still wins the m3ae
    train step by ~5% (248 vs 262 ms, benchmarks/bwd_ab.py ABA), so XLA stays
    the default backward; flip with set_pallas_backward(True) for
    long-sequence regimes where recompute dominates."""
    q = q_ref[0, 0].astype(jnp.float32)            # (S, D)
    k = k_ref[0, 0].astype(jnp.float32)            # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)            # (S, D)
    do = do_ref[0, 0].astype(jnp.float32)          # (S, D)
    mask = mask_ref[0]                             # (1, S)

    scores = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask > 0, _NEG, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)     # (S, S)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (S, S)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)               # (S, 1)
    ds = p * (dp - delta)                                         # (S, S)
    # masked positions have p == 0 -> ds == 0 already

    dq_ref[0, 0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention_bwd(q, k, v, do, padding_mask, scale=None,
                        interpret=False):
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    qp = _pad_to(q, 2, _QBLOCK)
    kp = _pad_to(k, 2, _QBLOCK)
    vp = _pad_to(v, 2, _QBLOCK)
    dop = _pad_to(do, 2, _QBLOCK)
    mp = _pad_to(padding_mask.astype(jnp.float32), 1, _QBLOCK)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    mp = mp[:, None, :]
    sp = qp.shape[2]

    sspec = pl.BlockSpec((1, 1, sp, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)),
        grid=(b, h),
        in_specs=[sspec, sspec, sspec, sspec,
                  pl.BlockSpec((1, 1, sp), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(sspec, sspec, sspec),
        interpret=interpret,
    )(qp, kp, vp, dop, mp)
    return dq[:, :, :s, :], dk[:, :, :s, :], dv[:, :, :s, :]


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

def _sp_infer(*args):
    # result takes q's sharding: (B, H, S, D) -> (B, H, S, D), same layout
    arg_shapes = args[-2]
    return arg_shapes[0].sharding


def _sp_infer_bwd(*args):
    arg_shapes = args[-2]
    return tuple(s.sharding for s in arg_shapes[:3])


def _sp_partition_fwd(interpret, mesh, arg_shapes, result_shape):
    def lower(q, k, v, m):
        return flash_attention(q, k, v, m, interpret=interpret)
    return (mesh, lower, result_shape.sharding,
            tuple(a.sharding for a in arg_shapes))


def _sp_partition_bwd(interpret, mesh, arg_shapes, result_shape):
    def lower(q, k, v, do, m):
        return flash_attention_bwd(q, k, v, do, m, interpret=interpret)
    return (mesh, lower, tuple(r.sharding for r in result_shape),
            tuple(a.sharding for a in arg_shapes))


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


def _flash_mha_fwd(q, k, v, padding_mask):
    # Differentiated-path forward. With the XLA backward (default), use the
    # XLA forward: the backward recomputes the same XLA attention and XLA CSEs
    # the two — measured 18% faster m3ae train step than pallas-fwd +
    # recompute-bwd (round 1). With the Pallas backward enabled, run the
    # Pallas forward too (no recompute to CSE against). The undifferentiated
    # primal path (inference) always runs the fused Pallas kernel.
    if _USE_PALLAS_BWD:
        out = flash_attention_sp(q, k, v, padding_mask)
    else:
        out = attention_reference(q, k, v, padding_mask)
    return out, (q, k, v, padding_mask)


# Backward selection. Round-1 measured the Pallas backward ~20x slower than
# XLA's fused grad at S=513/D=64; round-2 remeasurement (benchmarks/
# bwd_tune.py, 50-iter serial chains, repeated) shows it at ~1.0x XLA
# (0.75-0.9 ms vs 0.75-1.1 ms) — the old number was an artifact. Both paths
# are production-viable; XLA stays default because it is never slower in the
# end-to-end m3ae step (see BASELINE.md round-2 notes).
_USE_PALLAS_BWD = False


def set_pallas_backward(enable: bool):
    global _USE_PALLAS_BWD
    _USE_PALLAS_BWD = enable


def _flash_mha_bwd(res, g):
    q, k, v, padding_mask = res
    if _USE_PALLAS_BWD:
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
    if jax.default_backend() == "tpu" and scale is None:
        if padding_mask is None:
            padding_mask = jnp.zeros(
                (q.shape[0], q.shape[2]), dtype=jnp.float32)
        return _flash_mha(q, k, v, padding_mask)
    return attention_reference(q, k, v, padding_mask, scale)
