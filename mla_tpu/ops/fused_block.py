"""Fused LayerNorm -> Dense Pallas kernels for the transformer blocks.

Every M3AE/CAV block runs LayerNorm immediately followed by a Dense GEMM
twice (norm1 -> qkv, norm2 -> fc1; reference: models/m3ae.py:131-160,
models/cav_mae.py:86-113). XLA materializes the LN output to HBM because TPU
dots take materialized operands — a (B*S, C) bf16 round-trip plus separate
VPU work per LN (measured in benchmarks/fusion_probe.py). These kernels
compute the row-wise LN in VMEM and feed the normalized block straight into
the MXU, eliminating the intermediate entirely on both the forward and
backward passes.

Numerics match flax.linen exactly where it matters:
  - LN statistics in fp32, fast variance E[x^2]-E[x]^2 clipped at 0
    (flax.linen.normalization._compute_stats), affine in fp32, cast to the
    module dtype afterwards (_normalize).
  - Dense in the module dtype (bf16 on TPU) with fp32 MXU accumulation,
    bias added post-cast — the same contraction XLA emits for nn.Dense.

Dispatch mirrors ops/attention.py's flat kernels: TPU + enabled (opt-in
via set_fused_ln_dense) + VMEM fit -> Pallas custom_vjp; otherwise the
reference jnp path, which is bit-identical to the nn.LayerNorm/nn.Dense
composition (pinned by tests/test_fused_block.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024


# --- reference path (exact flax.linen math) ---------------------------------

def ln_reference(x, scale, bias, eps: float = 1e-5, dtype=None):
    """Bit-identical to nn.LayerNorm(epsilon=eps, dtype=dtype) with fp32
    params (flax.linen.normalization._compute_stats/_normalize): stats in
    fp32 on the RAW input, result cast to the module dtype."""
    dtype = dtype or x.dtype
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m, 0.0)
    # op order matters for bit-exactness vs flax: mul = rsqrt * scale first
    y = (xf - m) * (jax.lax.rsqrt(v + eps) * scale) + bias
    return y.astype(dtype)


def dense_reference(x, kernel, bias, dtype=None):
    """Bit-identical to nn.Dense(dtype=dtype): inputs and params promoted to
    the module dtype, dot in that dtype, bias added to the dot output."""
    dtype = dtype or x.dtype
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _ln_dense_ref(x2, scale, bias, kernel, dbias, eps, dtype=None):
    return dense_reference(ln_reference(x2, scale, bias, eps, dtype),
                           kernel, dbias, dtype)


# --- kernels ----------------------------------------------------------------

def _row_block(io_per_row: int, temps_per_row: int, itemsize: int,
               resident: int) -> int:
    """Largest row block whose double-buffered per-step I/O rows plus the
    kernel's single-buffered fp32 stack temporaries plus the grid-resident
    bytes (weight and/or fp32 accumulator block) fit VMEM."""
    for rb in (1024, 512, 256, 128):
        if (resident + 2 * rb * io_per_row * itemsize
                + rb * temps_per_row * 4 <= _VMEM_BUDGET):
            return rb
    return 0


def _rb_fwd(c, f, it):
    # I/O: x (c) in + out (f); temps: xf + affine h (fp32, ~2c);
    # resident: W
    return _row_block(c + f, 2 * c, it, resident=c * f * it)


def _rb_dx(c, f, it):
    # I/O: x (c) + dy (f) in + dx (c) out; temps: dh (f) + xf/xhat/dxh (3c)
    # fp32 — Mosaic stack-allocates these in scoped vmem; measured: ignoring
    # them OOMs at rb=512 f=3072 (18.25M scoped > 16M); resident: W
    return _row_block(2 * c + f, f + 3 * c, it, resident=c * f * it)


def _rb_dw(c, f, it):
    """(row_block, f_block) for the column-blocked dW accumulation.
    per step: x (c) + dy (fb) in; resident: fp32 dW block (c, fb)."""
    for fb in [f] + [d for d in (2048, 1536, 1024, 768, 512, 384, 256, 128)
                     if d < f and f % d == 0]:
        rb = _row_block(c + fb, 3 * c, it, resident=c * fb * 4)
        if rb:
            return rb, fb
    return 0, 0


def ln_dense_fits(c: int, f: int, itemsize: int = 2) -> bool:
    return min(_rb_fwd(c, f, itemsize), _rb_dx(c, f, itemsize),
               _rb_dw(c, f, itemsize)[0]) > 0


def _stats(xf, eps):
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m, 0.0)
    return m, jax.lax.rsqrt(v + eps)


def _ln_dense_kernel(x_ref, s_ref, b_ref, w_ref, d_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    m, r = _stats(xf, eps)
    h = ((xf - m) * (r * s_ref[...]) + b_ref[...]).astype(o_ref.dtype)
    acc = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype) + d_ref[...].astype(o_ref.dtype)


def _ln_dense_bwd_dx_kernel(x_ref, s_ref, w_ref, dy_ref,
                            dx_ref, ds_ref, db_ref, *, eps):
    """dx for the LN->Dense chain + the LN affine grads, accumulated across
    row-block grid steps (TPU grid is sequential)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xf = x_ref[...].astype(jnp.float32)
    m, r = _stats(xf, eps)
    xhat = (xf - m) * r
    # dh: grad at the LN output (post-cast; the cast's grad is identity)
    dh = jax.lax.dot_general(
        dy_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxh = dh * s_ref[...]
    mean_dxh = jnp.mean(dxh, axis=-1, keepdims=True)
    mean_dxh_xhat = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dxf = r * (dxh - mean_dxh - xhat * mean_dxh_xhat)
    dx_ref[...] = dxf.astype(dx_ref.dtype)


def _ln_dense_bwd_dw_kernel(x_ref, s_ref, b_ref, dy_ref,
                            dw_ref, dc_ref, *, eps):
    """dW = LN(x)^T @ dy and the Dense bias grad, accumulated in fp32.
    Grid is (f_blocks, row_blocks) — rows iterate fastest, so the (c, fb)
    accumulator block stays VMEM-resident for a full row sweep."""
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    xf = x_ref[...].astype(jnp.float32)
    m, r = _stats(xf, eps)
    h = ((xf - m) * (r * s_ref[...]) + b_ref[...]).astype(dy_ref.dtype)
    dy = dy_ref[...]
    dw_ref[...] += jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)


# --- pallas_call wrappers ---------------------------------------------------

def _pad_rows(x, rb):
    n = x.shape[0]
    pad = (-n) % rb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=("eps", "dtype", "interpret"))
def ln_dense_pallas(x2, scale, bias, kernel, dbias, eps=1e-5, dtype=None,
                    interpret=False):
    n, c = x2.shape
    f = kernel.shape[1]
    dtype = dtype or x2.dtype
    rb = _rb_fwd(c, f, jnp.dtype(dtype).itemsize)
    xp = _pad_rows(x2, rb)
    grid = (xp.shape[0] // rb,)
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], f), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, scale[None, :], bias[None, :],
      kernel.astype(dtype), dbias[None, :])
    return out[:n]


@functools.partial(jax.jit, static_argnames=("eps", "dtype", "interpret"))
def ln_dense_pallas_bwd(x2, scale, bias, kernel, dy, eps=1e-5, dtype=None,
                        interpret=False):
    n, c = x2.shape
    f = kernel.shape[1]
    dtype = dtype or x2.dtype
    it = jnp.dtype(dtype).itemsize
    kb = kernel.astype(dtype)
    sc = scale[None, :].astype(jnp.float32)
    bi = bias[None, :].astype(jnp.float32)

    rb = _rb_dx(c, f, it)
    xp = _pad_rows(x2, rb)
    dyp = _pad_rows(dy, rb)
    grid = (xp.shape[0] // rb,)
    dx, ds, db = pl.pallas_call(
        functools.partial(_ln_dense_bwd_dx_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((xp.shape[0], c), x2.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xp, sc, kb, dyp)

    rb2, fb = _rb_dw(c, f, it)
    xp2 = _pad_rows(x2, rb2)
    dyp2 = _pad_rows(dy, rb2)
    grid2 = (f // fb, xp2.shape[0] // rb2)      # rows fastest per f-block
    dw, dc = pl.pallas_call(
        functools.partial(_ln_dense_bwd_dw_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((c, f), jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32)),
        grid=grid2,
        in_specs=[
            pl.BlockSpec((rb2, c), lambda fj, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda fj, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda fj, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb2, fb), lambda fj, ri: (ri, fj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c, fb), lambda fj, ri: (0, fj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda fj, ri: (0, fj),
                         memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xp2, sc, bi, dyp2)
    return dx[:n], ds[0], db[0], dw, dc[0]


# --- custom_vjp + dispatch --------------------------------------------------

# Default OFF: measured on a v5e (benchmarks/bench_fused_ln.py), XLA already
# runs LN+GEMM at ~the bare-GEMM rate for these shapes (LN marginal ~0.1 ms on
# a 1.1 ms qkv GEMM — its loop fusion hides the stats pass behind the MXU), so
# the Pallas composition is slower (1.16 vs 1.08 ms fwd). Kept as an opt-in
# experiment + the exact-flax reference path the layers now share.
_FUSED_ENABLED = False
_INTERPRET = False


def set_fused_ln_dense(enabled: bool):
    """Trace-time opt-in switch (default off — see module docstring). The
    kernels carry no custom_partitioning rules, so keep this off under a
    model axis (TP/SP); the reference path GSPMD can split."""
    global _FUSED_ENABLED
    _FUSED_ENABLED = bool(enabled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_dense_fused(x2, scale, bias, kernel, dbias, eps, dtype):
    return ln_dense_pallas(x2, scale, bias, kernel, dbias, eps, dtype,
                           interpret=_INTERPRET)


def _ln_dense_fused_fwd(x2, scale, bias, kernel, dbias, eps, dtype):
    out = ln_dense_pallas(x2, scale, bias, kernel, dbias, eps, dtype,
                          interpret=_INTERPRET)
    return out, (x2, scale, bias, kernel)


def _ln_dense_fused_bwd(eps, dtype, res, dy):
    x2, scale, bias, kernel = res
    dx, ds, db, dw, dc = ln_dense_pallas_bwd(x2, scale, bias, kernel, dy,
                                             eps, dtype,
                                             interpret=_INTERPRET)
    return (dx, ds.astype(scale.dtype), db.astype(bias.dtype),
            dw.astype(kernel.dtype), dc.astype(kernel.dtype))


_ln_dense_fused.defvjp(_ln_dense_fused_fwd, _ln_dense_fused_bwd)


def ln_dense(x, scale, bias, kernel, dbias, eps: float = 1e-5, dtype=None):
    """LayerNorm(x) @ kernel + dbias over the last axis of ``x``.

    x: (..., C); kernel: (C, F); scale/bias: (C,) fp32; dbias: (F,) fp32.
    ``dtype``: the module compute dtype (nn.Dense/nn.LayerNorm ``dtype``).
    Fused Pallas path on TPU when enabled and the weight fits VMEM,
    exact nn.LayerNorm/nn.Dense composition otherwise.
    """
    c = x.shape[-1]
    f = kernel.shape[1]
    dtype = jnp.dtype(dtype or x.dtype)
    x2 = x.reshape(-1, c)
    if (jax.default_backend() == "tpu" and _FUSED_ENABLED
            and ln_dense_fits(c, f, dtype.itemsize)):
        out = _ln_dense_fused(x2, scale, bias, kernel, dbias, eps, dtype)
    else:
        out = _ln_dense_ref(x2, scale, bias, kernel, dbias, eps, dtype)
    return out.reshape(x.shape[:-1] + (f,))
