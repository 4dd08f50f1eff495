"""Tuning experiment for the Pallas attention backward (VERDICT r1 #6).

Hypothesis from round 1: the ~20x slowdown vs XLA's fused attention grad at
S=513/D=64 comes from the Mosaic lowering of the transposed contractions
((0,0) dimension numbers for dk/dv) and/or the D=64 (half-lane) operand tiles.
Variants measured here on the real chip:

  A  baseline   — the shipped _attn_bwd_kernel ((0,0) dots, D as-is)
  B  transpose  — materialize p.T / ds.T in VMEM, use standard (1,1)/last-dim
                  contractions for dk/dv
  C  dpad128    — pad D 64->128 outside the kernel (zero columns), baseline dots
  D  both       — transpose + D padded to 128
  X  xla        — jax.vjp of the plain-XLA reference (the production backward)

Timing forces a host read through a serial dependency chain (axon relay's
block_until_ready is unreliable; see BASELINE.md).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mla_tpu.ops import attention as att

_NEG = -1e7


def _bwd_kernel_transpose(q_ref, k_ref, v_ref, do_ref, mask_ref,
                          dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0]

    scores = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask > 0, _NEG, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)

    dq_ref[0, 0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)
    # explicit VMEM transposes -> standard row-major contractions
    ds_t = ds.T
    p_t = p.T
    dk_ref[0, 0] = (jnp.dot(ds_t, q, preferred_element_type=jnp.float32)
                    * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = jnp.dot(p_t, do,
                           preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _run_pallas_bwd(kernel, q, k, v, do, mask, scale, dpad=None):
    b, h, s, d = q.shape
    d_orig = d
    if dpad is not None and d < dpad:
        padw = [(0, 0)] * 3 + [(0, dpad - d)]
        q, k, v, do = (jnp.pad(x, padw) for x in (q, k, v, do))
        d = dpad
    qp = att._pad_to(q, 2, att._QBLOCK)
    kp = att._pad_to(k, 2, att._QBLOCK)
    vp = att._pad_to(v, 2, att._QBLOCK)
    dop = att._pad_to(do, 2, att._QBLOCK)
    mp = att._pad_to(mask.astype(jnp.float32), 1, att._QBLOCK)
    if mp.shape[1] != s:
        mp = mp.at[:, s:].set(1.0)
    mp = mp[:, None, :]
    sp = qp.shape[2]
    sspec = pl.BlockSpec((1, 1, sp, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),) * 3,
        grid=(b, h),
        in_specs=[sspec, sspec, sspec, sspec,
                  pl.BlockSpec((1, 1, sp), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(sspec, sspec, sspec),
    )(qp, kp, vp, dop, mp)
    return (dq[:, :, :s, :d_orig], dk[:, :, :s, :d_orig],
            dv[:, :, :s, :d_orig])


def time_fn(fn, *args, iters=50):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[0, 0, 0, :1]), out)  # warm
    t0 = time.perf_counter()
    chain = args[0]
    for _ in range(iters):
        o = fn(chain, *args[1:])
        chain = o[0]  # serial dependency
    np.asarray(chain[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, H, S, D = 2, 12, 513, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
    do = jax.random.normal(kd, (B, H, S, D), jnp.bfloat16)
    mask = jnp.zeros((B, S), jnp.float32).at[:, 500:].set(1.0)
    scale = D ** -0.5

    # ground truth via XLA vjp
    def xla_bwd(q_, k_, v_, do_):
        _, vjp = jax.vjp(
            lambda a, b_, c: att.attention_reference(a, b_, c, mask), q_, k_, v_)
        return vjp(do_)
    xla_bwd_j = jax.jit(xla_bwd)
    ref = xla_bwd_j(q, k, v, do)

    variants = {
        "A_baseline": jax.jit(lambda q_, k_, v_, do_: _run_pallas_bwd(
            att._attn_bwd_kernel, q_, k_, v_, do_, mask, scale)),
        "B_transpose": jax.jit(lambda q_, k_, v_, do_: _run_pallas_bwd(
            _bwd_kernel_transpose, q_, k_, v_, do_, mask, scale)),
        "C_dpad128": jax.jit(lambda q_, k_, v_, do_: _run_pallas_bwd(
            att._attn_bwd_kernel, q_, k_, v_, do_, mask, scale, dpad=128)),
        "D_both": jax.jit(lambda q_, k_, v_, do_: _run_pallas_bwd(
            _bwd_kernel_transpose, q_, k_, v_, do_, mask, scale, dpad=128)),
    }

    tx = time_fn(xla_bwd_j, q, k, v, do)
    print(f"X_xla        {tx:8.2f} ms")
    for name, fn in variants.items():
        try:
            out = fn(q, k, v, do)
            errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                          - b.astype(jnp.float32))))
                    for a, b in zip(out, ref)]
            t = time_fn(fn, q, k, v, do)
            print(f"{name:12s} {t:8.2f} ms  ({t / tx:5.1f}x XLA)  "
                  f"max|d|={max(errs):.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
