"""Direct Pallas 3x3 stride-1 conv for ResNet-18's body shape class.

Round-2/3 analysis (BASELINE.md "XLA-conv envelope") measured XLA's conv
codegen at ~69.6 TF/s on the dominant 3x3/64-128-channel stride-1 convs of
the CREMA-D flagship (reference backbone.py:149-158), ~38% of the chip's own
181.7 TF/s matmul rate, and showed every *graph-level* reformulation
(im2col, strided-slice matmul, space-to-depth, NCHW) loses to it. This
kernel is the remaining lever: an implicit-GEMM formulation built on one
layout fact — in NHWC, the innermost (W, C) dims flatten so that any run of
adjacent pixels is CONTIGUOUS in the lane dimension. A width-window of the
flat row is therefore a zero-copy GEMM operand:

  out pixels [P*j, P*j+P) of row h  =  sum_{dy=0..2}
      x_flat[h+dy, (P*j)*C : (P*j + P + 2)*C]  @  Wp[dy]

where P = pixels packed into the 128-lane output tile (P=2 for C=64, else 1)
and Wp[dy] is the (P+2)*C x P*F packed weight. Packing density:

  C=64:  K=256, 2-pixel pack, 6 of 8 64x64 blocks nonzero  -> 75%  dense
  C>=128: K=3*C, 1-pixel "pack",  all taps in-window       -> 100% dense

so the MXU ceiling is 0.75 * peak (C=64) / 1.0 * peak (C>=128) instead of
the ~38% XLA achieves — the zeros ride inside otherwise-dense MXU tiles and
contribute exact fp32 zeros (no numeric effect). The kernel grid is
(batch-block, width-window); each step issues 3 (Bt*H, K) @ (K, P*F) dots
accumulated in fp32, matching XLA's conv numerics (bf16 operands via the
TPU DEFAULT dot precision, fp32 accumulate).

Scope: stride 1, padding SAME(1), C == F (every stride-1 3x3 in BasicBlock;
stride-2 and 1x1 projection convs stay on XLA — ~15% of body FLOPs).
Backward: dx is the same conv with the kernel rotated 180 degrees and I/O
swapped (so it reuses this kernel); dw is XLA's conv-grad (a different,
K-huge shape class where XLA is already fine). Dispatch mirrors
ops/q8_matmul.py: Pallas on TPU when eligible, lax.conv fallback otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

# One grid step's VMEM working set budget (double-buffered x row-block +
# packed weights + out block + fp32 accumulator); v5e has ~16 MB.
_VMEM_BUDGET = 10 * 2 ** 20

# Test/dryrun hook: force interpret-mode Pallas on non-TPU backends so CPU
# meshes can exercise the kernel AND its custom_partitioning rule through
# the model path (PallasConv3x3 doesn't thread an interpret flag).
_FORCE_INTERPRET = False


def set_interpret(enable: bool):
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(enable)


def conv3x3_reference(x, kernel, *, compute_dtype=None):
    """lax conv with torch-equivalent SAME(1) padding — the XLA path this
    kernel replaces (models/resnet.py BasicBlock)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pack_weights(kernel, pack: int, compute_dtype=jnp.bfloat16):
    """(3, 3, C, F) HWIO -> (3, (pack+2)*C, pack*F) width-window layout.

    pack=1: Wp[dy] = kernel[dy] flattened dx-major — fully dense.
    pack=2: out slot p (columns p*F:(p+1)*F) taps window pixels p..p+2 with
    dx = slot - p; the 2 off-support blocks stay zero (75% density).
    """
    _, _, c, f = kernel.shape
    k = kernel.astype(compute_dtype)
    if pack == 1:
        return k.reshape(3, 3 * c, f)
    wp = jnp.zeros((3, (pack + 2) * c, pack * f), compute_dtype)
    for p in range(pack):
        for dx in range(3):
            slot = p + dx
            wp = wp.at[:, slot * c:(slot + 1) * c, p * f:(p + 1) * f].set(
                k[:, dx])
    return wp


def _kernel_flat(x_ref, w_ref, o_ref, *, h_out, win, flatten):
    """One (batch-block, width-window) step: 3 dy-tap dots into fp32.

    x_ref: (Bt, H+2, Wrow) compute-dtype row block (full padded width)
    w_ref: (3, win, gout) packed weights
    o_ref: (Bt, H, gout) output window
    """
    bt = x_ref.shape[0]
    gout = o_ref.shape[2]
    off = pl.multiple_of(pl.program_id(1) * gout, 128)
    if flatten:
        acc = jnp.zeros((bt * h_out, gout), jnp.float32)
        for dy in range(3):
            a = x_ref[:, dy:dy + h_out, pl.ds(off, win)]
            acc += jax.lax.dot_general(
                a.reshape(bt * h_out, win), w_ref[dy],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc.reshape(bt, h_out, gout).astype(o_ref.dtype)
    else:
        for b in range(bt):
            acc = jnp.zeros((h_out, gout), jnp.float32)
            for dy in range(3):
                a = x_ref[b, dy:dy + h_out, pl.ds(off, win)]
                acc += jax.lax.dot_general(
                    a, w_ref[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[b] = acc.astype(o_ref.dtype)


def _choose_bt(b, h, w_in_pix, c, pack, f, compute_dtype):
    """Largest batch block whose working set fits the VMEM budget."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    row = w_in_pix * c * itemsize
    gout = pack * f
    for bt in (32, 16, 8, 4, 2, 1):
        x_blk = bt * (h + 2) * row * 2              # double-buffered
        o_blk = bt * h * gout * 4 * 2
        acc = bt * h * gout * 4
        wts = 3 * (pack + 2) * c * gout * itemsize * 2
        if x_blk + o_blk + acc + wts <= _VMEM_BUDGET:
            return bt
    return 1


@functools.partial(
    jax.jit, static_argnames=("pack", "bt", "flatten", "interpret",
                              "compute_dtype"))
def _conv3x3_pallas(x, kernel, pack, bt, flatten, interpret, compute_dtype):
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    gout = pack * f
    w2 = -(-w // pack)                      # output windows per row
    pad_r = pack * w2 - w + 1               # 1 halo + pack-alignment
    bp = -(-b // bt) * bt
    xp = jnp.pad(x.astype(compute_dtype),
                 ((0, bp - b), (1, 1), (1, pad_r), (0, 0)))
    xp = xp.reshape(bp, h + 2, (w + 1 + pad_r) * c)
    wp = pack_weights(kernel, pack, compute_dtype)
    kern = functools.partial(_kernel_flat, h_out=h, win=(pack + 2) * c,
                             flatten=flatten)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bp, h, w2 * gout), x.dtype),
        grid=(bp // bt, w2),
        in_specs=[
            pl.BlockSpec((bt, h + 2, (w + 1 + pad_r) * c),
                         lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, (pack + 2) * c, gout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, gout), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wp)
    return out.reshape(bp, h, w2 * pack, f)[:b, :, :w]


def _eligible(x, kernel):
    if x.ndim != 4 or kernel.shape[:2] != (3, 3):
        return None
    c, f = kernel.shape[2], kernel.shape[3]
    if x.shape[-1] != c or c != f or c not in (64, 128, 256, 512):
        return None
    return 2 if c == 64 else 1


def _conv_local(x, kernel, interpret, compute_dtype, flatten=True,
                bt=None):
    """The single-shard Pallas path: block chooser + width-window kernel.
    Callers guarantee eligibility (shape class + TPU/interpret)."""
    pack = _eligible(x, kernel)
    if bt is None:
        w = x.shape[2]
        pad_r = pack * -(-w // pack) - w + 1
        bt = _choose_bt(x.shape[0], x.shape[1], w + 1 + pad_r,
                        x.shape[3], pack, kernel.shape[-1], compute_dtype)
    return _conv3x3_pallas(x, kernel, pack, bt, flatten, interpret,
                           compute_dtype)


# -- multi-chip legality (custom_partitioning, the ops/attention.py pattern) --
# A bare pallas_call is opaque to GSPMD: under a device mesh the partitioner
# would replicate/gather the operands around it. The conv is embarrassingly
# parallel over batch (stride-1 SAME is per-image independent), so teach the
# partitioner exactly that: each shard runs the same kernel on its local
# batch block; H/W/C stay kernel-local (the width-window needs whole rows)
# and the weight is replicated. dx in the custom VJP is the same conv on the
# rotated kernel, so the backward inherits the rule for free; dw is XLA's
# conv-grad, which GSPMD already knows how to shard.

def _batch_only(sharding):
    """Sharding with only the batch axis kept (H/W/C kernel-local)."""
    if not isinstance(sharding, NamedSharding):
        raise TypeError(
            "conv3x3 custom_partitioning expected a NamedSharding, got "
            f"{type(sharding).__name__}; wrap the call site in a "
            "Mesh/NamedSharding context (or replicate the operands)")
    b = sharding.spec[0] if len(sharding.spec) else None
    return NamedSharding(sharding.mesh, PartitionSpec(b))


def _conv_sp_infer(*args):
    arg_shapes = args[-2]
    return _batch_only(arg_shapes[0].sharding)


# Diagnostic: how many times the partitioner invoked the conv's partition
# rule (i.e. the kernel was actually partitioned, not replicated around) —
# dryrun/test proof that DP keeps the conv Pallas-per-shard.
sp_partition_calls = 0


def _conv_sp_partition(interpret, compute_dtype, mesh, arg_shapes,
                       result_shape):
    global sp_partition_calls
    sp_partition_calls += 1

    def lower(x, kernel):
        return _conv_local(x, kernel, interpret, compute_dtype)
    return (mesh, lower, _batch_only(result_shape.sharding),
            (_batch_only(arg_shapes[0].sharding),
             NamedSharding(arg_shapes[1].sharding.mesh, PartitionSpec())))


conv3x3_sp = custom_partitioning(
    lambda x, kernel, interpret=False, compute_dtype=jnp.bfloat16:
        _conv_local(x, kernel, interpret, compute_dtype),
    static_argnums=(2, 3))
conv3x3_sp.def_partition(
    partition=_conv_sp_partition,
    infer_sharding_from_operands=_conv_sp_infer,
    sharding_rule="b h w c, u v c f -> b h w f")


def conv3x3(x, kernel, *, flatten: bool = True, interpret: bool = False,
            compute_dtype=jnp.bfloat16, bt: int | None = None):
    """3x3 stride-1 SAME conv, NHWC x (3,3,C,F) HWIO -> NHWC.

    Pallas width-window kernel on TPU for the eligible shape class
    (C == F in {64,128,256,512}); lax.conv otherwise. compute_dtype=bf16
    matches XLA's TPU DEFAULT conv precision; fp32 is exact (CPU tests).
    flatten selects the (Bt*H, K) single-dot variant over per-image dots.
    Under a multi-device runtime the call routes through conv3x3_sp so
    GSPMD batch-shards it instead of treating the pallas_call as opaque
    (bt/flatten overrides are single-device bench knobs and pin the local
    path). Forward only — training routes through conv3x3_vjp.
    """
    interpret = interpret or _FORCE_INTERPRET
    pack = _eligible(x, kernel)
    on_tpu = jax.default_backend() == "tpu" or interpret
    if pack is None or not on_tpu:
        return conv3x3_reference(x, kernel)
    if jax.device_count() > 1 and bt is None and flatten:
        return conv3x3_sp(x, kernel, interpret, compute_dtype)
    return _conv_local(x, kernel, interpret, compute_dtype, flatten, bt)


def _rot180_swap(kernel):
    """(3,3,C,F) -> (3,3,F,C): the dx-conv kernel (taps rotated 180, input
    and output channels swapped) — d/dx of SAME 3x3 s1 is itself one."""
    return jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_vjp(x, kernel, interpret=False, compute_dtype=jnp.bfloat16):
    """conv3x3 with a Pallas backward: dx reuses the same kernel (rotated
    weights); dw = XLA's conv-grad (K-huge reduction shape class)."""
    return conv3x3(x, kernel, interpret=interpret,
                   compute_dtype=compute_dtype)


def _fwd(x, kernel, interpret, compute_dtype):
    return conv3x3_vjp(x, kernel, interpret, compute_dtype), (x, kernel)


def _bwd(interpret, compute_dtype, res, g):
    x, kernel = res
    dx = conv3x3(g, _rot180_swap(kernel), interpret=interpret,
                 compute_dtype=compute_dtype)
    dw = jax.vjp(lambda k: conv3x3_reference(x, k), kernel)[1](g)[0]
    return dx, dw


conv3x3_vjp.defvjp(_fwd, _bwd)


def flops(b, h, w, c, f):
    """Useful conv FLOPs (for TF/s reporting; excludes pack-padding)."""
    return 2 * b * h * w * 9 * c * f


__all__ = ["conv3x3", "conv3x3_vjp", "conv3x3_reference", "pack_weights",
           "flops"]
