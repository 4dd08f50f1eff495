"""M3AE (Masked Multimodal Autoencoder) encoder, Flax.

Reference: models/m3ae.py:271-370 — BERT-vocab (30522) text embedding,
linear image-patch embedding (768 -> emb_dim), per-modality type embeddings,
CLS token, pre-LN Transformer with -1e7 padding-mask attention, final LN.
``forward_representation`` concatenates [CLS, image tokens, text tokens]
(m3ae.py:342-370); either modality may be absent (static choice -> its own
compiled graph). Size configs small/base/large/huge/debug (m3ae.py:226-268).

The reference was itself ported *from* JAX/Flax (the original param mapping is
documented in comments at m3ae.py:422-467); this module restores the natural
Flax layout. Pos embeddings are fixed sin-cos tables baked in as constants.

Init parity quirks kept: text embedding ~ N(0, 1) (m3ae.py:317); cls/type
embeddings use torch ``.normal_(0.02)`` which is mean=0.02, std=1.0
(m3ae.py:322-330) — NOT std=0.02.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mla_tpu.models.layers import M3AEBlock, xavier_uniform
from mla_tpu.ops.pos_embed import (get_1d_sincos_pos_embed,
                                   get_2d_sincos_pos_embed_square)
from mla_tpu.ops.q8_matmul import q8_matmul

Dtype = Any

# model_type -> (emb_dim, depth, num_heads, mlp_ratio)  (m3ae.py:226-268)
M3AE_CONFIGS = {
    "small": (384, 12, 6, 4),
    "base": (768, 12, 12, 4),
    "base1": (768, 1, 12, 4),    # CI knob: base width (the head widths the
                                 # reference hardcodes) at depth 1 — used by
                                 # the E2E A/B vs the torch reference
    "large": (1024, 24, 16, 4),
    "huge": (1280, 32, 16, 4),
    "debug": (1024, 2, 16, 4),
}


def _mean_offset_normal(mean: float, std: float):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * nn.initializers.normal(1.0)(key, shape, dtype)
    return init


@dataclasses.dataclass(frozen=True)
class M3AEConfig:
    model_type: str = "base"
    text_vocab_size: int = 30522
    use_type_embedding: bool = True
    scan_unroll: int = 1        # lax.scan unroll factor (compile/runtime
                                # trade; see core/config.py scan_unroll)
    scan_blocks: bool = False   # lax.scan over a stacked block: ~depth-x
                                # smaller HLO -> 9 s cold train-step compile
                                # vs minutes unrolled (measured on the v5e
                                # relay), at +46% step time (the while-loop
                                # blocks XLA's cross-block scheduling) —
                                # dev/CI iteration knob. Params live stacked
                                # under 'blocks' (L, ...); convert layouts
                                # with pp.to_scan_layout/from_scan_layout.
    remat_blocks: bool = False  # jax.checkpoint each block inside the scan:
                                # the backward recomputes block activations
                                # instead of storing all `depth` residual
                                # sets — the single-chip memory lever for
                                # the large/huge sizes. Requires scan_blocks.
    remat_policy: str = "full"  # 'full': recompute everything (max memory
                                # win); 'dots': save the four GEMM outputs
                                # per block (dots_with_no_batch_dims_
                                # saveable) so the backward recomputes only
                                # LN/gelu/attention — buys back most of the
                                # remat FLOP tax (core/config.py
                                # remat_policy).

    @property
    def emb_dim(self):
        return M3AE_CONFIGS[self.model_type][0]

    @property
    def depth(self):
        return M3AE_CONFIGS[self.model_type][1]

    @property
    def num_heads(self):
        return M3AE_CONFIGS[self.model_type][2]

    @property
    def mlp_ratio(self):
        return M3AE_CONFIGS[self.model_type][3]


class M3AEEncoder(nn.Module):
    config: M3AEConfig = M3AEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        if c.remat_blocks and not c.scan_blocks:
            # CLI configs validate this; direct M3AEConfig users must not
            # silently lose the advertised memory lever
            raise ValueError("remat_blocks requires scan_blocks (the remat "
                             "wrapper lives on the scanned cell)")
        if c.remat_policy not in ("full", "dots"):
            raise ValueError(f"remat_policy must be 'full' or 'dots', got "
                             f"{c.remat_policy!r}")
        # Embedding params declared eagerly (fixed shapes) so a single instance
        # supports text-only, image-only and joint calls with one param tree.
        self.text_embedding_table = self.param(
            "text_embedding", nn.initializers.normal(1.0),
            (c.text_vocab_size, c.emb_dim))
        self.image_kernel = self.param("image_kernel", xavier_uniform,
                                       (768, c.emb_dim))
        self.image_bias = self.param("image_bias", nn.initializers.zeros,
                                     (c.emb_dim,))
        init0202 = _mean_offset_normal(0.02, 1.0)
        self.cls_token = self.param("cls_token", init0202, (1, 1, c.emb_dim))
        if c.use_type_embedding:
            self.encoder_image_type_embedding = self.param(
                "encoder_image_type_embedding", init0202, (1, 1, c.emb_dim))
            self.encoder_text_type_embedding = self.param(
                "encoder_text_type_embedding", init0202, (1, 1, c.emb_dim))
        if c.scan_blocks:
            # One lifted block scanned depth times: params stack on axis 0
            # (identical math to the unrolled stack; HLO is ~depth-x smaller,
            # which cuts cold XLA compiles of the ViT-Base step from minutes
            # to tens of seconds). Same stacked layout pp consumes.
            if c.remat_blocks:
                policy = None if c.remat_policy == "full" else \
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                cell = nn.remat(M3AEBlock, policy=policy)
            else:
                cell = M3AEBlock
            self.blocks_scanned = nn.scan(
                cell,
                # 'q8': per-layer int8 dequant scales ride the same stacked
                # axis as the params they belong to (int8 serving artifacts;
                # runtime/export.py split_q8). A no-op when absent.
                variable_axes={"params": 0, "q8": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=c.depth,
                unroll=c.scan_unroll,
            )(c.emb_dim, c.num_heads, c.mlp_ratio, dtype=self.dtype,
              scan_cell=True, name="blocks")
        else:
            self.blocks = [
                M3AEBlock(c.emb_dim, c.num_heads, c.mlp_ratio,
                          dtype=self.dtype, name=f"block_{i}")
                for i in range(c.depth)]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="final_norm")

    def __call__(self, image: Optional[jnp.ndarray], text: Optional[jnp.ndarray],
                 text_padding_mask: Optional[jnp.ndarray] = None):
        """forward_representation (m3ae.py:342-370).

        image: (B, N_img, 768) pre-patchified pixels or None
        text:  (B, L) int token ids or None
        text_padding_mask: (B, L) float, 1 = padded
        returns (B, 1 + N_img + L, emb_dim) token features.
        """
        x, padding_mask = self.embed(image, text, text_padding_mask)
        if self.config.scan_blocks:
            from mla_tpu.parallel import pp
            tc = pp.train_config()
            if tc is not None and not self.is_initializing():
                # --pp_microbatches: drive the stacked stack through the
                # GPipe schedule (parallel/pp.py) — stage s holds its rows of
                # the (L, ...) block params (sharded by pp.shard_state_train)
                # and the activations hop stages over ICI. Trace-time switch,
                # like sp.constrain.
                c = self.config
                # parent=None: a detached template the pipeline block.apply's
                # with each stage's param rows — not a submodule of this one
                block = M3AEBlock(c.emb_dim, c.num_heads, c.mlp_ratio,
                                  dtype=self.dtype, parent=None)
                stacked = self.variables["params"]["blocks"]
                mesh, n_micro, remat = tc
                x = pp.pipeline_blocks(block, stacked, x, padding_mask, mesh,
                                       n_micro, remat=remat)
            elif (not self.is_initializing() and self._blocks_q8_stacked()):
                x = self._q8_stacked_scan(x, padding_mask)
            else:
                x, _ = self.blocks_scanned(x, padding_mask)
        else:
            for blk in self.blocks:
                x = blk(x, padding_mask)
        return self.final_norm(x)

    def _blocks_q8_stacked(self) -> bool:
        """True when the restored block stack carries stacked int8 kernels —
        an --export_dtype int8/int8_a8 + --scan_blocks serving artifact
        (runtime/export.py:split_q8 keeps the (L, K, N) layer axis). W8A8
        rides the same path since round 5: the stacked GEMM and the fused
        MLP both have s8 x s8 variants (ops/q8_matmul.py a8=True), so a8
        gets the in-place stacked weight reads AND the int8 MXU rate."""
        try:
            k = self.variables["params"]["blocks"]["attn"]["qkv"]["kernel"]
        except (KeyError, TypeError):
            return False
        return getattr(k, "ndim", 0) == 3 and k.dtype == jnp.int8

    def _q8_stacked_scan(self, x, padding_mask):
        """int8 scan-blocks serving: lax.scan over a detached block template
        (the pp-branch pattern) with the big int8 kernel stacks passed WHOLE.

        nn.scan's variable_axes={'params': 0} slices every leaf per layer
        inside the scan body, and a Pallas custom call can only consume that
        slice after an HBM->HBM materialization (~+1 byte/weight of traffic;
        BASELINE.md "Round-4/5" int8 ladder). Here only the small float leaves
        (LN scales, biases) are sliced; the (L, K, N) int8 kernels stay whole
        and QDense reads the current layer's tiles in place via Pallas scalar
        prefetch (ops/q8_matmul.py:q8_matmul_stacked), keyed by the
        loop-carried layer id published through layers.q8_stacked_layer."""
        from mla_tpu.models import layers as layers_mod
        c = self.config
        block = M3AEBlock(c.emb_dim, c.num_heads, c.mlp_ratio,
                          dtype=self.dtype, parent=None)
        stacked = self.variables["params"]["blocks"]
        scales = self.variables["q8"]["blocks"]

        def body(carry, _):
            xc, li = carry
            per_layer = jax.tree.map(
                lambda a: a if a.dtype == jnp.int8
                else jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
                stacked)
            prev = layers_mod.q8_stacked_layer
            layers_mod.q8_stacked_layer = li
            try:
                y = block.apply({"params": per_layer, "q8": scales}, xc,
                                padding_mask)
            finally:
                layers_mod.q8_stacked_layer = prev
            return (y, li + 1), None

        (x, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), None,
                                 length=c.depth)
        return x

    # Split entry points for pipeline parallelism (parallel/pp.py): ``embed``
    # covers everything before the block stack, ``finalize`` everything after.
    # __call__ == finalize(blocks(embed(...))) — pp drives the block stack
    # itself via pipeline_blocks over the stacked block params.
    def embed(self, image, text, text_padding_mask=None):
        c = self.config
        assert image is not None or text is not None
        batch = image.shape[0] if image is not None else text.shape[0]
        parts = [jnp.broadcast_to(self.cls_token,
                                  (batch, 1, c.emb_dim)).astype(self.dtype)]
        masks = [jnp.zeros((batch, 1), dtype=jnp.float32)]
        if image is not None:
            pos = jnp.asarray(
                get_2d_sincos_pos_embed_square(c.emb_dim, image.shape[1]))
            if self.image_kernel.dtype == jnp.int8:
                # int8 serving artifact (export.split_q8): dequant-fused GEMM
                sc = self.get_variable("q8", "image_kernel_scale")
                proj = q8_matmul(image, self.image_kernel,
                                 sc).astype(self.dtype)
            else:
                proj = jnp.matmul(
                    image.astype(self.dtype),
                    self.image_kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
            x = (proj + self.image_bias.astype(self.dtype)) + pos
            if c.use_type_embedding:
                x = x + self.encoder_image_type_embedding
            parts.append(x.astype(self.dtype))
            masks.append(jnp.zeros((batch, image.shape[1]),
                                   dtype=jnp.float32))
        if text is not None:
            pos = jnp.asarray(get_1d_sincos_pos_embed(c.emb_dim, text.shape[1]))
            tbl = self.text_embedding_table
            if tbl.dtype == jnp.int8:
                # int8 table with per-ROW scales: gather the (B, L) rows
                # int8-side, dequantize only the gathered slice — the full
                # (vocab, emb) table never materializes in float.
                sc = self.get_variable("q8", "text_embedding_scale")
                emb = (jnp.take(tbl, text, axis=0).astype(jnp.float32)
                       * jnp.take(sc.reshape(-1), text, axis=0)[..., None])
                x = emb + pos
            else:
                from mla_tpu.parallel import fsdp
                # identity unless --fsdp installed the batch constraint —
                # keeps the lookup's cotangent batch-sharded so the
                # embedding-grad scatter partitions cleanly (fsdp.py)
                x = fsdp.constrain_embed(jnp.take(tbl, text, axis=0)) + pos
            if c.use_type_embedding:
                x = x + self.encoder_text_type_embedding
            parts.append(x.astype(self.dtype))
            if text_padding_mask is None:
                text_padding_mask = jnp.zeros(text.shape, dtype=jnp.float32)
            masks.append(text_padding_mask.astype(jnp.float32))
        return jnp.concatenate(parts, axis=1), jnp.concatenate(masks, axis=1)

    def finalize(self, x):
        return self.final_norm(x)
