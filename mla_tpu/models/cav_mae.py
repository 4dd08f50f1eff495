"""CAV-MAE fine-tuned audio-visual encoder (CAVMAEFT), Flax.

Reference: models/cav_mae.py:116-364 — per-modality 16x16 PatchEmbeds
(audio 1-ch over the (128, 1024) transposed fbank -> 8x64 = 512 patches,
cav_mae.py:129,190-193; visual 3-ch 224x224 -> 196 patches), learnable
modality embeddings + trainable sin-cos-initialized pos embeddings
(cav_mae.py:137-168), 11 modality-specific blocks + (12-11)=1 shared block
with per-modality LayerNorms (cav_mae.py:142-144), final norm_a/norm_v.

``forward_feat(a, v, mode in {'av','a','v'})`` (cav_mae.py:307-364) returns
token sequences. The reference's full ``forward`` modes (multimodal /
audioonly / videoonly / missing*) dereference ``self.norm`` / ``self.mlp_head``
which are commented out in its __init__ (cav_mae.py:146-149) and therefore
crash as shipped; here they are implemented *working*, with a real shared norm
and classification head, guarded by ``with_head``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.models.layers import CAVBlock, xavier_uniform
from mla_tpu.ops.pos_embed import get_2d_sincos_pos_embed_rect

Dtype = Any


def _sincos_init(grid_h: int, grid_w: int):
    def init(key, shape, dtype=jnp.float32):
        emb = get_2d_sincos_pos_embed_rect(shape[-1], grid_h, grid_w)
        return jnp.asarray(emb[None], dtype=dtype)
    return init


class PatchEmbed(nn.Module):
    """16x16 conv patchify, NHWC in -> (B, N, D) row-major tokens."""
    embed_dim: int = 768
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=xavier_uniform, dtype=self.dtype, name="proj")(x)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d)


class CAVMAEFT(nn.Module):
    label_dim: int = 6
    img_size: int = 224
    audio_length: int = 1024
    embed_dim: int = 768
    modality_specific_depth: int = 11
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    with_head: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.embed_dim
        self.patch_embed_a = PatchEmbed(d, dtype=self.dtype, name="patch_embed_a")
        self.patch_embed_v = PatchEmbed(d, dtype=self.dtype, name="patch_embed_v")
        num_patches_a = self.audio_length * 128 // 256        # cav_mae.py:129
        num_patches_v = (self.img_size // 16) ** 2
        self.modality_a = self.param("modality_a", nn.initializers.normal(0.02),
                                     (1, 1, d))
        self.modality_v = self.param("modality_v", nn.initializers.normal(0.02),
                                     (1, 1, d))
        # trainable, sin-cos initialized (tr_pos=True, cav_mae.py:137-140,161-166)
        self.pos_embed_a = self.param("pos_embed_a",
                                      _sincos_init(8, num_patches_a // 8),
                                      (1, num_patches_a, d))
        self.pos_embed_v = self.param("pos_embed_v",
                                      _sincos_init(self.img_size // 16,
                                                   self.img_size // 16),
                                      (1, num_patches_v, d))
        blk = lambda i, tag: CAVBlock(d, self.num_heads, self.mlp_ratio,
                                      dtype=self.dtype, name=f"blocks_{tag}_{i}")
        self.blocks_a = [blk(i, "a") for i in range(self.modality_specific_depth)]
        self.blocks_v = [blk(i, "v") for i in range(self.modality_specific_depth)]
        self.blocks_u = [blk(i, "u") for i in
                         range(self.depth - self.modality_specific_depth)]
        self.norm_a = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_a")
        self.norm_v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_v")
        if self.with_head:
            self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
            self.head_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                          name="mlp_head_norm")
            self.head = nn.Dense(self.label_dim, dtype=self.dtype,
                                 kernel_init=xavier_uniform, name="mlp_head")

    # -- embedding helpers --------------------------------------------------
    def _embed_a(self, a):
        """a: (B, T=1024, F=128) fbank. Reference: unsqueeze(1).transpose(2,3)
        -> (B, 1, 128, 1024) conv -> 8x64 grid row-major (cav_mae.py:190-193)."""
        x = jnp.transpose(a, (0, 2, 1))[..., None]   # (B, 128, 1024, 1) NHWC
        x = self.patch_embed_a(x.astype(self.dtype))
        return x + self.pos_embed_a + self.modality_a

    def _embed_v(self, v):
        """v: (B, 3, H, W) NCHW like the reference dataloader."""
        x = jnp.transpose(v, (0, 2, 3, 1))           # NHWC
        x = self.patch_embed_v(x.astype(self.dtype))
        return x + self.pos_embed_v + self.modality_v

    def _run(self, x, specific_blocks, modality):
        for blk in specific_blocks:
            x = blk(x)
        for blk in self.blocks_u:
            x = blk(x, modality)
        return x

    # -- public API ----------------------------------------------------------
    def forward_feat(self, a: Optional[jnp.ndarray], v: Optional[jnp.ndarray],
                     mode: str = "av"):
        """Token features per modality (cav_mae.py:307-364)."""
        if mode == "a":
            return self.norm_a(self._run(self._embed_a(a), self.blocks_a, "a"))
        if mode == "v":
            return self.norm_v(self._run(self._embed_v(v), self.blocks_v, "v"))
        if mode == "av":
            fa = self.norm_a(self._run(self._embed_a(a), self.blocks_a, "a"))
            fv = self.norm_v(self._run(self._embed_v(v), self.blocks_v, "v"))
            return fa, fv
        raise ValueError(f"unknown mode {mode}")

    def __call__(self, a, v, mode: str = "multimodal"):
        """Classification forward (cav_mae.py:187-304; fixed to be runnable)."""
        assert self.with_head, "construct CAVMAEFT(with_head=True) for forward()"
        if mode == "multimodal":
            xa = self._embed_a(a)
            xv = self._embed_v(v)
            for blk in self.blocks_a:
                xa = blk(xa)
            for blk in self.blocks_v:
                xv = blk(xv)
            x = jnp.concatenate([xa, xv], axis=1)
            for blk in self.blocks_u:
                x = blk(x)
            x = self.norm(x).mean(axis=1)
        elif mode == "audioonly":
            x = self.norm_a(self._run(self._embed_a(a), self.blocks_a, "a")).mean(axis=1)
        elif mode == "videoonly":
            x = self.norm_v(self._run(self._embed_v(v), self.blocks_v, "v")).mean(axis=1)
        elif mode in ("missingaudioonly", "missingvideoonly"):
            if mode == "missingaudioonly":
                feat = self._embed_a(a)
                for blk in self.blocks_a:
                    feat = blk(feat)
                tag, norm_m = "a", self.norm_a
            else:
                feat = self._embed_v(v)
                for blk in self.blocks_v:
                    feat = blk(feat)
                tag, norm_m = "v", self.norm_v
            u = feat
            for blk in self.blocks_u:
                u = blk(u)               # unified norms
            u = self.norm(u).mean(axis=1)
            m = feat
            for blk in self.blocks_u:
                m = blk(m, tag)          # modality-specific norms
            m = norm_m(m).mean(axis=1)
            x = (u + m) / 2.0
        else:
            raise ValueError(f"unknown mode {mode}")
        return self.head(self.head_norm(x))
