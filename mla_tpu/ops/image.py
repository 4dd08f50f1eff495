"""Fused device-side image pipeline: crop + resize + flip + normalize.

The reference runs torchvision CPU transforms inside 32 DataLoader workers
(reference: dataset/dataset.py:129-140 RandomResizedCrop/HFlip/Normalize,
dataset.py:251-256 Resize-256->CenterCrop bicubic, m3ae path dataset.py:401-420).
TPU-native design: the host only decodes JPEG to uint8 HWC; crop boxes / flip
flags are sampled per-sample (numpy RNG, seed-deterministic) and the actual
crop+resize+flip+normalize runs on-device as one jitted, vmapped
``scale_and_translate`` — a gather+matmul XLA lowers well, with the normalize
fused in. Static output shapes keep everything MXU/VPU-tileable.

Crop semantics match torchvision:
  - RandomResizedCrop: 10 attempts of area in scale*(H*W), log-uniform aspect
    in ratio, fallback to center crop clamped to ratio (torchvision .get_params)
  - Resize(short side) + CenterCrop expressed as a single crop box
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
# CAV path uses the 4-decimal variants (dataset.py:253-255) — numerically equal
# at float32 for mean, std differs in the 4th decimal (0.2250 vs 0.225 for B).
CAV_MEAN = np.array([0.4850, 0.4560, 0.4060], dtype=np.float32)
CAV_STD = np.array([0.2290, 0.2240, 0.2250], dtype=np.float32)


# ---------------------------------------------------------------------------
# Host-side crop-parameter sampling (cheap, shape-only; numpy for determinism)
# ---------------------------------------------------------------------------

def random_resized_crop_params(rng: np.random.Generator, height: int, width: int,
                               scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.)):
    """One (i, j, h, w) crop box, torchvision RandomResizedCrop.get_params."""
    area = height * width
    log_ratio = np.log(np.array(ratio))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect_ratio = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(np.sqrt(target_area * aspect_ratio)))
        h = int(round(np.sqrt(target_area / aspect_ratio)))
        if 0 < w <= width and 0 < h <= height:
            i = int(rng.integers(0, height - h + 1))
            j = int(rng.integers(0, width - w + 1))
            return i, j, h, w
    # fallback: center crop clamped to ratio
    in_ratio = float(width) / float(height)
    if in_ratio < min(ratio):
        w = width
        h = int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        h = height
        w = int(round(h * max(ratio)))
    else:
        w = width
        h = height
    i = (height - h) // 2
    j = (width - w) // 2
    return i, j, h, w


def resize_center_crop_box(height: int, width: int, resize_short: int,
                           crop: int) -> Tuple[float, float, float, float]:
    """Resize(short side)=resize_short then CenterCrop(crop), as one source box.

    Returns a float (i, j, h, w) box in source pixels whose resize to
    (crop, crop) reproduces the two-stage transform.
    """
    short = min(height, width)
    scale = resize_short / short
    # size of the crop window in source pixels
    h = crop / scale
    w = crop / scale
    i = (height - h) / 2.0
    j = (width - w) / 2.0
    return i, j, h, w


# ---------------------------------------------------------------------------
# Device-side fused kernel
# ---------------------------------------------------------------------------

def _crop_resize_one(img, box, out_hw, method):
    """img: (H, W, C) float32; box: (i, j, h, w) float32."""
    i, j, h, w = box[0], box[1], box[2], box[3]
    oh, ow = out_hw
    scale = jnp.stack([oh / h, ow / w])
    translation = jnp.stack([-i * oh / h, -j * ow / w])
    return jax.image.scale_and_translate(
        img, (oh, ow, img.shape[-1]), (0, 1), scale, translation,
        method=method, antialias=True)


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "to_chw"))
def crop_resize_normalize(images_u8: jnp.ndarray,
                          boxes: jnp.ndarray,
                          flip: jnp.ndarray,
                          mean: jnp.ndarray,
                          std: jnp.ndarray,
                          out_hw: Tuple[int, int] = (224, 224),
                          method: str = "linear",
                          to_chw: bool = True) -> jnp.ndarray:
    """Fused per-batch: uint8 HWC -> crop+resize -> flip -> (x/255 - mean)/std.

    images_u8: (B, H, W, C) uint8;  boxes: (B, 4) float32 (i, j, h, w);
    flip: (B,) bool. Returns (B, C, oh, ow) if to_chw else (B, oh, ow, C).

    NOTE: the production datasets go through the richer
    data/transforms.py:image_batch_transform (adds color jitter and the
    dtype plumbing); this is the minimal standalone API. The clip matches
    that path — PIL clamps resampling overshoot to uint8 range.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    out = jax.vmap(lambda im, b: _crop_resize_one(im, b, out_hw, method))(x, boxes)
    out = jnp.clip(out, 0.0, 1.0)
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    out = (out - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)
    if to_chw:
        out = jnp.transpose(out, (0, 3, 1, 2))
    return out


def patchify(images: jnp.ndarray, patch: int = 16) -> jnp.ndarray:
    """(B, C, H, W) -> (B, h*w, C*p*p) — einops 'b c (h p1)(w p2)->b (h w)(c p1 p2)'
    as in the reference M3AE classifier (basic_model.py:184-186)."""
    b, c, h, w = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # b gh gw c p1 p2
    return x.reshape(b, gh * gw, c * patch * patch)
