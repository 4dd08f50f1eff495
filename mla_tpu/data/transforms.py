"""Per-dataset device-side batch transforms.

Host workers only decode (JPEG -> uint8 canonical-size HWC) and sample crop
geometry; everything pixel-math (crop+resize+flip+normalize+color-jitter+
SpecAug) runs fused on-device per batch (mla_tpu/ops/image.py, specaug.py).

vs the reference (torchvision/PIL inside 32 DataLoader workers,
dataset.py:129-140,251-256,401-420): crops are sampled in ORIGINAL image
coordinates with torchvision's exact parameter laws, then mapped into the
canonical decode size — one extra resample vs cropping the original, traded
for a fully static-shape device pipeline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.ops import image as im
from mla_tpu.ops import specaug as sa
from mla_tpu.ops.fbank import normalize_fbank

CANONICAL = {224: 256, 256: 288,
             32: 48, 64: 96}   # host decode size per target crop (small
                               # entries: test/CI-sized adapters)


def scale_box(box, orig_hw, canon: int):
    """Map an (i, j, h, w) box from original to canonical coordinates."""
    i, j, h, w = box
    oh, ow = orig_hw
    return (i * canon / oh, j * canon / ow, h * canon / oh, w * canon / ow)


def host_decode(path: str, canon) -> Tuple[np.ndarray, Tuple[int, int]]:
    """JPEG -> uint8 (h, w, 3) + original size; canon is int (square) or
    (h, w). Raises on a missing/corrupt file — the caller decides the
    zero-slot policy (native_loader.decode_jpeg_batch)."""
    import cv2
    h, w = (canon, canon) if isinstance(canon, int) else canon
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        from PIL import Image
        pil = Image.open(path).convert("RGB")
        img = np.asarray(pil)[:, :, ::-1]
    hw = img.shape[:2]
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    return np.ascontiguousarray(img[:, :, ::-1]), hw   # BGR->RGB


# ---------------------------------------------------------------------------
# color jitter (timm create_transform(color_jitter=True) => torchvision
# ColorJitter(0.4, 0.4, 0.4) applied in random order — dataset.py:401-412)
# ---------------------------------------------------------------------------

# numpy on purpose: a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize() ordering
_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


def _jitter_one(key, x):
    """x: (H, W, 3) float in [0,1]."""
    kf, ko = jax.random.split(key)
    f = jax.random.uniform(kf, (3,), minval=0.6, maxval=1.4)
    order = jax.random.permutation(ko, 3)

    def brightness(y):
        return y * f[0]

    def contrast(y):
        mean = jnp.mean(y @ _GRAY)
        return y * f[1] + (1 - f[1]) * mean

    def saturation(y):
        gray = (y @ _GRAY)[..., None]
        return y * f[2] + (1 - f[2]) * gray

    def apply(i, y):
        return jax.lax.switch(order[i], [brightness, contrast, saturation], y)

    y = apply(0, x)
    y = apply(1, y)
    y = apply(2, y)
    return jnp.clip(y, 0.0, 1.0)


def color_jitter_batch(key, x):
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(_jitter_one)(keys, x)


# ---------------------------------------------------------------------------
# fused batch transforms
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("out", "method", "jitter", "out_dtype"))
def image_batch_transform(images_u8, boxes, flip, key, mean, std,
                          out: int = 224, method: str = "linear",
                          jitter: bool = False, out_dtype=None):
    """(B, C?, H, W, 3) or (B, H, W, 3) uint8 -> normalized NCHW float.

    out_dtype: emitting bf16 halves the biggest HBM write of the input path
    (the flax convs cast to their compute dtype anyway, so results are
    bit-identical when out_dtype == the model compute dtype)."""
    x = images_u8.astype(jnp.float32) / 255.0
    crops = jax.vmap(lambda a, b: im._crop_resize_one(a, b, (out, out), method)
                     )(x, boxes)
    crops = jnp.clip(crops, 0.0, 1.0)
    if jitter:
        crops = color_jitter_batch(key, crops)
    crops = jnp.where(flip[:, None, None, None], crops[:, :, ::-1, :], crops)
    crops = (crops - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)
    if out_dtype is not None:
        crops = crops.astype(out_dtype)
    return jnp.transpose(crops, (0, 3, 1, 2))


def av_frames_transform(frames_u8, boxes, flip, key, out=224, out_dtype=None):
    """AVDataset 3-frame stack: (B, T, H, W, 3) with per-frame independent
    crops (dataset.py:142-155) -> (B, 3, T, out, out)."""
    b, t = frames_u8.shape[:2]
    flat = frames_u8.reshape((b * t,) + frames_u8.shape[2:])
    x = image_batch_transform(flat, boxes.reshape(b * t, 4),
                              flip.reshape(b * t), key,
                              jnp.asarray(im.IMAGENET_MEAN),
                              jnp.asarray(im.IMAGENET_STD), out=out,
                              out_dtype=out_dtype)
    x = x.reshape(b, t, 3, out, out)
    return jnp.transpose(x, (0, 2, 1, 3, 4))   # (B, C, T, H, W)


def cav_fbank_transform(fbank, key, train: bool, augnois: bool):
    """CAVDataset fbank path: SpecAug -> normalize -> noise/roll
    (dataset.py:281-321)."""
    x = fbank.astype(jnp.float32)
    if train and augnois:
        k1, k2 = jax.random.split(key)
        x = sa.augment_fbank_batch(k1, x, noise=False)
        x = normalize_fbank(x)
        keys = jax.random.split(k2, x.shape[0])
        x = jax.vmap(sa.noise_roll_single)(keys, x)
    else:
        x = normalize_fbank(x)
    return x
