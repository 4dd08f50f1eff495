"""SpecAugment + noise/roll fbank augmentation, jittable with explicit PRNG.

Reference: dataset/dataset.py:281-294 (torchaudio Frequency/TimeMasking with
freqm=48, timem=192, mask value 0) and dataset.py:319-321 (uniform noise
scaled by a per-sample uniform, then a circular roll of the time axis).
Runs on-device per batch instead of per-sample in loader workers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_mask(key, size: int, max_width: int):
    """torchaudio-0.8.1 mask_along_axis law: value ~ U[0, max_width),
    min ~ U[0, size - value), then BOTH are truncated to integers —
    mask = [int(min), int(min) + int(value)). The truncation matters:
    width 0 occurs with probability 1/max_width, the mean width is
    (max_width-1)/2, and starts are integer-aligned; a continuous mask
    has a different augmentation law."""
    kw, ks = jax.random.split(key)
    value = jax.random.uniform(kw, (), minval=0.0, maxval=float(max_width))
    mn = jax.random.uniform(ks, (), minval=0.0,
                            maxval=float(size) - value)
    start = jnp.floor(mn)
    end = start + jnp.floor(value)
    idx = jnp.arange(size, dtype=jnp.float32)
    return (idx >= start) & (idx < end)  # True where masked


def specaug_single(key, fbank: jnp.ndarray, freqm: int = 48, timem: int = 192):
    """fbank: (T, F). Zero a random mel band then a random time band."""
    t, f = fbank.shape
    kf, kt = jax.random.split(key)
    fmask = _axis_mask(kf, f, freqm)            # (F,)
    tmask = _axis_mask(kt, t, timem)            # (T,)
    out = jnp.where(fmask[None, :], 0.0, fbank)
    out = jnp.where(tmask[:, None], 0.0, out)
    return out


def noise_roll_single(key, fbank: jnp.ndarray):
    """fbank += rand(T,F) * U[0,1)/10; roll time axis by U[-1024,1024)
    (dataset.py:319-321)."""
    kn, ks, kr = jax.random.split(key, 3)
    noise = jax.random.uniform(kn, fbank.shape) * jax.random.uniform(ks, ()) / 10.0
    shift = jax.random.randint(kr, (), -1024, 1024)
    return jnp.roll(fbank + noise, shift, axis=0)


@functools.partial(jax.jit, static_argnames=("freqm", "timem", "noise"))
def augment_fbank_batch(key, fbanks: jnp.ndarray, freqm: int = 48,
                        timem: int = 192, noise: bool = True) -> jnp.ndarray:
    """(B, T, F) train-time fbank augmentation (--cav_augnois)."""
    keys = jax.random.split(key, (fbanks.shape[0], 2))
    out = jax.vmap(lambda k, x: specaug_single(k, x, freqm, timem))(keys[:, 0], fbanks)
    if noise:
        out = jax.vmap(noise_roll_single)(keys[:, 1], out)
    return out
