"""Log-magnitude STFT, librosa-compatible, as a jittable on-device transform.

The reference computes spectrograms offline with librosa
(reference: data/extract_spec.py:21-22 — ``librosa.stft(x, n_fft=256,
hop_length=128)`` then ``log(|S| + 1e-7)``). Here the same transform runs
on-device: center ZERO-padding, periodic Hann window, rfft. Framing is
expressed as a gather + batched matmul against the DFT basis is left to XLA's
rfft; the whole pipeline fuses into the input pipeline under jit.

librosa defaults replicated: win_length = n_fft, window='hann' (periodic),
center=True, pad_mode='constant' — the PINNED librosa==0.10.0.post2
(reference requirements.txt) changed the default from 'reflect' to zero
padding in 0.10, so the boundary frames are computed from zeros (the golden
test uses torch.stft(pad_mode='constant') accordingly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length) via a static gather."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def log_stft(x: jnp.ndarray, n_fft: int = 256, hop_length: int = 128) -> jnp.ndarray:
    """log(|STFT(x)| + 1e-7). x: (..., T) -> (..., n_fft//2+1, n_frames)."""
    x = x.astype(jnp.float32)
    pad = n_fft // 2
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    x = jnp.pad(x, pad_widths)   # zeros — librosa>=0.10 default pad_mode
    frames = frame_signal(x, n_fft, hop_length)
    window = jnp.asarray(_hann_periodic(n_fft), dtype=jnp.float32)
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (..., n_frames, n_fft//2+1)
    mag = jnp.abs(spec)
    out = jnp.log(mag + 1e-7)
    return jnp.swapaxes(out, -1, -2)  # (..., freq, time) like librosa


def crema_spectrogram(wave_5s: jnp.ndarray) -> jnp.ndarray:
    """CREMA-D base-path spectrogram: 5 s @ 16 kHz -> (129, 626).

    Matches extract_spec.py:21-22 applied to the 5-second crop (the tile /
    random-crop / clip happens in the ETL stage — mla_tpu/data/etl).
    """
    return log_stft(wave_5s, n_fft=256, hop_length=128)
