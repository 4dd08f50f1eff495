"""Kaldi-compatible log-mel filterbank, on-device.

Replaces the reference's offline ``torchaudio.compliance.kaldi.fbank`` call
(reference: data/extract_fbank.py:35-37: htk_compat=True, hanning window,
num_mel_bins=128, dither=0.0, frame_shift=10, use_energy=False) with a jittable
JAX transform so fbanks can be computed per batch on the TPU instead of being
cached to disk. The hot path is a (frames, 257) x (257, 128) matmul on the MXU.

Kaldi semantics replicated (defaults of torchaudio.compliance.kaldi.fbank):
  frame_length 25 ms (400 samples @ 16 kHz), frame_shift 10 ms (160 samples),
  snip_edges=True, remove_dc_offset=True, pre-emphasis 0.97 (first sample
  pre-emphasized against itself), Kaldi 'hanning' window (denominator N-1),
  round_to_power_of_two=True (FFT size 512), power spectrum, mel scale
  1127*ln(1+f/700) with low_freq=20 / high_freq=nyquist, triangular banks laid
  out on the *mel* axis, floor at float32 eps before log.

htk_compat only moves the energy column (unused here: use_energy=False).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.ops.stft import frame_signal

_FLT_EPS = float(np.finfo(np.float32).eps)


def _mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def kaldi_mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """(num_fft_bins, num_bins) triangular mel weights, Kaldi layout."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_length_padded
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_fft_bins, dtype=np.float64)
    mel = _mel(fft_bin_width * bin_idx)  # (F,)

    left = mel_low + np.arange(num_bins, dtype=np.float64) * mel_delta   # (M,)
    center = left + mel_delta
    right = center + mel_delta

    up = (mel[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - mel[:, None]) / (right - center)[None, :]
    weights = np.where(
        (mel[:, None] > left[None, :]) & (mel[:, None] <= center[None, :]), up,
        np.where((mel[:, None] > center[None, :]) & (mel[:, None] < right[None, :]),
                 down, 0.0))
    # Kaldi computes banks over bins [0, num_fft_bins); the nyquist bin gets 0.
    full = np.zeros((num_fft_bins + 1, num_bins), dtype=np.float64)
    full[:num_fft_bins] = weights
    return full.astype(np.float32)


def _kaldi_hanning(n: int) -> np.ndarray:
    a = 2.0 * np.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n, dtype=np.float64))).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sample_frequency", "num_mel_bins", "frame_length_ms",
                     "frame_shift_ms", "preemphasis", "remove_dc_offset"))
def kaldi_fbank(waveform: jnp.ndarray,
                sample_frequency: int = 16000,
                num_mel_bins: int = 128,
                frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0,
                preemphasis: float = 0.97,
                remove_dc_offset: bool = True) -> jnp.ndarray:
    """(..., T) waveform -> (..., n_frames, num_mel_bins) log-mel fbank."""
    window_size = int(sample_frequency * frame_length_ms * 0.001)
    window_shift = int(sample_frequency * frame_shift_ms * 0.001)
    padded = 1 << (window_size - 1).bit_length()  # round_to_power_of_two

    x = waveform.astype(jnp.float32)
    frames = frame_signal(x, window_size, window_shift)  # (..., M, W) snip_edges
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_kaldi_hanning(window_size))
    frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, padded - window_size)])
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (..., M, padded//2+1)
    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, float(sample_frequency)))
    mel = jnp.matmul(power, banks, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, _FLT_EPS))


def pad_or_trim_frames(fbank: jnp.ndarray, target_length: int = 1024) -> jnp.ndarray:
    """Zero-pad / cut the frame axis to target_length (extract_fbank.py:42-52)."""
    n = fbank.shape[-2]
    if n >= target_length:
        return fbank[..., :target_length, :]
    pad = [(0, 0)] * (fbank.ndim - 2) + [(0, target_length - n), (0, 0)]
    return jnp.pad(fbank, pad)


def mix_waveforms(w1: jnp.ndarray, w2: jnp.ndarray,
                  mix_lambda: float) -> jnp.ndarray:
    """Waveform mixup (extract_fbank.py:14-32): mean-center both waveforms,
    zero-pad or cut w2 to w1's length, lambda-blend, re-center the mix."""
    w1 = w1 - jnp.mean(w1, axis=-1, keepdims=True)
    w2 = w2 - jnp.mean(w2, axis=-1, keepdims=True)
    n1, n2 = w1.shape[-1], w2.shape[-1]
    if n2 < n1:
        w2 = jnp.pad(w2, [(0, 0)] * (w2.ndim - 1) + [(0, n1 - n2)])
    elif n2 > n1:
        w2 = w2[..., :n1]
    mix = mix_lambda * w1 + (1.0 - mix_lambda) * w2
    return mix - jnp.mean(mix, axis=-1, keepdims=True)


def wav2fbank(waveform: jnp.ndarray, target_length: int = 1024,
              waveform2: Optional[jnp.ndarray] = None,
              mix_lambda: float = -1.0) -> jnp.ndarray:
    """Full extract_fbank.py::wav2fbank path: mean-subtract (or, with a
    second waveform, mix_lambda-blend per mix_waveforms), fbank, pad to 1024
    frames (extract_fbank.py:8-52)."""
    if waveform2 is not None:
        waveform = mix_waveforms(waveform, waveform2, mix_lambda)
    else:
        waveform = waveform - jnp.mean(waveform, axis=-1, keepdims=True)
    return pad_or_trim_frames(kaldi_fbank(waveform), target_length)


CAV_NORM_MEAN = -5.081   # dataset.py:259-260
CAV_NORM_STD = 4.4849


def normalize_fbank(fbank: jnp.ndarray) -> jnp.ndarray:
    return (fbank - CAV_NORM_MEAN) / CAV_NORM_STD
