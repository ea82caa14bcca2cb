"""Polyphase windowed-sinc resampler with torchaudio-parity construction.

Reference behavior: FSDataset resamples any file whose sample rate differs
from the configured rate via torchaudio.transforms.Resample
(BigCodec_SSL/data_module.py:97-98), and the in-training metrics resample
gen/gt audio to 16 kHz (lightning_module.py:423-424). torchaudio's kernel:
gcd-reduced rates, lowpass_filter_width=6, rolloff=0.99, Hann(cos^2)
windowed sinc, one filter phase per output sample within the upsample cycle,
applied as a strided conv. LibriSpeech is natively 16 kHz, so the parity
corpus bypasses this; the capability still matches for other corpora.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .conv import conv1d


def _resample_kernel(orig_freq: int, new_freq: int, *,
                     lowpass_filter_width: int = 6, rolloff: float = 0.99):
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, None] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width


def resample(x, orig_freq: int, new_freq: int, *, lowpass_filter_width: int = 6,
             rolloff: float = 0.99):
    """x: (..., T) -> (..., ceil(T * new/orig)). No-op if rates match."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    of, nf = int(orig_freq) // g, int(new_freq) // g
    kernel, width = _resample_kernel(of, nf, lowpass_filter_width=lowpass_filter_width,
                                     rolloff=rolloff)
    shape = x.shape
    T = shape[-1]
    xr = jnp.reshape(x, (-1, 1, T)).astype(jnp.float32)
    xr = jnp.pad(xr, ((0, 0), (0, 0), (width, width + of)))
    y = conv1d(xr, jnp.asarray(kernel), stride=of)  # (B, nf, T//of ...)
    y = jnp.swapaxes(y, 1, 2).reshape(xr.shape[0], -1)
    target_len = int(math.ceil(nf * T / of))
    y = y[:, :target_len]
    return jnp.reshape(y, shape[:-1] + (target_len,))
