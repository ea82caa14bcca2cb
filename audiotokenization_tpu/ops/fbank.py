"""SeamlessM4T / w2v-bert-2.0 input frontend, implemented natively.

The reference computes the SSL teacher's input features in the dataloader:
BigCodec_SSL/data_module.py:124-132 pads the cropped wav by ±160 samples and
runs HF ``AutoFeatureExtractor("facebook/w2v-bert-2.0")`` (the
SeamlessM4TFeatureExtractor). Its pipeline, reproduced here exactly:

  1. scale the waveform by 2^15 (kaldi 16-bit convention);
  2. frame: 400-sample windows, hop 160, no centering
     (nf = 1 + floor((T - 400)/160));
  3. per frame: subtract the frame mean (remove_dc_offset), apply
     preemphasis 0.97 (first sample scaled by 1-0.97), multiply by the
     non-periodic povey window (hann^0.85, denominator N-1);
  4. power spectrum via 512-point rfft;
  5. kaldi-scale 80-bin mel filter bank (mel = 1127*ln(1+f/700), fmin 20,
     fmax 8000, no norm, triangles built in mel space), floored at
     1.192092955078125e-07, natural log;
  6. per-mel-bin zero-mean/unit-variance over the utterance's frames
     (ddof=1, eps 1e-7);
  7. zero-pad the frame count to a multiple of 2 and stack consecutive
     frame pairs -> (nf//2, 160).

`w2v_bert_features` (numpy, float64 internals like HF's np.fft path) is the
dataloader-side extractor; `w2v_bert_features_jax` is a batched fp32 JAX
version for computing features on-device (same math, fp32 FFT — differences
are ~1e-4 after the log/normalize, see tests/test_fbank.py).
"""
from __future__ import annotations

import numpy as np

_SAMPLE_RATE = 16000
_FRAME = 400
_HOP = 160
_NFFT = 512
_NMELS = 80
_PREEMPH = 0.97
_MEL_FLOOR = 1.192092955078125e-07
_STRIDE = 2


def _mel_kaldi(f):
    return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)


def kaldi_mel_filters(*, n_freqs: int = _NFFT // 2 + 1, n_mels: int = _NMELS,
                      fmin: float = 20.0, fmax: float = _SAMPLE_RATE / 2,
                      sample_rate: int = _SAMPLE_RATE) -> np.ndarray:
    """(n_freqs, n_mels) kaldi-scale triangular filters, triangles in mel space
    (HF mel_filter_bank(norm=None, mel_scale='kaldi',
    triangularize_in_mel_space=True))."""
    bin_mels = _mel_kaldi(np.arange(n_freqs) * sample_rate / ((n_freqs - 1) * 2))
    pts = np.linspace(_mel_kaldi(fmin), _mel_kaldi(fmax), n_mels + 2)
    left, center, right = pts[:-2], pts[1:-1], pts[2:]
    up = (bin_mels[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - bin_mels[:, None]) / (right - center)[None, :]
    return np.maximum(0.0, np.minimum(up, down))


def povey_window(n: int = _FRAME) -> np.ndarray:
    """Non-periodic povey window: hann((N-1)-denominator)^0.85."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))) ** 0.85


_FILTERS = None
_WINDOW = None


def _tables():
    # Gate on _WINDOW, which is assigned LAST: DataLoader worker threads call
    # this concurrently, and a thread that sees _WINDOW set is guaranteed (by
    # CPython program order under the GIL) to also see _FILTERS. A rare
    # double-compute while both are still None is idempotent and harmless.
    global _FILTERS, _WINDOW
    if _WINDOW is None:
        _FILTERS = kaldi_mel_filters()
        _WINDOW = povey_window()
    return _FILTERS, _WINDOW


def fbank(wav: np.ndarray) -> np.ndarray:
    """wav (T,) float in [-1, 1] -> (nf, 80) float32 log-mel (kaldi fbank)."""
    filters, window = _tables()
    x = np.asarray(wav, np.float64) * 32768.0
    if len(x) < _FRAME:
        return np.zeros((0, _NMELS), np.float32)
    nf = 1 + (len(x) - _FRAME) // _HOP
    frames = np.lib.stride_tricks.sliding_window_view(x, _FRAME)[::_HOP][:nf]
    frames = frames - frames.mean(axis=1, keepdims=True)
    pre = np.empty_like(frames)
    pre[:, 1:] = frames[:, 1:] - _PREEMPH * frames[:, :-1]
    pre[:, 0] = frames[:, 0] * (1.0 - _PREEMPH)
    spec = np.abs(np.fft.rfft(pre * window, _NFFT)) ** 2
    mel = np.maximum(_MEL_FLOOR, spec @ filters)
    return np.log(mel).astype(np.float32)


def w2v_bert_features(wav: np.ndarray) -> np.ndarray:
    """wav (T,) -> (nf', 160) float32 stacked/normalized w2v-bert input.

    Matches SeamlessM4TFeatureExtractor(wav, sampling_rate=16000) on a single
    utterance: per-mel-bin normalization then stride-2 frame stacking (the
    frame count is zero-padded up to a multiple of 2 first, like HF's
    pad_to_multiple_of=2).
    """
    f = fbank(wav)
    if len(f) == 0:
        return np.zeros((0, _NMELS * _STRIDE), np.float32)
    f = (f - f.mean(0, keepdims=True)) / np.sqrt(f.var(0, ddof=1, keepdims=True) + 1e-7)
    f = f.astype(np.float32)
    if len(f) % _STRIDE:
        f = np.pad(f, ((0, _STRIDE - len(f) % _STRIDE), (0, 0)))
    return f.reshape(len(f) // _STRIDE, _NMELS * _STRIDE)


def w2v_bert_features_from_clip(wav: np.ndarray) -> np.ndarray:
    """The dataset-facing entry: ±160-sample pad then extract
    (data_module.py:130's F.pad(wav, (160, 160)))."""
    return w2v_bert_features(np.pad(np.asarray(wav), (160, 160)))


# ---------------------------------------------------------------------------
# Batched on-device variant
# ---------------------------------------------------------------------------

def w2v_bert_features_jax(wav, *, pad_clip: bool = True):
    """Batched JAX version: wav (B, T) -> (B, nf', 160), fp32.

    Same pipeline as w2v_bert_features per row (all rows share T, as in the
    fixed-crop training batches); pad_clip applies the reference's ±160
    sample pad. fp32 FFT instead of HF's float64 — output differs by ~1e-4,
    well under the teacher's sensitivity (tests/test_fbank.py bounds it).
    """
    import jax.numpy as jnp

    filters, window = _tables()
    x = jnp.asarray(wav, jnp.float32)
    if pad_clip:
        x = jnp.pad(x, ((0, 0), (160, 160)))
    x = x * 32768.0
    T = x.shape[-1]
    nf = 1 + (T - _FRAME) // _HOP
    idx = np.arange(nf)[:, None] * _HOP + np.arange(_FRAME)[None, :]
    frames = x[:, idx]  # (B, nf, 400)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = jnp.concatenate(
        [frames[..., :1] * (1.0 - _PREEMPH),
         frames[..., 1:] - _PREEMPH * frames[..., :-1]], axis=-1)
    pre = pre * jnp.asarray(window, jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(pre, _NFFT)) ** 2
    mel = jnp.maximum(_MEL_FLOOR, spec @ jnp.asarray(filters, jnp.float32))
    f = jnp.log(mel)  # (B, nf, 80)
    mu = jnp.mean(f, axis=1, keepdims=True)
    # ddof=1 to match HF's torch-default variance
    var = jnp.sum(jnp.square(f - mu), axis=1, keepdims=True) / max(nf - 1, 1)
    f = (f - mu) / jnp.sqrt(var + 1e-7)
    if nf % _STRIDE:
        f = jnp.pad(f, ((0, 0), (0, _STRIDE - nf % _STRIDE), (0, 0)))
    return f.reshape(f.shape[0], f.shape[1] // _STRIDE, _NMELS * _STRIDE)
