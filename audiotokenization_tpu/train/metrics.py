"""Evaluation metrics: SI-SNR / SI-SDR (in-JAX), codebook stats, STOI (host).

Reference: the torchmetrics collection in BigCodec_SSL/lightning_module.py:
214-222 — STOI (16k, non-extended), PESQ (16k wideband), SI-SNR, SI-SDR,
CodebookPerplexity (:26-51, psum-able one-hot histogram -> exp(entropy)) and
CodebookUtilization (:53-73, max-reduced used-code bitmap).

- SI-SNR follows torchmetrics semantics: SI-SDR with zero_mean=True.
- SI-SDR default keeps the raw means (zero_mean=False), like torchmetrics.
- Codebook stats are expressed as pure accumulator ops so the train/eval
  loops can psum them across the data mesh (the torchmetrics
  dist_reduce_fx="sum"/"max" equivalent).
- STOI is implemented from the published algorithm (Taal et al. 2011) in
  numpy as a host metric (the reference also computes it on CPU tensors).
- PESQ (ITU-T P.862) has no implementation in this image; `pesq_metric`
  returns None unless the optional `pesq` package is importable, mirroring
  the reference's soft handling of PESQ errors (lightning_module.py:428-431).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

_EPS = 1e-8


def si_sdr(est, target, *, zero_mean: bool = False):
    """Scale-invariant SDR, per-sample mean over batch. est/target: (..., T)."""
    est = est.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    alpha = (jnp.sum(est * target, axis=-1, keepdims=True) + _EPS) / (
        jnp.sum(target * target, axis=-1, keepdims=True) + _EPS)
    s_target = alpha * target
    noise = est - s_target
    ratio = (jnp.sum(s_target ** 2, axis=-1) + _EPS) / (jnp.sum(noise ** 2, axis=-1) + _EPS)
    return jnp.mean(10.0 * jnp.log10(ratio))


def si_snr(est, target):
    """torchmetrics ScaleInvariantSignalNoiseRatio == SI-SDR with zero_mean."""
    return si_sdr(est, target, zero_mean=True)


# ---------------------------------------------------------------------------
# Codebook statistics (distributed-reducible accumulators)
# ---------------------------------------------------------------------------

def codebook_histogram(indices, codebook_size: int):
    """One-hot count histogram (codebook_size,), summable across steps/devices."""
    return jnp.zeros(codebook_size, jnp.float32).at[indices.reshape(-1)].add(1.0)


def perplexity_from_histogram(hist):
    """exp(entropy) of the empirical code distribution (lightning_module.py:38-51)."""
    total = jnp.sum(hist)
    probs = hist / jnp.maximum(total, 1.0)
    ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
    return jnp.where(total > 0, jnp.exp(ent), 0.0)


def utilization_from_histogram(hist):
    return jnp.mean((hist > 0).astype(jnp.float32))


# ---------------------------------------------------------------------------
# STOI (host metric, numpy)
# ---------------------------------------------------------------------------

_STOI_FS = 10000
_STOI_NFFT = 512
_STOI_WIN = 256
_STOI_HOP = 128
_STOI_NBANDS = 15
_STOI_MINFREQ = 150.0
_STOI_N = 30          # segment length (frames)
_STOI_BETA = -15.0    # clipping SDR bound (dB)
_STOI_DYN_RANGE = 40.0


def _thirdoct(fs, nfft, num_bands, min_freq):
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    flo = cf * 2 ** (-1.0 / 6)
    fhi = cf * 2 ** (1.0 / 6)
    A = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        lo = np.argmin((f - flo[i]) ** 2)
        hi = np.argmin((f - fhi[i]) ** 2)
        A[i, lo:hi] = 1.0
    return A


def _stoi_frames(x):
    w = np.hanning(_STOI_WIN + 2)[1:-1]
    n = 1 + (len(x) - _STOI_WIN) // _STOI_HOP
    idx = np.arange(n)[:, None] * _STOI_HOP + np.arange(_STOI_WIN)[None, :]
    return x[idx] * w


def _remove_silent_frames(x, y):
    w = np.hanning(_STOI_WIN + 2)[1:-1]
    xf = _stoi_frames(x)
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + _EPS)
    mask = energies > (np.max(energies) - _STOI_DYN_RANGE)
    yf = _stoi_frames(y)
    xf, yf = xf[mask], yf[mask]
    # overlap-add back to signals
    def ola(frames):
        out = np.zeros((len(frames) - 1) * _STOI_HOP + _STOI_WIN)
        for i, fr in enumerate(frames):
            out[i * _STOI_HOP:i * _STOI_HOP + _STOI_WIN] += fr
        return out
    if len(xf) == 0:
        return None, None
    return ola(xf), ola(yf)


def stoi(target: np.ndarray, est: np.ndarray, fs: int = 16000) -> float:
    """Short-Time Objective Intelligibility (classic, non-extended).

    target/est: 1-D waveforms at fs; internally resampled to 10 kHz.
    """
    from ..ops.resample import resample

    x = np.asarray(target, np.float64).ravel()
    y = np.asarray(est, np.float64).ravel()
    if fs != _STOI_FS:
        x = np.asarray(resample(jnp.asarray(x, jnp.float32), fs, _STOI_FS), np.float64)
        y = np.asarray(resample(jnp.asarray(y, jnp.float32), fs, _STOI_FS), np.float64)
    x, y = _remove_silent_frames(x, y)
    if x is None or len(x) < _STOI_WIN:
        return float("nan")

    def spectrogram(sig):
        frames = _stoi_frames(sig)
        return np.abs(np.fft.rfft(frames, _STOI_NFFT, axis=1)) ** 2  # (M, F)

    A = _thirdoct(_STOI_FS, _STOI_NFFT, _STOI_NBANDS, _STOI_MINFREQ)
    X = np.sqrt(spectrogram(x) @ A.T)  # (M, J)
    Y = np.sqrt(spectrogram(y) @ A.T)
    M = X.shape[0]
    if M < _STOI_N:
        return float("nan")
    c = 10 ** (-_STOI_BETA / 20.0)
    scores = []
    for m in range(_STOI_N, M + 1):
        Xseg = X[m - _STOI_N:m]  # (N, J)
        Yseg = Y[m - _STOI_N:m]
        alpha = np.sqrt(np.sum(Xseg ** 2, axis=0) / (np.sum(Yseg ** 2, axis=0) + _EPS))
        Yprime = np.minimum(Yseg * alpha[None, :], Xseg * (1 + c))
        xn = Xseg - np.mean(Xseg, axis=0, keepdims=True)
        yn = Yprime - np.mean(Yprime, axis=0, keepdims=True)
        corr = np.sum(xn * yn, axis=0) / (
            np.linalg.norm(xn, axis=0) * np.linalg.norm(yn, axis=0) + _EPS)
        scores.append(np.mean(corr))
    return float(np.mean(scores))


def pesq_metric(target: np.ndarray, est: np.ndarray, fs: int = 16000,
                mode: str = "wb") -> Optional[float]:
    """PESQ via the optional `pesq` package; None when unavailable."""
    try:
        from pesq import pesq as _pesq, NoUtterancesError
    except ImportError:
        return None
    try:
        return float(_pesq(fs, np.asarray(target, np.float32).ravel(),
                           np.asarray(est, np.float32).ravel(), mode))
    except Exception:
        return None
