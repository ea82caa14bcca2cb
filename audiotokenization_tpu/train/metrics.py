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
- PESQ (ITU-T P.862): `pesq_metric` prefers the ITU `pesq` package when it
  is importable (the conformance oracle) and otherwise runs the in-repo
  full-pipeline implementation (train/pesq_p862.py) — so a `pesq` value is
  always produced, like the reference's torchmetrics PESQ
  (lightning_module.py:214-222).
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


def masked_si(est, target, lengths, *, zero_mean: bool):
    """Per-sample SI-SDR/SI-SNR over zero-padded ragged batches.

    est/target: (B, L) with garbage/zeros beyond lengths (B,). Means and
    sums run over the valid region only, so each row equals the metric on
    its trimmed pair (the batched full-length eval path). Returns (B,).
    """
    est = est.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = (jnp.arange(est.shape[-1])[None] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    est = est * mask
    target = target * mask
    if zero_mean:
        est = (est - jnp.sum(est, -1, keepdims=True) / n) * mask
        target = (target - jnp.sum(target, -1, keepdims=True) / n) * mask
    alpha = (jnp.sum(est * target, -1, keepdims=True) + _EPS) / (
        jnp.sum(target * target, -1, keepdims=True) + _EPS)
    s_target = alpha * target
    noise = (est - s_target) * mask
    ratio = (jnp.sum(s_target ** 2, -1) + _EPS) / (jnp.sum(noise ** 2, -1) + _EPS)
    return 10.0 * jnp.log10(ratio)


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


# pystoi uses machine epsilon, not 1e-8, in every guard — matching it keeps
# the score bit-comparable to the reference's torchmetrics->pystoi chain
_STOI_EPS = np.finfo(np.float64).eps


def _stoi_frames(x):
    """Hann-windowed frames with pystoi's EXCLUSIVE framing: both its
    `utils.stft` and `remove_silent_frames` iterate
    range(0, len(x) - win, hop), skipping a final exactly-fitting frame."""
    w = np.hanning(_STOI_WIN + 2)[1:-1]
    n = max(-(-(len(x) - _STOI_WIN) // _STOI_HOP), 0)
    idx = np.arange(n)[:, None] * _STOI_HOP + np.arange(_STOI_WIN)[None, :]
    return x[idx] * w


def _remove_silent_frames(x, y):
    """pystoi utils.remove_silent_frames: mask frames whose windowed energy
    is > 40 dB below the loudest, overlap-add the survivors back."""
    xf = _stoi_frames(x)
    yf = _stoi_frames(y)
    if len(xf) == 0:
        return None, None
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + _STOI_EPS)
    mask = (np.max(energies) - _STOI_DYN_RANGE - energies) < 0
    xf, yf = xf[mask], yf[mask]
    if len(xf) == 0:
        return None, None

    def ola(frames):
        out = np.zeros((len(frames) - 1) * _STOI_HOP + _STOI_WIN)
        for i, fr in enumerate(frames):
            out[i * _STOI_HOP:i * _STOI_HOP + _STOI_WIN] += fr
        return out

    return ola(xf), ola(yf)


def stoi(target: np.ndarray, est: np.ndarray, fs: int = 16000) -> float:
    """Short-Time Objective Intelligibility (classic, non-extended).

    Mirrors pystoi.stoi(..., extended=False) — the backend of the reference's
    torchmetrics ShortTimeObjectiveIntelligibility
    (lightning_module.py:214-218) — step for step: 10 kHz operating rate,
    silent-frame removal (40 dB dynamic range, Hann 256/128), 512-FFT
    third-octave bands (15 bands from 150 Hz), N=30-frame segments with
    clipped (+15 dB SDR bound) normalized correlation, averaged over bands
    and segments. Known deviation: resampling to 10 kHz uses ops/resample
    (kaiser-windowed sinc) instead of scipy.signal.resample_poly — at fs ==
    10000 the pipelines are identical; at 16 kHz scores differ by the
    resampler difference only (bounded in tests/test_stoi_conformance.py
    when pystoi is importable).

    target/est: 1-D waveforms at fs.
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
        # pystoi: norm-ratio normalization, clip at x*(1+c), then mean-center
        # and UNIT-normalize each vector (each norm gets its own +EPS) before
        # the inner product
        alpha = (np.linalg.norm(Xseg, axis=0)
                 / (np.linalg.norm(Yseg, axis=0) + _STOI_EPS))
        Yprime = np.minimum(Yseg * alpha[None, :], Xseg * (1 + c))
        xn = Xseg - np.mean(Xseg, axis=0, keepdims=True)
        yn = Yprime - np.mean(Yprime, axis=0, keepdims=True)
        xn = xn / (np.linalg.norm(xn, axis=0, keepdims=True) + _STOI_EPS)
        yn = yn / (np.linalg.norm(yn, axis=0, keepdims=True) + _STOI_EPS)
        scores.append(np.mean(np.sum(xn * yn, axis=0)))
    return float(np.mean(scores))


def pesq_impl() -> str:
    """Which implementation pesq_metric dispatches to in this environment:
    'itu_package' (the conformance oracle, preferred when importable) or
    'native_p862' (train/pesq_p862.py with the transcribed ITU tables).
    Emitted beside every pesq value (val/test JSONL, inference_full
    summary.json) so artifacts state which calibration produced them."""
    try:
        import pesq  # noqa: F401

        return "itu_package"
    except ImportError:
        return "native_p862"


def pesq_metric(target: np.ndarray, est: np.ndarray, fs: int = 16000,
                mode: str = "wb") -> Optional[float]:
    """PESQ MOS-LQO: the ITU `pesq` package when importable (the oracle),
    otherwise the in-repo full-P.862 implementation (train/pesq_p862.py —
    level + time alignment, utterance splitting, Bark loudness, asymmetric
    disturbance, P.862.2 wb / P.862.1 nb mapping). Returns None only for
    degenerate inputs (too short / silent), mirroring the reference's soft
    PESQ error handling (lightning_module.py:428-431)."""
    t = np.asarray(target, np.float32).ravel()
    e = np.asarray(est, np.float32).ravel()
    try:
        from pesq import pesq as _pesq  # noqa: F401

        try:
            return float(_pesq(fs, t, e, mode))
        except Exception:
            return None
    except ImportError:
        pass
    from .pesq_p862 import pesq_p862

    v = pesq_p862(t, e, fs=fs, mode=mode)
    return None if math.isnan(v) else float(v)
