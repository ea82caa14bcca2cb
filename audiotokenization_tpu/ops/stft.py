"""STFT / ISTFT / mel filterbanks with torch-parity numerics.

Covers every spectral op the reference uses:

- ``stft``: torch.stft semantics — window zero-padded (centered) to n_fft when
  win_length < n_fft, optional center (reflect/constant) padding, rfft over
  frames. Used by the Conformer encoder front-end
  (BigCodec_SSL/vq/codec_encoder.py:92-122, center=False with manual constant
  pad (win-hop)/2), the spec discriminators (common/audio.py:4-26,
  center=True default), and the mel loss.
- ``istft_same``: the reference's custom "same"-padding ISTFT
  (vq/codec_decoder.py:145-213): irfft -> window -> overlap-add -> divide by
  window envelope (NOLA), trim (win-hop)/2.
- ``mel_filterbank``: slaney-norm slaney-scale mel matrix identical to
  torchaudio/librosa (criterions/mel_loss.py uses norm='slaney',
  mel_scale='slaney').

Framing is a strided gather; the FFT runs through XLA's TPU FFT. All math in
fp32 regardless of input dtype — spectral losses are precision-sensitive.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, *, periodic: bool = True, dtype=jnp.float32):
    """torch.hann_window default (periodic=True)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    if periodic:
        w = w[:-1]
    return jnp.asarray(w, dtype)


def _frame(x, n_fft: int, hop: int):
    """x: (..., T) -> (..., n_frames, n_fft) via strided gather."""
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx], n_frames


def stft(x, *, n_fft: int, hop_length: int, win_length: int | None = None,
         window=None, center: bool = True, pad_mode: str = "reflect"):
    """torch.stft equivalent. x: (..., T) -> complex (..., n_fft//2+1, n_frames)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        # torch zero-pads the window to n_fft, centered
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    x = x.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        mode = {"reflect": "reflect", "constant": "constant"}[pad_mode]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=mode)
    frames, _ = _frame(x, n_fft, hop_length)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


def stft_magnitude(x, *, n_fft: int, hop_length: int, win_length: int,
                   clamp_min: float = 1e-7, clamp_max: float = 1e3):
    """Discriminator-style magnitude STFT (common/audio.py:4-26).

    Returns (B, n_frames, F): sqrt(clamp(re^2 + im^2, 1e-7, 1e3)), center=True.
    """
    s = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
             center=True, pad_mode="reflect")
    mag = jnp.sqrt(jnp.clip(s.real ** 2 + s.imag ** 2, clamp_min, clamp_max))
    return jnp.swapaxes(mag, -1, -2)


def stft_same_constant_pad(x, *, n_fft: int, hop_length: int, win_length: int,
                           window=None):
    """Conformer-encoder front-end STFT (vq/codec_encoder.py:92-122).

    center=False with explicit constant pad of (win - hop)/2 on both sides.
    x: (B, T) -> complex (B, F, n_frames); n_frames = T/hop for T % hop == 0.
    """
    pad = (win_length - hop_length) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    return stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                window=window, center=False)


def istft_same(spec, *, n_fft: int, hop_length: int, win_length: int,
               window=None, valid=None):
    """"Same"-padding ISTFT with NOLA normalization (vq/codec_decoder.py:145-213).

    spec: complex (B, F, T_frames) -> (B, L), L = T_frames * hop (for the
    codec's aligned shapes). Overlap-add is expressed as a transposed strided
    scatter via segment-sum-free padding arithmetic.

    valid: optional (B,) per-sample frame counts for ragged batches — pad
    frames contribute zero to the overlap-add (adding 0.0 is exact, so the
    numerator equals per-file processing bit for bit) and the NOLA window
    envelope is accumulated per sample over its own frames (the per-file
    envelope has fewer window^2 contributions near each sample's true end).
    Positions past a sample's frames are meaningless (trim per sample).
    """
    if window is None:
        window = hann_window(win_length)
    pad = (win_length - hop_length) // 2
    B, F, T = spec.shape
    ifft = jnp.fft.irfft(spec, n=n_fft, axis=1)  # (B, n_fft, T)
    ifft = ifft * window[None, :, None]

    output_size = (T - 1) * hop_length + win_length
    frames = jnp.swapaxes(ifft, 1, 2)  # (B, T, n_fft)
    w2 = window * window
    if valid is None:
        out = _overlap_add(frames, hop_length, output_size)
        env = _overlap_add(jnp.broadcast_to(w2[None, :], (T, win_length))[None],
                           hop_length, output_size)[0]
        env = env[None]
    else:
        fmask = (jnp.arange(T)[None, :]
                 < jnp.asarray(valid)[:, None]).astype(frames.dtype)  # (B, T)
        out = _overlap_add(frames * fmask[:, :, None], hop_length, output_size)
        env = _overlap_add(w2[None, None, :] * fmask[:, :, None],
                           hop_length, output_size)  # (B, output_size)
        # positions past a sample's own frames have zero envelope; clamp so
        # the (meaningless, trimmed) tail stays finite
        env = jnp.maximum(env, jnp.finfo(env.dtype).tiny)
    out = out[:, pad:-pad] if pad > 0 else out
    env = env[:, pad:-pad] if pad > 0 else env
    return out / env


def _overlap_add(frames, hop: int, output_size: int):
    """frames: (B, T, W) -> (B, output_size); out[t*hop + j] += frames[t, j].

    Implemented without scatter: reshape each frame into ceil(W/hop) hop-sized
    strips; strip s of frame t lands at offset (t + s) * hop. Summing shifted
    copies keeps everything dense and TPU-friendly.
    """
    B, T, W = frames.shape
    n_strips = -(-W // hop)
    padded = jnp.pad(frames, ((0, 0), (0, 0), (0, n_strips * hop - W)))
    strips = padded.reshape(B, T, n_strips, hop)
    out = jnp.zeros((B, T + n_strips - 1, hop), frames.dtype)
    for s in range(n_strips):
        out = out.at[:, s:s + T].add(strips[:, :, s])
    out = out.reshape(B, (T + n_strips - 1) * hop)
    return out[:, :output_size]


# ---------------------------------------------------------------------------
# Mel
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f == 0 rows are masked by the where
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep,
                        mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_filterbank(*, sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None,
                   htk: bool = False, norm: str | None = "slaney",
                   dtype=jnp.float32):
    """Mel matrix (n_mels, n_fft//2 + 1).

    Default: slaney scale + slaney area norm, matching
    torchaudio.functional.melscale_fbanks(norm='slaney', mel_scale='slaney')
    / librosa.filters.mel(htk=False, norm='slaney'). htk=True + norm=None
    matches the torchaudio MelSpectrogram/MFCC defaults (mel_scale='htk').
    """
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    if htk:
        def to_mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

        def to_hz(m):
            return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    else:
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    m_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    f_pts = to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return jnp.asarray(fb.T, dtype)  # (n_mels, n_freqs)


def mel_spectrogram(x, *, sample_rate: int, n_fft: int, hop_length: int,
                    n_mels: int, power: float = 1.0, fmin: float = 0.0,
                    fmax: float | None = None, fb=None):
    """torchaudio.transforms.MelSpectrogram(center=True, norm/scale slaney).

    x: (..., T) -> (..., n_mels, n_frames). power=1.0 -> magnitude mel.
    """
    if fb is None:
        fb = mel_filterbank(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                            fmin=fmin, fmax=fmax)
    s = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=n_fft,
             center=True, pad_mode="reflect")
    # clamp matches torch complex-abs's 0 subgradient at exactly-zero bins
    # (plain sqrt backpropagates 0/0 = NaN there — see losses/mel.py)
    mag = jnp.sqrt(jnp.maximum(s.real ** 2 + s.imag ** 2, 1e-20))
    if power != 1.0:
        mag = mag ** power
    return jnp.einsum("mf,...ft->...mt", fb, mag)
