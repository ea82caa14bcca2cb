"""Native ITU-T P.862 PESQ (wideband P.862.2 primary; narrowband via P.862.1).

The reference's headline quality metric is wideband PESQ computed by
torchmetrics' wrapper around the ITU `pesq` package
(BigCodec_SSL/lightning_module.py:214-222; offline wrapper
inference_full.py:438-476). That package does not exist in this image, so
this module implements the published P.862 pipeline natively:

  level alignment -> input filtering -> crude time alignment ->
  utterance segmentation -> per-utterance fine alignment (weighted
  correlation histogram) -> delay-discontinuity utterance splitting ->
  perceptual model (Hann power spectra, Bark band densities, frequency/
  gain compensation, Zwicker loudness, deadzone + asymmetry-weighted
  disturbance, frame weighting) -> L6-over-intervals / L2-over-time
  aggregation -> raw MOS -> P.862.2 (wb) / P.862.1 (nb) logistic mapping.

Fidelity statement (honest scope):
- Algorithm STRUCTURE follows ITU-T P.862 (02/2001) + P.862.2 stage by
  stage, including real time alignment — unlike the retired zero-delay
  estimator, delayed/shifted degraded signals are measured correctly.
- Published constants used verbatim: 32 ms Hann frames at 50% overlap,
  power-calibration target 1e7 over 350-3250 Hz, the P.862.2 wideband
  input IIR section, Sp/Sl power & loudness calibration, Zwicker exponent
  0.23, the 0.25-min deadzone, the ((P+50))^1.2 asymmetry rule (<3 -> 0,
  cap 12), frame weight ((E_ref+1e5)/1e7)^0.04 with the 45 clip,
  20-frame/10-step L6-L2 aggregation, MOS = 4.5 - 0.1 D - 0.0309 DA, and
  the P.862.2 / P.862.1 logistic maps.
- The ITU *fixed tables* (49-band Bark layout @16 kHz, per-band absolute
  thresholds) are RECONSTRUCTED from their generative relations (uniform
  Zwicker-Bark band edges over the FFT grid; Terhardt threshold-in-quiet
  at band centres), and the disturbance-norm scale is calibrated on
  published wb-PESQ anchor behaviors (identical -> 4.64, AWGN SNR ladder).
  Exact table parity with the ITU C reference cannot be verified in this
  image; the oracle-gated conformance test (tests/test_pesq_conformance.py)
  asserts the MOS bound wherever the `pesq` package exists.
"""
from __future__ import annotations

import numpy as np

# --- published P.862 constants ------------------------------------------------
_TARGET_POWER = 1e7           # fix_power_level target (350-3250 Hz band power)
_SP_16K = 6.910853e-6         # power-density calibration, 16 kHz
_SP_8K = 2.764344e-5          # power-density calibration, 8 kHz
_SL = 1.866055e-1             # loudness-density calibration (both rates)
_ZWICKER = 0.23               # Zwicker loudness exponent
_D_WEIGHT, _DA_WEIGHT = 0.1, 0.0309
# P.862.2 wideband input filter (one IIR second-order section, 16 kHz)
_WB_IIR_SOS = (2.740826, -5.4816519, 2.740826, -1.9444777, 0.94597794)

_MODEL_CACHE: dict = {}


# =============================================================================
# Fixed-table reconstruction (documented in the module docstring)
# =============================================================================

def _bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


class _Model:
    """Per-sample-rate tables: band layout, thresholds, window."""

    def __init__(self, fs: int):
        if fs == 16000:
            self.nfft, self.nb, self.sp = 512, 49, _SP_16K
        elif fs == 8000:
            self.nfft, self.nb, self.sp = 256, 42, _SP_8K
        else:
            raise ValueError(f"PESQ supports 8 kHz / 16 kHz, got {fs}")
        self.fs = fs
        self.hop = self.nfft // 2
        n = np.arange(self.nfft)
        self.window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / self.nfft))
        freqs = np.fft.rfftfreq(self.nfft, 1.0 / fs)  # (nfft/2+1,)
        # Band layout: nb bands uniform on the Bark scale over (0, fs/2],
        # each band owning the consecutive FFT bins (DC excluded) whose
        # Bark value falls inside it — the structure of the ITU
        # nr_of_hz_bands_per_bark_band tables.
        edges = np.linspace(0.0, _bark(fs / 2.0) + 1e-9, self.nb + 1)
        bin_band = np.clip(np.digitize(_bark(freqs[1:]), edges) - 1, 0, self.nb - 1)
        self.W = np.zeros((self.nb, len(freqs)))
        counts = np.zeros(self.nb)
        for j, b in enumerate(bin_band):
            self.W[b, j + 1] = 1.0
            counts[b] += 1
        counts = np.maximum(counts, 1)
        self.W /= counts[:, None]          # mean power density per band
        self.width = np.diff(edges)        # Bark widths (uniform here)
        centers_b = 0.5 * (edges[:-1] + edges[1:])
        fg = np.linspace(1.0, fs / 2.0, 8192)
        self.center_hz = np.interp(centers_b, _bark(fg), fg)
        khz = self.center_hz / 1000.0
        thr_db = (3.64 * khz ** -0.8
                  - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
                  + 1e-3 * khz ** 4)
        self.abs_thresh = 10.0 ** (np.clip(thr_db, -30.0, 60.0) / 10.0)


def _model(fs: int) -> _Model:
    m = _MODEL_CACHE.get(fs)
    if m is None:
        m = _MODEL_CACHE[fs] = _Model(fs)
    return m


# =============================================================================
# Stage 1-2: level alignment + input filtering
# =============================================================================

def _band_power(x, fs, lo, hi):
    """Mean power of x restricted to [lo, hi] Hz (FFT brick-wall, the
    fix_power_level band limit)."""
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1.0 / fs)
    sel = (f >= lo) & (f <= hi)
    # Parseval: band power = sum |X|^2 / N^2 * 2 (one-sided)
    p = (np.sum(np.abs(X[sel]) ** 2) * 2.0) / (len(x) ** 2)
    return max(p, 1e-20)


def _fix_power_level(x, fs):
    """Scale so the mean 350-3250 Hz power equals the ITU calibration target
    (P.862 fix_power_level: PESQ operates at 16-bit sample scale; mean
    band-limited power 1e7 ~= RMS 3162)."""
    return x * np.sqrt(_TARGET_POWER / _band_power(x, fs, 350.0, 3250.0))


def _wb_input_filter(x):
    """P.862.2 wideband input filter: one IIR SOS (high-pass ~100 Hz with
    gain), replacing the narrowband IRS receive characteristic."""
    from scipy.signal import lfilter

    b0, b1, b2, a1, a2 = _WB_IIR_SOS
    return lfilter([b0, b1, b2], [1.0, a1, a2], x)


def _nb_input_filter(x, fs):
    """Narrowband IRS-like receive filter, applied in the frequency domain
    (the ITU apply_filter uses a piecewise-dB gain curve)."""
    pts_hz = np.array([0, 50, 100, 125, 160, 200, 250, 300, 350, 400,
                       500, 600, 700, 800, 1000, 1300, 1600, 2000, 2500,
                       3000, 3250, 3500, 4000, 5000, 6300, 8000], float)
    gains_db = np.array([-200, -40, -20, -12, -6, 0, 4, 6, 8, 10,
                         11, 12, 12, 12, 12, 12, 12, 12, 12,
                         12, 10, 4, -200, -200, -200, -200], float)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1.0 / fs)
    g = 10.0 ** (np.interp(f, pts_hz, gains_db) / 20.0)
    return np.fft.irfft(X * g, len(x))


# =============================================================================
# Stage 3: time alignment
# =============================================================================

_ALIGN_FRAME_MS = 4.0


def _frame_energies(x, fs):
    """Per-4ms-frame energies (the ITU crude-alignment / VAD feature)."""
    n = int(fs * _ALIGN_FRAME_MS / 1000.0)
    m = len(x) // n
    return np.sum(x[:m * n].reshape(m, n) ** 2, axis=1)


def _xcorr_argmax(a, b):
    """Lag of max cross-correlation of zero-mean sequences (FFT-based).
    Positive lag means b is delayed relative to a."""
    a = a - a.mean()
    b = b - b.mean()
    nf = 1 << int(np.ceil(np.log2(len(a) + len(b) - 1)))
    c = np.fft.irfft(np.conj(np.fft.rfft(a, nf)) * np.fft.rfft(b, nf), nf)
    # order lags [-(len(a)-1) .. len(b)-1]
    c_ord = np.concatenate([c[nf - len(a) + 1:], c[:len(b)]])
    i = int(np.argmax(c_ord))
    return i - (len(a) - 1), float(c_ord[i])


def _crude_align(ref, deg, fs):
    """Global delay estimate (samples) from log-envelope cross-correlation."""
    er = np.log2(_frame_energies(ref, fs) + 1e4)
    ed = np.log2(_frame_energies(deg, fs) + 1e4)
    frame = int(fs * _ALIGN_FRAME_MS / 1000.0)
    lag, _ = _xcorr_argmax(er, ed)
    return lag * frame


def _locate_utterances(energies, thr_db_below_max: float = 35.0,
                       min_frames: int = 50, join_gap: int = 50):
    """Active-speech sections of the reference envelope: frames above
    (max - thr) dB, min 200 ms long, gaps under 200 ms joined (the ITU
    utterance-search structure on the VAD profile)."""
    e_db = 10.0 * np.log10(energies + 1e-10)
    thr = e_db.max() - thr_db_below_max
    active = e_db > thr
    utts = []
    i = 0
    n = len(active)
    while i < n:
        if active[i]:
            j = i
            while j < n and active[j]:
                j += 1
            utts.append([i, j])
            i = j
        else:
            i += 1
    joined = []
    for u in utts:
        if joined and u[0] - joined[-1][1] < join_gap:
            joined[-1][1] = u[1]
        else:
            joined.append(u)
    return [(a, b) for a, b in joined if b - a >= min_frames]


def _fine_align(ref, deg, fs, search: int):
    """Per-utterance fine delay: 64 ms Hann windows every 4 ms; weighted
    histogram of per-window best lags (weight = corr^0.125), triangular
    smoothing; returns (delay_samples, confidence) — the ITU time_align
    histogram construction. All window correlations run as ONE batched FFT
    (the loop formulation cost ~0.4 s/call, dominating val-time PESQ)."""
    win = int(fs * 0.064)
    step = int(fs * 0.004)
    empty = (np.zeros(0, np.int64),) * 3
    if len(ref) < win or len(deg) < win:
        lag, _ = _xcorr_argmax(ref, deg)
        return lag, 0.0, empty
    h = np.hanning(win)
    nf = 1 << int(np.ceil(np.log2(win + 2 * search)))
    n = min(len(ref), len(deg))
    # pad so every window's [s - search, s + win + search) slice exists;
    # zeros contribute zero correlation, identical to skipping them
    degp = np.concatenate([np.zeros(search), deg,
                           np.zeros(search + win)])
    starts = np.arange(0, n - win, step)
    if len(starts) == 0:
        return 0, 0.0, empty
    idx_a = starts[:, None] + np.arange(win)[None, :]
    A = (ref[idx_a] * h[None, :]).astype(np.float32)  # (S, win)
    idx_b = starts[:, None] + np.arange(win + 2 * search)[None, :]
    Bm = degp[idx_b].astype(np.float32)               # (S, win + 2*search)
    # float32 FFTs: the histogram argmax is insensitive to the precision
    # and they run ~2x faster (the dominant cost of the whole metric)
    C = np.fft.irfft(np.conj(np.fft.rfft(A, nf, axis=1))
                     * np.fft.rfft(Bm, nf, axis=1), nf, axis=1)
    C = C[:, :2 * search + 1]  # lag s-search .. s+search relative to ref
    k = np.argmax(np.abs(C), axis=1)                 # (S,)
    w = np.abs(C[np.arange(len(starts)), k]) ** 0.125
    hist = np.bincount(k, weights=w, minlength=2 * search + 1)
    if hist.sum() <= 0:
        return 0, 0.0, (starts, k - search, w)
    # triangular smoothing +-1 ms
    tri_w = max(int(fs * 0.001), 1)
    kern = 1.0 - np.abs(np.arange(-tri_w, tri_w + 1)) / (tri_w + 1)
    sm = np.convolve(hist, kern, mode="same")
    best = int(np.argmax(sm))
    conf = float(sm[best] / (sm.sum() + 1e-12))
    return best - search, conf, (starts, k - search, w)


def _align_utterances(ref, deg, fs):
    """Full alignment: crude global delay, utterance segmentation, fine
    per-utterance delay, one level of delay-discontinuity splitting.
    Returns a list of (ref_start, ref_end, delay_samples)."""
    crude = _crude_align(ref, deg, fs)
    frame = int(fs * _ALIGN_FRAME_MS / 1000.0)
    energies = _frame_energies(ref, fs)
    utts = _locate_utterances(energies)
    if not utts:
        utts = [(0, len(energies))]
    # fine search covers the RESIDUAL of the crude (4 ms-frame envelope)
    # alignment: +-64 ms is ~16 envelope frames of slack (the crude stage
    # can err by several frames on noisy signals), and the halved
    # correlation span halves the FFT length (the metric's dominant cost)
    search = int(fs * 0.064)
    out = []
    for a, b in utts:
        r0, r1 = a * frame, min(b * frame, len(ref))
        d0 = r0 + crude
        seg_ref = ref[r0:r1]
        lo = max(d0 - search, 0)
        hi = min(d0 + (r1 - r0) + search, len(deg))
        seg_deg = deg[lo:hi]
        lag, conf, (w_starts, w_lags, w_wts) = _fine_align(
            seg_ref, seg_deg, fs, search)
        delay = crude + (lo - d0) + lag
        # delay-discontinuity split (ITU split_align): re-aligning the two
        # halves costs two more batched-FFT passes, so only attempt it when
        # the single pass's per-window lag evidence actually DISAGREES
        # between halves (weighted-median lag difference > 2 ms) — for
        # sample-aligned codec audio the halves agree and the whole metric
        # runs one alignment pass per utterance.
        mid = (r1 - r0) // 2
        halves_disagree = False
        if len(w_starts) >= 8:
            first = w_starts < mid
            if first.any() and (~first).any():
                def wmed(sel):
                    order = np.argsort(w_lags[sel])
                    cw = np.cumsum(w_wts[sel][order])
                    return w_lags[sel][order][
                        int(np.searchsorted(cw, cw[-1] / 2))]
                halves_disagree = abs(wmed(first) - wmed(~first)) > fs * 0.002
        if halves_disagree and mid > int(fs * 0.3):
            l1, c1, _ = _fine_align(seg_ref[:mid], deg[max(r0 + crude - search, 0):
                                                   min(r0 + crude + mid + search, len(deg))], fs, search)
            l2, c2, _ = _fine_align(seg_ref[mid:], deg[max(r0 + mid + crude - search, 0):
                                                   min(r1 + crude + search, len(deg))], fs, search)
            if min(c1, c2) > conf * 1.25 and abs(l1 - l2) > int(fs * 0.002):
                base1 = max(r0 + crude - search, 0) - (r0 + crude)
                base2 = max(r0 + mid + crude - search, 0) - (r0 + mid + crude)
                out.append((r0, r0 + mid, crude + base1 + l1))
                out.append((r0 + mid, r1, crude + base2 + l2))
                continue
        out.append((r0, r1, delay))
    return out


# =============================================================================
# Stage 4: perceptual model
# =============================================================================

def _frames(x, start, count, m: _Model):
    idx = start + m.hop * np.arange(count)[:, None] + np.arange(m.nfft)[None, :]
    idx = np.clip(idx, 0, len(x) - 1)
    mask = (start + m.hop * np.arange(count)[:, None]
            + np.arange(m.nfft)[None, :]) < len(x)
    return x[idx] * mask


def _bark_spectrum(frames_td, m: _Model):
    F = np.fft.rfft(frames_td * m.window[None, :], axis=1)
    P = (F.real ** 2 + F.imag ** 2)
    return (P @ m.W.T) * m.sp  # (frames, nb) pitch power densities


def _total_audible(P, m: _Model, factor: float = 1.0):
    aud = np.where(P > m.abs_thresh[None, :] * factor, P, 0.0)
    return aud.sum(axis=1)


def _loudness(P, m: _Model):
    thr = m.abs_thresh[None, :]
    L = _SL * (thr / 0.5) ** _ZWICKER * ((0.5 + 0.5 * P / thr) ** _ZWICKER - 1.0)
    return np.where(P > thr, L, 0.0)


# Calibration of the disturbance norms for the reconstructed tables: the
# ITU fixed tables define the absolute loudness-density units the 0.1/0.0309
# MOS weights assume; with formula-generated tables one shared scale is
# free. Fitted by least squares so speech-shaped anchors land at published
# wb-PESQ values (identical 4.64, AWGN SNR 40/30/20/10/5 dB ~=
# 4.5/4.3/3.5/1.8/1.4) — see tests/test_pesq_conformance.py.
_D_SCALE = 1.52
_DA_SCALE = 1.52


def _perceptual(ref, deg, utts, m: _Model):
    """Disturbance profiles over aligned frames -> (D, DA)."""
    d_frames = []
    da_frames = []
    for (r0, r1, delay) in utts:
        count = max((r1 - r0 - m.nfft) // m.hop + 1, 0)
        if count <= 0:
            continue
        Pr = _bark_spectrum(_frames(ref, r0, count, m), m)
        Pd = _bark_spectrum(_frames(deg, r0 + delay, count, m), m)
        # frequency (transducer) compensation: equalize the REFERENCE's
        # per-band mean toward the degraded over audible frames
        audible = _total_audible(Pr, m) > 1e2
        if audible.sum() >= 2:
            num = Pd[audible].mean(axis=0) + 1000.0
            den = Pr[audible].mean(axis=0) + 1000.0
            Pr = Pr * np.clip(num / den, 0.01, 100.0)[None, :]
        # short-term gain compensation: smoothed audible-power ratio
        er = _total_audible(Pr, m) + 5e3
        ed = _total_audible(Pd, m) + 5e3
        rate = er / ed
        h = np.empty(count)
        prev = rate[0]
        for i in range(count):
            prev = 0.8 * prev + 0.2 * rate[i]
            h[i] = min(max(prev, 3e-4), 5.0)
        Pd = Pd * h[:, None]
        Lr, Ld = _loudness(Pr, m), _loudness(Pd, m)
        d = Ld - Lr
        dead = 0.25 * np.minimum(np.abs(Ld), np.abs(Lr))
        d = np.sign(d) * np.maximum(np.abs(d) - dead, 0.0)
        # asymmetry: added spectral content weighted up
        asym = ((Pd + 50.0) / (Pr + 50.0)) ** 1.2
        asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))
        w = m.width[None, :]
        wsum = m.width.sum()
        d_f = np.sqrt(np.sum(w * d * d, axis=1) / wsum) * wsum * _D_SCALE
        da_f = np.sum(w * np.abs(d) * asym, axis=1) * _DA_SCALE
        # frame weighting by reference audible energy
        wt = ((_total_audible(Pr, m) + 1e5) / 1e7) ** 0.04
        d_f = np.minimum(d_f / wt, 45.0)
        da_f = np.minimum(da_f / wt, 45.0)
        d_frames.append(d_f)
        da_frames.append(da_f)
    if not d_frames:
        return None, None
    d_f = np.concatenate(d_frames)
    da_f = np.concatenate(da_frames)
    return _l6_l2(d_f), _l6_l2(da_f)


def _l6_l2(df):
    """L6 over 20-frame 'split-second' intervals every 10 frames, then L2
    over the interval series (P.862 aggregation)."""
    if len(df) == 0:
        return 0.0
    sup = [np.mean(np.minimum(df[i:i + 20], 45.0) ** 6) ** (1.0 / 6.0)
           for i in range(0, len(df), 10)]
    return float(np.sqrt(np.mean(np.square(sup))))


# =============================================================================
# Public API
# =============================================================================

def pesq_p862(ref, deg, fs: int = 16000, mode: str = "wb") -> float:
    """PESQ MOS-LQO of `deg` against `ref` (full P.862 pipeline).

    mode='wb' (P.862.2 wideband, 16 kHz — the reference's metric) or
    mode='nb' (P.862 narrowband with the P.862.1 mapping).
    Returns NaN for degenerate inputs (too short / silent).
    """
    x = np.asarray(ref, np.float64).ravel()
    y = np.asarray(deg, np.float64).ravel()
    if min(len(x), len(y)) < fs // 4:
        return float("nan")
    if np.max(np.abs(x)) < 1e-8 or np.max(np.abs(y)) < 1e-8:
        return float("nan")
    x = _fix_power_level(x, fs)
    y = _fix_power_level(y, fs)
    if mode == "wb":
        x = _wb_input_filter(x)
        y = _wb_input_filter(y)
    else:
        x = _nb_input_filter(x, fs)
        y = _nb_input_filter(y, fs)
    m = _model(fs)
    utts = _align_utterances(x, y, fs)
    # score only frames whose degraded counterpart exists: shift the window
    # start up for negative delays and pull the end in when the delay pushes
    # past the degraded signal (the ITU per-utterance frame-range limits)
    utts = [(max(r0, -d), min(r1, len(y) - d), d) for (r0, r1, d) in utts]
    utts = [(r0, r1, d) for (r0, r1, d) in utts if r1 - r0 >= m.nfft]
    D, DA = _perceptual(x, y, utts, m)
    if D is None:
        return float("nan")
    raw = 4.5 - _D_WEIGHT * D - _DA_WEIGHT * DA
    if mode == "wb":
        return float(0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224)))
    return float(0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607)))
