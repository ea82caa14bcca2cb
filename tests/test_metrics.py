"""Metric tests: SI-SNR/SI-SDR reference formulas, codebook stats, STOI behavior."""
import numpy as np
import jax.numpy as jnp

from audiotokenization_tpu.train import metrics as M
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def _si_sdr_numpy(est, target, zero_mean):
    if zero_mean:
        est = est - est.mean(-1, keepdims=True)
        target = target - target.mean(-1, keepdims=True)
    alpha = (est * target).sum(-1, keepdims=True) / ((target ** 2).sum(-1, keepdims=True) + 1e-8)
    s = alpha * target
    e = est - s
    return (10 * np.log10(((s ** 2).sum(-1) + 1e-8) / ((e ** 2).sum(-1) + 1e-8))).mean()


def test_si_sdr_formula():
    rng = np.random.RandomState(0)
    t = rng.randn(4, 1000).astype(np.float32)
    e = t + 0.1 * rng.randn(4, 1000).astype(np.float32)
    got = float(M.si_sdr(jnp.asarray(e), jnp.asarray(t)))
    ref = _si_sdr_numpy(e, t, False)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_si_snr_scale_invariance():
    rng = np.random.RandomState(1)
    t = rng.randn(2, 800).astype(np.float32)
    e = t + 0.05 * rng.randn(2, 800).astype(np.float32)
    a = float(M.si_snr(jnp.asarray(e), jnp.asarray(t)))
    b = float(M.si_snr(jnp.asarray(3.7 * e), jnp.asarray(t)))
    np.testing.assert_allclose(a, b, rtol=1e-3)
    assert a > 20  # small noise -> high SI-SNR


def test_codebook_stats():
    idx = jnp.asarray([0, 0, 1, 2, 3, 3, 3, 3])
    hist = M.codebook_histogram(idx, 8)
    np.testing.assert_array_equal(np.asarray(hist), [2, 1, 1, 4, 0, 0, 0, 0])
    # uniform over 4 of 8 codes
    uh = M.codebook_histogram(jnp.asarray([0, 1, 2, 3]), 8)
    np.testing.assert_allclose(float(M.perplexity_from_histogram(uh)), 4.0, rtol=1e-5)
    np.testing.assert_allclose(float(M.utilization_from_histogram(uh)), 0.5)


def test_stoi_behaviour():
    rng = np.random.RandomState(2)
    fs = 16000
    t = np.arange(3 * fs) / fs
    # speech-ish: sum of AM tones
    clean = (np.sin(2 * np.pi * 220 * t) * (1 + np.sin(2 * np.pi * 3 * t))
             + 0.5 * np.sin(2 * np.pi * 800 * t) * (1 + np.cos(2 * np.pi * 5 * t)))
    clean = clean.astype(np.float32)
    perfect = M.stoi(clean, clean, fs)
    noisy = clean + 0.5 * rng.randn(len(clean)).astype(np.float32)
    very_noisy = clean + 4.0 * rng.randn(len(clean)).astype(np.float32)
    s1 = M.stoi(clean, noisy, fs)
    s2 = M.stoi(clean, very_noisy, fs)
    assert perfect > 0.99
    assert perfect > s1 > s2
    assert 0.0 <= s2 < 0.85


def test_pesq_native_behavior():
    """Native full-P.862 (train/pesq_p862.py, via the pesq_metric dispatch):
    max on identical, monotone under noise, level-invariant, penalizes
    bandwidth loss. Conformance + alignment tests live in
    test_pesq_conformance.py."""
    import numpy as np

    def pesq_approx(a, b, fs=16000):
        from audiotokenization_tpu.train.metrics import pesq_metric

        return pesq_metric(a, b, fs)

    rng = np.random.RandomState(0)
    fs, n = 16000, 2 * 16000
    white = rng.randn(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / fs)
    spec *= (np.exp(-((f - 500) / 400) ** 2)
             + 0.5 * np.exp(-((f - 1500) / 600) ** 2) + 0.05) / np.sqrt(np.maximum(f, 50))
    clean = np.fft.irfft(spec, n)
    clean *= np.clip(np.sin(2 * np.pi * 3.1 * np.arange(n) / fs), 0.05, None)
    clean /= np.std(clean)

    top = pesq_approx(clean, clean)
    assert 4.5 < top <= 4.65
    # level invariance
    assert abs(pesq_approx(3 * clean, 3 * clean) - top) < 1e-6
    assert abs(pesq_approx(clean, 0.3 * clean) - top) < 0.05
    # monotone under increasing white noise
    prev = top + 1e-9
    for snr in (30, 20, 10, 0):
        noise = rng.randn(n)
        noise *= 10 ** (-snr / 20) * np.std(clean) / np.std(noise)
        v = pesq_approx(clean, clean + noise)
        assert v <= prev + 1e-6, (snr, v, prev)
        prev = v
    # heavy noise lands near the floor (the exact-table model puts 0 dB
    # white noise on this synthetic signal at ~1.7; exact conformance is
    # the oracle-gated bound in test_pesq_conformance.py)
    assert prev < 1.8
    # bandwidth loss is penalized
    s2 = np.fft.rfft(clean)
    s2[f > 3000] = 0
    lp = pesq_approx(clean, np.fft.irfft(s2, n))
    # exact-table model: removing the sparse >3 kHz tail of this synthetic
    # spectrum costs ~0.3 MOS (the asymmetry term weights ADDED content,
    # not removed — P.862's documented behavior)
    assert lp < top - 0.2


def test_masked_si_equals_trimmed():
    """Per-sample masked SI-SNR/SI-SDR over a padded batch == the plain
    metric on each trimmed pair."""
    from audiotokenization_tpu.train.metrics import masked_si, si_sdr, si_snr

    rng = np.random.RandomState(0)
    lens = [900, 500, 1000]
    gt = np.zeros((3, 1000), np.float32)
    gen = rng.randn(3, 1000).astype(np.float32)  # garbage beyond lens is fine
    for i, L in enumerate(lens):
        gt[i, :L] = rng.randn(L) * 0.3
        gen[i, :L] = gt[i, :L] + rng.randn(L).astype(np.float32) * 0.05
    snr = np.asarray(masked_si(jnp.asarray(gen), jnp.asarray(gt),
                               jnp.asarray(lens, jnp.int32), zero_mean=True))
    sdr = np.asarray(masked_si(jnp.asarray(gen), jnp.asarray(gt),
                               jnp.asarray(lens, jnp.int32), zero_mean=False))
    for i, L in enumerate(lens):
        ref_snr = float(si_snr(jnp.asarray(gen[i, :L])[None],
                               jnp.asarray(gt[i, :L])[None]))
        ref_sdr = float(si_sdr(jnp.asarray(gen[i, :L])[None],
                               jnp.asarray(gt[i, :L])[None]))
        np.testing.assert_allclose(snr[i], ref_snr, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(sdr[i], ref_sdr, rtol=1e-4, atol=1e-4)
