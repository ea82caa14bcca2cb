"""Metric tests: SI-SNR/SI-SDR reference formulas, codebook stats, STOI behavior."""
import numpy as np
import jax.numpy as jnp

from audiotokenization_tpu.train import metrics as M


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
