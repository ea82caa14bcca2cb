"""Golden parity for the polyphase resampler (torchaudio.transforms.Resample
semantics, BigCodec_SSL/data_module.py:97-98).

torchaudio is not in this image, so the oracle is a brute-force dense
evaluation of the published kernel definition (lowpass_filter_width=6,
rolloff 0.99, Hann(cos^2)-windowed sinc at base_freq = min(of, nf)*rolloff):

    y[n] = sum_m x[m] * scale * sinc(t) * cos(t*pi/(2W))^2,
    t = (m/of - n/nf) * base_freq, |t| <= W, scale = base_freq / of

computed in float64 with no conv/stride/padding machinery — it cross-checks
the production path's polyphase indexing, padding, and phase layout.
"""
import math

import numpy as np
import pytest

from audiotokenization_tpu.ops.resample import resample


def _dense_resample(x, orig_freq, new_freq, *, W=6, rolloff=0.99):
    g = math.gcd(orig_freq, new_freq)
    of, nf = orig_freq // g, new_freq // g
    base = min(of, nf) * rolloff
    scale = base / of
    out_len = int(math.ceil(len(x) * nf / of))
    n = np.arange(out_len, dtype=np.float64)[:, None]
    m = np.arange(len(x), dtype=np.float64)[None, :]
    t = (m / of - n / nf) * base
    k = np.where(np.abs(t) <= W,
                 scale * np.sinc(t) * np.cos(t * np.pi / (2 * W)) ** 2, 0.0)
    return k @ x.astype(np.float64)


@pytest.mark.parametrize("sr_in,sr_out", [
    (8000, 16000), (22050, 16000), (24000, 16000), (44100, 16000),
    (16000, 8000),
])
def test_resample_matches_dense_oracle(sr_in, sr_out):
    rng = np.random.RandomState(sr_in % 1000)
    x = (rng.randn(3000) * 0.3).astype(np.float32)
    got = np.asarray(resample(x, sr_in, sr_out))
    want = _dense_resample(x, sr_in, sr_out)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_resample_noop_and_batched():
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 3, 500) * 0.3).astype(np.float32)
    assert resample(x, 16000, 16000) is x
    got = np.asarray(resample(x, 8000, 16000))
    assert got.shape == (2, 3, 1000)
    want = _dense_resample(x[1, 2], 8000, 16000)
    np.testing.assert_allclose(got[1, 2], want, atol=2e-5, rtol=1e-4)
