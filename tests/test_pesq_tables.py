"""Structural validation of the transcribed ITU-T P.862 fixed tables.

The tables in train/pesq_tables.py are published standards constants
(pesqpar.h of the ITU P.862 reference implementation). These tests verify
the transcription through the strong internal identities the real tables
satisfy — a wrong or shuffled entry breaks at least one of them.
"""
import numpy as np

from audiotokenization_tpu.train import pesq_tables as T
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_band_counts_and_fft_sizes():
    assert T.NB_16K == 49 and T.NFFT_16K == 512
    assert T.NB_8K == 42 and T.NFFT_8K == 256
    for name in ("CENTRE_OF_BAND_BARK", "CENTRE_OF_BAND_HZ",
                 "WIDTH_OF_BAND_BARK", "WIDTH_OF_BAND_HZ",
                 "NR_OF_HZ_BANDS_PER_BARK_BAND",
                 "POW_DENS_CORRECTION_FACTOR", "ABS_THRESH_POWER"):
        t16 = getattr(T, name + "_16K")
        t8 = getattr(T, name + "_8K")
        assert len(t16) == 49 and len(t8) == 42
        # both rates share the 31.25 Hz bin width, so the 8 kHz tables are
        # exact prefixes of the 16 kHz tables
        np.testing.assert_array_equal(t8, t16[:42])


def test_bin_counts_cover_the_fft_exactly():
    # sum of FFT bins over bands == Nfft/2 (bins 0..Nfft/2-1, DC in band 0)
    assert int(T.NR_OF_HZ_BANDS_PER_BARK_BAND_16K.sum()) == T.NFFT_16K // 2
    # 8 kHz: the shared prefix covers one bin past Nfft/2 on paper because
    # band 41 (3820 Hz centre) extends past the 8 kHz Nyquist; the model
    # truncates reads at the rfft length
    assert int(T.NR_OF_HZ_BANDS_PER_BARK_BAND_8K.sum()) in (
        T.NFFT_8K // 2, T.NFFT_8K // 2 + 1)


def test_bands_abut_on_the_bark_scale():
    c = T.CENTRE_OF_BAND_BARK_16K
    w = T.WIDTH_OF_BAND_BARK_16K
    # adjacent abutting bands: centre step == mean of adjacent widths
    np.testing.assert_allclose(np.diff(c), 0.5 * (w[:-1] + w[1:]), atol=5e-3)
    assert np.all(np.diff(c) > 0) and np.all(w > 0)


def test_pow_dens_correction_matches_bin_counts():
    nr = T.NR_OF_HZ_BANDS_PER_BARK_BAND_16K.astype(float)
    corr = T.POW_DENS_CORRECTION_FACTOR_16K
    # correction ~= 100 / bins-per-band (mean power density, x100 in Sp
    # units), published with sub-1e-5 calibration wiggles
    np.testing.assert_allclose(corr, 100.0 / nr, rtol=2e-5)


def test_centre_hz_consistent_with_widths():
    c = T.CENTRE_OF_BAND_HZ_16K
    w = T.WIDTH_OF_BAND_HZ_16K
    # Hz centres also step by the mean of adjacent Hz widths (within the
    # warping tolerance; the last band is Nyquist-truncated)
    step = np.diff(c)
    pred = 0.5 * (w[:-1] + w[1:])
    assert np.all(np.abs(step[:-2] - pred[:-2]) / pred[:-2] < 0.025)


def test_abs_thresh_is_a_threshold_in_quiet_curve():
    thr_db = 10.0 * np.log10(T.ABS_THRESH_POWER_16K)
    # monotone decreasing to the ~1 kHz minimum, then mildly rising/flat
    i_min = int(np.argmin(thr_db))
    assert 20 <= i_min <= 28  # ~1 kHz region
    assert np.all(np.diff(thr_db[:i_min]) <= 1e-9)
    assert np.all(np.diff(thr_db[i_min:]) >= -1e-9)
    assert thr_db[0] > 70  # DC band effectively never audible
    assert -6.1 < thr_db.min() < -5.9
