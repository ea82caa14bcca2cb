"""STOI conformance (VERDICT r2 missing #2 — the PESQ treatment for STOI).

The reference's val_stoi is torchmetrics ShortTimeObjectiveIntelligibility,
whose backend is pystoi (lightning_module.py:214-218). The in-repo
train/metrics.stoi mirrors pystoi.stoi(extended=False) step for step —
exclusive framing ranges, machine-eps guards, norm-ratio normalization,
clipped unit-vector correlation — with ONE known deviation: resampling to
the 10 kHz operating rate uses ops/resample (kaiser sinc) instead of
scipy.signal.resample_poly.

1. `test_stoi_vs_pystoi_*` — golden tests against the actual pystoi oracle
   (pure numpy; activates wherever `pip install pystoi` has happened — the
   package is absent from this image, as from the reference's requirements):
   bit-tight at fs=10000 (no resampling -> identical pipelines), bounded at
   fs=16000 (resampler-only difference).
2. `test_stoi_regression_fixture` — always-on pinned values on a
   deterministic degradation sweep, so numerics drift in stoi() fails the
   suite even without the oracle.
"""
import numpy as np
import pytest

from audiotokenization_tpu.train.metrics import stoi

from test_pesq_conformance import _degradations, _speechish

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick

try:
    import pystoi as _pystoi_pkg  # noqa: F401

    HAVE_PYSTOI = True
except ImportError:
    HAVE_PYSTOI = False


def _speechish_10k(n=20000, seed=3):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 10000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.1 * t)
    phase = 2 * np.pi * np.cumsum(f0) / 10000.0
    x = sum(0.3 / k * np.sin(k * phase) for k in (1, 2, 3, 4))
    env = 0.4 + 0.6 * (np.sin(2 * np.pi * 3.0 * t) > -0.2)
    return (0.5 * (x * env + 0.01 * rng.randn(n)) / np.abs(x).max()).astype(
        np.float32)


def _awgn_10k(ref, snr, rng):
    noise = rng.randn(len(ref)).astype(np.float32)
    noise *= np.linalg.norm(ref) / np.linalg.norm(noise) / (10 ** (snr / 20))
    return ref + noise


@pytest.mark.skipif(not HAVE_PYSTOI, reason="pystoi not installed "
                                            "(no STOI oracle in image)")
def test_stoi_vs_pystoi_10k_exact():
    """At the 10 kHz operating rate no resampling happens, so the in-repo
    pipeline must match pystoi to float64 rounding."""
    from pystoi import stoi as py_stoi

    ref = _speechish_10k()
    rng = np.random.RandomState(4)
    for snr in (30, 20, 10, 0):
        deg = _awgn_10k(ref, snr, rng)
        ours = stoi(ref, deg, 10000)
        oracle = py_stoi(ref.astype(np.float64), deg.astype(np.float64),
                         10000, extended=False)
        np.testing.assert_allclose(ours, oracle, atol=1e-8,
                                   err_msg=f"awgn_{snr}dB")


@pytest.mark.skipif(not HAVE_PYSTOI, reason="pystoi not installed")
def test_stoi_vs_pystoi_16k_bounded():
    """At 16 kHz both pipelines resample to 10 kHz; ours with ops/resample,
    pystoi with scipy resample_poly — the score difference must stay within
    the resampler deviation budget."""
    from pystoi import stoi as py_stoi

    ref = _speechish()
    for name, deg in _degradations(ref).items():
        ours = stoi(ref, deg, 16000)
        oracle = py_stoi(ref.astype(np.float64), np.asarray(deg, np.float64),
                         16000, extended=False)
        assert abs(ours - oracle) < 0.02, (name, ours, oracle)


@pytest.mark.skipif(not HAVE_PYSTOI, reason="pystoi not installed")
def test_thirdoct_matches_pystoi():
    from pystoi.utils import thirdoct

    from audiotokenization_tpu.train.metrics import _thirdoct

    obm, _ = thirdoct(10000, 512, 15, 150)
    np.testing.assert_array_equal(_thirdoct(10000, 512, 15, 150.0), obm)


def test_stoi_regression_fixture():
    """Always-on drift detector: frozen outputs of the in-repo stoi() on a
    deterministic sweep (re-pin intentionally if the algorithm changes)."""
    ref = _speechish()
    got16 = {name: stoi(ref, deg, 16000)
             for name, deg in _degradations(ref).items()}
    pinned16 = {
        "awgn_40dB": 0.9847814173517482,
        "awgn_30dB": 0.8945220760928836,
        "awgn_20dB": 0.6452493105595843,
        "awgn_10dB": 0.5045757530171081,
        "awgn_5dB": 0.46401976733911565,
        "lowpass_2k": 0.589264712801349,
        "clip_50pct": 0.5671019129215118,
        "quant_6bit": 0.8338350002530895,
    }
    for k, v in pinned16.items():
        np.testing.assert_allclose(got16[k], v, atol=5e-6, err_msg=k)
    # perfect reconstruction scores ~1.0; monotone in SNR
    np.testing.assert_allclose(stoi(ref, ref, 16000), 1.0, atol=1e-9)
    snrs = [got16[f"awgn_{s}dB"] for s in (40, 30, 20, 10, 5)]
    assert all(a > b for a, b in zip(snrs, snrs[1:]))

    ref10 = _speechish_10k()
    rng = np.random.RandomState(3)
    # the rng continues after _speechish_10k's internal draw — keep the draw
    # order identical to the pin-generation script
    rng.randn(len(ref10))
    pinned10 = {30: 0.8836190881586955, 10: 0.4732012085322866,
                0: 0.3642297422638779}
    for snr, v in pinned10.items():
        deg = _awgn_10k(ref10, snr, rng)
        np.testing.assert_allclose(stoi(ref10, deg, 10000), v, atol=5e-6,
                                   err_msg=f"10k awgn_{snr}dB")


def test_stoi_silent_and_short_inputs():
    """Degenerate inputs must not crash: all-silent signals keep every frame
    (all energies equal) and score ~0 through the zero-correlation path —
    same as pystoi; too-short inputs return NaN (run_validation filters
    non-finite scores; pystoi warns and returns 1e-5 instead)."""
    s = stoi(np.zeros(16000, np.float32), np.zeros(16000, np.float32), 16000)
    assert np.isnan(s) or abs(s) < 0.01
    assert np.isnan(stoi(np.ones(100, np.float32),
                         np.ones(100, np.float32), 16000))
