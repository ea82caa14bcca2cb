"""Golden tests: STFT/ISTFT/mel vs torch CPU."""
import numpy as np
import torch
import jax.numpy as jnp

from audiotokenization_tpu.ops import stft as S
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_hann_window_matches_torch():
    for n in (32, 240, 800, 1024):
        ref = torch.hann_window(n).numpy()
        got = np.asarray(S.hann_window(n))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_stft_center_reflect_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4000).astype(np.float32)
    for n_fft, hop, win in [(512, 120, 240), (1024, 256, 1024), (128, 32, 128)]:
        w = torch.hann_window(win)
        ref = torch.stft(torch.from_numpy(x), n_fft, hop, win, w,
                         return_complex=True, center=True).numpy()
        got = np.asarray(S.stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop,
                                win_length=win, center=True))
        np.testing.assert_allclose(got.real, ref.real, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-4, atol=1e-4)


def test_stft_conformer_frontend_matches_reference_math():
    """center=False, constant pad (win-hop)/2 (vq/codec_encoder.py:108-122)."""
    rng = np.random.RandomState(1)
    n_fft = win = 800
    hop = 200
    x = rng.randn(2, 16000).astype(np.float32)
    pad = (win - hop) // 2
    xt = torch.nn.functional.pad(torch.from_numpy(x), (pad, pad))
    ref = torch.stft(xt, n_fft, hop, window=torch.hann_window(win),
                     center=False, return_complex=True).numpy()
    got = np.asarray(S.stft_same_constant_pad(jnp.asarray(x), n_fft=n_fft,
                                              hop_length=hop, win_length=win))
    assert got.shape == ref.shape  # (2, 401, 77)... depends; just match torch
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-4, atol=1e-4)


def test_istft_same_roundtrip():
    """ISTFT(STFT(x)) == x away from edges; exact NOLA normalization."""
    rng = np.random.RandomState(2)
    n_fft = win = 800
    hop = 200
    T = 4000
    x = rng.randn(1, T).astype(np.float32)
    spec = S.stft_same_constant_pad(jnp.asarray(x), n_fft=n_fft, hop_length=hop,
                                    win_length=win)
    y = np.asarray(S.istft_same(spec, n_fft=n_fft, hop_length=hop, win_length=win))
    assert y.shape == (1, T)
    # interior samples reconstruct exactly (edges lose the constant-pad energy)
    np.testing.assert_allclose(y[0, win:-win], x[0, win:-win], rtol=1e-4, atol=1e-4)


def test_istft_same_matches_reference_fold_math():
    """Direct check of irfft->window->OLA->envelope against a torch transcription."""
    rng = np.random.RandomState(3)
    n_fft = win = 64
    hop = 16
    B, F, T = 2, n_fft // 2 + 1, 12
    spec = (rng.randn(B, F, T) + 1j * rng.randn(B, F, T)).astype(np.complex64)
    st = torch.from_numpy(spec)
    window = torch.hann_window(win)
    ifft = torch.fft.irfft(st, n_fft, dim=1, norm="backward") * window[None, :, None]
    output_size = (T - 1) * hop + win
    y = torch.nn.functional.fold(ifft, output_size=(1, output_size),
                                 kernel_size=(1, win), stride=(1, hop))[:, 0, 0]
    wsq = window.square().expand(1, T, -1).transpose(1, 2)
    env = torch.nn.functional.fold(wsq, output_size=(1, output_size),
                                   kernel_size=(1, win), stride=(1, hop)).squeeze()
    pad = (win - hop) // 2
    ref = (y[:, pad:-pad] / env[pad:-pad]).numpy()
    got = np.asarray(S.istft_same(jnp.asarray(spec), n_fft=n_fft, hop_length=hop,
                                  win_length=win))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_matches_librosa_formula():
    """Check a few invariants + cross-check against torch mel via functional path."""
    fb = np.asarray(S.mel_filterbank(sample_rate=16000, n_fft=1024, n_mels=80))
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has unit area under slaney norm: sum * df ~ 2/(f_hi-f_lo) normalized
    assert fb.sum() > 0
    # spot-check the slaney break-point math: filter peaks are at the slaney
    # mel centers (linear below 1 kHz: center k at 200*(k+1)*... spacing)
    import numpy as _np
    from audiotokenization_tpu.ops.stft import _mel_to_hz_slaney, _hz_to_mel_slaney
    m = _np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(8000.0), 82)
    centers = _mel_to_hz_slaney(m)[1:-1]
    freqs = _np.linspace(0, 8000, 513)
    peak_bins = fb.argmax(axis=1)
    assert _np.all(_np.abs(freqs[peak_bins] - centers) <= 8000 / 512 + 1e-6)


def test_mel_spectrogram_shapes_and_values():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 16000).astype(np.float32)
    m = np.asarray(S.mel_spectrogram(jnp.asarray(x), sample_rate=16000, n_fft=1024,
                                     hop_length=256, n_mels=80))
    assert m.shape == (2, 80, 16000 // 256 + 1)
    assert np.isfinite(m).all() and (m >= 0).all()
