"""Native C++ FLAC decoder round-trip tests against the test-only encoder."""
import numpy as np
import pytest

from flac_encoder import encode_flac

from audiotokenization_tpu.data.flac import decode_flac_bytes


def _roundtrip(x, sr, mode, bps=16):
    data = encode_flac(x, sr, bps=bps, mode=mode)
    got, got_sr = decode_flac_bytes(data)
    assert got_sr == sr
    scale = float(1 << (bps - 1))
    ref = np.atleast_2d(x).astype(np.float32) / scale
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_verbatim_mono():
    rng = np.random.RandomState(0)
    x = (rng.randn(1, 1000) * 8000).astype(np.int64).clip(-32768, 32767)
    _roundtrip(x, 16000, "verbatim")


def test_verbatim_stereo_partial_last_frame():
    rng = np.random.RandomState(1)
    x = (rng.randn(2, 777) * 8000).astype(np.int64).clip(-32768, 32767)
    _roundtrip(x, 24000, "verbatim")


def test_constant_frames():
    x = np.full((1, 512), -1234, np.int64)
    _roundtrip(x, 16000, "constant")


def test_fixed_order2_rice():
    t = np.arange(2048)
    x = (6000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int64)[None]
    _roundtrip(x, 16000, "fixed2")


def test_read_audio_dispatch(tmp_path):
    from audiotokenization_tpu.data.audio_io import read_audio, write_wav

    rng = np.random.RandomState(2)
    wav = (rng.randn(800) * 0.1).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 16000)
    x, sr = read_audio(tmp_path / "a.wav")
    assert sr == 16000 and x.shape == (1, 800)
    np.testing.assert_allclose(x[0], wav, atol=1e-3)

    flac_bytes = encode_flac((wav * 32767).astype(np.int64)[None], 16000)
    (tmp_path / "a.flac").write_bytes(flac_bytes)
    xf, srf = read_audio(tmp_path / "a.flac")
    assert srf == 16000
    np.testing.assert_allclose(xf[0], wav, atol=1e-3)
