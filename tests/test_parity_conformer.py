"""Parity: reference Conformer STFT encoder / ISTFT decoder vs converted JAX."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_loader import load_reference

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.models import conformer as CF

DIM, LAYERS, HEADS = 64, 2, 4
HOP, NFFT = 200, 800
T = 4000


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def ref_models():
    vq = load_reference()
    torch.manual_seed(0)
    enc = vq.ConformerEncoderSTFT(hop_length=HOP, n_fft=NFFT, window_size=NFFT,
                                  dim=DIM, n_layers=LAYERS, n_head=HEADS,
                                  dropout=0.0, rope_theta=500.0,
                                  out_channels=DIM).eval()
    dec = vq.ConformerDecoderISTFT(in_channels=DIM, hop_length=HOP, n_fft=NFFT,
                                   window_size=NFFT, dim=DIM, n_layers=LAYERS,
                                   n_head=HEADS, dropout=0.0, rope_theta=500.0,
                                   codebook_size=64, codebook_dim=8).eval()
    return enc, dec


def test_conformer_encoder_parity(ref_models):
    enc, _ = ref_models
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, T).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    params = CV.convert_conformer_encoder(_sd(enc), n_layers=LAYERS)
    got = np.asarray(CF.conformer_encode(params, jnp.asarray(x), hop_length=HOP,
                                         n_fft=NFFT, window_size=NFFT,
                                         n_head=HEADS, rope_theta=500.0))
    assert got.shape == ref.shape == (2, DIM, T // HOP)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_conformer_decoder_parity(ref_models):
    _, dec = ref_models
    rng = np.random.RandomState(1)
    lat = rng.randn(2, DIM, 16).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(lat), vq=False).numpy()
    params = CV.convert_conformer_decoder(_sd(dec), n_layers=LAYERS)
    got = np.asarray(CF.conformer_decode(params, jnp.asarray(lat), hop_length=HOP,
                                         n_fft=NFFT, n_head=HEADS, rope_theta=500.0))
    assert got.shape == ref.shape == (2, 1, 16 * HOP)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
