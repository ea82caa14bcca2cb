"""Parity: causal Conformer encoder (causal attention + causal depthwise conv)."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_loader import load_reference

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.models import conformer as CF


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_causal_conformer_encoder_parity():
    vq = load_reference()
    torch.manual_seed(0)
    enc = vq.ConformerEncoderSTFT(hop_length=200, n_fft=800, window_size=800,
                                  dim=64, n_layers=2, n_head=4, dropout=0.0,
                                  rope_theta=500.0, causal=True,
                                  out_channels=64).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 4000).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    params = CV.convert_conformer_encoder(_sd(enc), n_layers=2)
    got = np.asarray(CF.conformer_encode(params, jnp.asarray(x), hop_length=200,
                                         n_fft=800, window_size=800, n_head=4,
                                         rope_theta=500.0, causal=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=3e-4)
