"""Parity for config variants: causal convs and anti-aliased activations."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_loader import load_reference, load_reference_module

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.models import bigcodec as BC


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_causal_encoder_parity():
    vq = load_reference()
    torch.manual_seed(0)
    enc = vq.BigCodecEncoder(ngf=8, out_channels=64, causal=True).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 2000).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    params = CV.convert_bigcodec_encoder(_sd(enc))
    got = np.asarray(BC.bigcodec_encode(params, jnp.asarray(x), causal=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_causal_decoder_parity():
    vq = load_reference()
    torch.manual_seed(1)
    dec = vq.BigCodecDecoder(in_channels=64, upsample_initial_channel=96,
                             codebook_size=64, codebook_dim=8, causal=True).eval()
    rng = np.random.RandomState(1)
    lat = rng.randn(2, 64, 10).astype(np.float32)
    with torch.no_grad():
        zq, _, _ = dec(torch.from_numpy(lat), vq=True)
        ref = dec(zq, vq=False).numpy()
    dparams = CV.convert_bigcodec_decoder(_sd(dec))
    from audiotokenization_tpu.models.quantizers import factorized_vq as FQ

    qparams = CV.convert_residual_vq(_sd(dec), num_quantizers=1)
    zq_j, _, _ = FQ.residual_vq_apply(qparams, jnp.asarray(lat), num_quantizers=1,
                                      use_pallas=False)
    got = np.asarray(BC.bigcodec_decode(dparams, zq_j, causal=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-5)


def test_causal_streaming_property():
    """Causal encoder: output at frame t must not depend on future samples."""
    vq = load_reference()
    torch.manual_seed(2)
    enc = vq.BigCodecEncoder(ngf=8, out_channels=32, causal=True, use_rnn=True).eval()
    params = CV.convert_bigcodec_encoder(_sd(enc))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 1, 2000).astype(np.float32)
    full = np.asarray(BC.bigcodec_encode(params, jnp.asarray(x), causal=True))
    half = np.asarray(BC.bigcodec_encode(params, jnp.asarray(x[..., :1000]), causal=True))
    np.testing.assert_allclose(half, full[..., :half.shape[-1]], rtol=1e-3, atol=1e-4)


def test_antialias_activation_parity():
    """Activation1d with antialias=True: up2 -> snake -> down2 (alias_free_torch)."""
    act_mod = load_reference_module("vq.alias_free_torch.act")
    acts = load_reference_module("vq.activations")
    torch.manual_seed(3)
    C = 8
    ref_act = act_mod.Activation1d(
        activation=acts.SnakeBeta(C, alpha_logscale=True), antialias=True).eval()
    with torch.no_grad():
        ref_act.act.alpha.copy_(torch.randn(C) * 0.1)
        ref_act.act.beta.copy_(torch.randn(C) * 0.1)
    rng = np.random.RandomState(3)
    x = rng.randn(2, C, 100).astype(np.float32)
    with torch.no_grad():
        ref = ref_act(torch.from_numpy(x)).numpy()

    from audiotokenization_tpu.models.bigcodec import _AA

    aa = _AA(antialias=True)
    sp = {"alpha": jnp.asarray(ref_act.act.alpha.detach().numpy()),
          "beta": jnp.asarray(ref_act.act.beta.detach().numpy())}
    got = np.asarray(aa(jnp.asarray(x), sp))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_antialias_encoder_parity():
    """Full encoder with antialias=True (cfgs/config11 capability)."""
    vq = load_reference()
    torch.manual_seed(4)
    enc = vq.BigCodecEncoder(ngf=8, out_channels=32, antialias=True).eval()
    rng = np.random.RandomState(4)
    x = rng.randn(1, 1, 2000).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    params = CV.convert_bigcodec_encoder(_sd(enc))
    got = np.asarray(BC.bigcodec_encode(params, jnp.asarray(x), antialias=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-4)
