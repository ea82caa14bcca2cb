"""End-to-end parity: reference torch BigCodec modules vs converted JAX models.

Instantiates the actual reference implementation (read-only mount), converts
its randomly-initialized state dict with audiotokenization_tpu.convert, and
requires numerical agreement — including EXACT token-index agreement, the
north-star conformance metric (BASELINE.md).
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_loader import load_reference

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.models import bigcodec as BC
from audiotokenization_tpu.models.quantizers import factorized_vq as FQ

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick

NGF, OUT, IN_CH, UP_CH = 8, 64, 64, 96
T = 2000


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def ref_models():
    vq = load_reference()
    torch.manual_seed(0)
    enc = vq.BigCodecEncoder(ngf=NGF, out_channels=OUT).eval()
    dec = vq.BigCodecDecoder(in_channels=IN_CH, upsample_initial_channel=UP_CH,
                             codebook_size=64, codebook_dim=8).eval()
    return enc, dec


def test_encoder_parity(ref_models):
    enc, _ = ref_models
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, T).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    params = CV.convert_bigcodec_encoder(_sd(enc))
    got = np.asarray(BC.bigcodec_encode(params, jnp.asarray(x)))
    assert got.shape == ref.shape == (2, OUT, T // 200)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_quantizer_index_parity_exact(ref_models):
    _, dec = ref_models
    rng = np.random.RandomState(1)
    lat = rng.randn(2, IN_CH, 37).astype(np.float32)
    with torch.no_grad():
        zq_ref, idx_ref, loss_ref = dec(torch.from_numpy(lat), vq=True)
    qparams = CV.convert_residual_vq(_sd(dec), num_quantizers=1)
    zq, idx, loss = FQ.residual_vq_apply(qparams, jnp.asarray(lat),
                                         num_quantizers=1, training=False,
                                         use_pallas=False)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())  # EXACT
    np.testing.assert_allclose(np.asarray(zq), zq_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(loss), loss_ref.numpy(), atol=1e-6)


def test_quantizer_commit_loss_parity_training(ref_models):
    _, dec = ref_models
    dec.train()
    try:
        rng = np.random.RandomState(2)
        lat = rng.randn(2, IN_CH, 23).astype(np.float32)
        with torch.no_grad():
            _, _, loss_ref = dec(torch.from_numpy(lat), vq=True)
        qparams = CV.convert_residual_vq(_sd(dec), num_quantizers=1)
        _, _, loss = FQ.residual_vq_apply(qparams, jnp.asarray(lat),
                                          num_quantizers=1, training=True,
                                          use_pallas=False)
        np.testing.assert_allclose(np.asarray(loss), loss_ref.numpy(),
                                   rtol=1e-4, atol=1e-6)
    finally:
        dec.eval()


def test_decoder_waveform_parity(ref_models):
    _, dec = ref_models
    rng = np.random.RandomState(3)
    lat = rng.randn(2, IN_CH, 10).astype(np.float32)
    with torch.no_grad():
        zq_ref, _, _ = dec(torch.from_numpy(lat), vq=True)
        wav_ref = dec(zq_ref, vq=False).numpy()
    dparams = CV.convert_bigcodec_decoder(_sd(dec))
    qparams = CV.convert_residual_vq(_sd(dec), num_quantizers=1)
    zq, _, _ = FQ.residual_vq_apply(qparams, jnp.asarray(lat), num_quantizers=1,
                                    use_pallas=False)
    wav = np.asarray(BC.bigcodec_decode(dparams, zq))
    assert wav.shape == wav_ref.shape == (2, 1, 10 * 200)
    np.testing.assert_allclose(wav, wav_ref, rtol=1e-3, atol=2e-5)


def test_full_roundtrip_token_parity(ref_models):
    """wav -> encoder -> VQ indices: EXACT match on the full pipeline."""
    enc, dec = ref_models
    rng = np.random.RandomState(4)
    x = rng.randn(1, 1, T).astype(np.float32) * 0.5
    with torch.no_grad():
        lat_ref = enc(torch.from_numpy(x))
        _, idx_ref, _ = dec(lat_ref, vq=True)
    eparams = CV.convert_bigcodec_encoder(_sd(enc))
    qparams = CV.convert_residual_vq(_sd(dec), num_quantizers=1)
    lat = BC.bigcodec_encode(eparams, jnp.asarray(x))
    _, idx, _ = FQ.residual_vq_apply(qparams, lat, num_quantizers=1,
                                     use_pallas=False)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
