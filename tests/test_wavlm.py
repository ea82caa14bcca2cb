"""Golden parity: native JAX WavLM vs transformers (random init, no download).

The s3prl SSL upstream family of the reference's speaker-verification suite
(speaker_verification/models/ecapa_tdnn.py:258-273). Both checkpoint
families are covered: base layout (group-norm feature extractor, post-LN
encoder) and large layout (per-layer LayerNorm extractor, stable pre-LN
encoder).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models.wavlm import (WavLMConfig, convert_wavlm,
                                                make_ssl_fn, wavlm_apply)


def _mk(norm: str):
    from transformers import WavLMConfig as HFConfig, WavLMModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        feat_extract_norm=norm, conv_bias=(norm == "layer"),
        do_stable_layer_norm=(norm == "layer"),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100,
        output_hidden_states=True, layerdrop=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, activation_dropout=0.0)
    model = WavLMModel(hf_cfg).eval()
    jcfg = WavLMConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        feat_extract_norm=norm, conv_bias=(norm == "layer"),
        do_stable_layer_norm=(norm == "layer"),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100)
    return model, jcfg


@pytest.mark.parametrize("norm", ["group", "layer"])
def test_wavlm_hidden_state_parity(norm):
    model, jcfg = _mk(norm)
    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 2000) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(wav))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wavlm(sd, jcfg)
    hiddens = wavlm_apply(params, jcfg, jnp.asarray(wav))
    assert len(hiddens) == len(out.hidden_states) == 4
    for i, (ours, ref) in enumerate(zip(hiddens, out.hidden_states)):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-3,
                                   atol=3e-4, err_msg=f"hidden {i} ({norm})")


def test_wavlm_as_ecapa_ssl_frontend():
    """The SV suite's layer-weighted SSL frontend consumes wavlm hidden
    states end to end (speaker_verification/models/ecapa_tdnn.py:258-273)."""
    from audiotokenization_tpu.models.ecapa_tdnn import ssl_weighted_features

    model, jcfg = _mk("group")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wavlm(sd, jcfg)
    ssl_fn = make_ssl_fn(params, jcfg)
    rng = np.random.RandomState(1)
    wav = jnp.asarray((rng.randn(2, 2000) * 0.1).astype(np.float32))
    weight = jnp.zeros((jcfg.num_hidden_layers + 1,))
    feats = ssl_weighted_features(ssl_fn(wav), weight)
    assert feats.shape[0] == 2 and feats.shape[1] == jcfg.hidden_size
    assert np.isfinite(np.asarray(feats)).all()
