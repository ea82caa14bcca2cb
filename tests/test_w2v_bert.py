"""Golden parity: native JAX w2v-bert vs transformers (random init, no download)."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from audiotokenization_tpu.models.w2v_bert import (W2vBertConfig, convert_w2v_bert,
                                                   w2v_bert_apply)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(0)
    cfg = Wav2Vec2BertConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, feature_projection_input_dim=160,
        output_hidden_states=True, layerdrop=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, conformer_conv_dropout=0.0,
        position_embeddings_type="relative_key")
    model = Wav2Vec2BertModel(cfg).eval()
    jcfg = W2vBertConfig(hidden_size=64, num_hidden_layers=3,
                         num_attention_heads=4, intermediate_size=128)
    return model, jcfg


def test_w2v_bert_hidden_state_parity(hf_model):
    model, jcfg = hf_model
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 13, 160).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(feats))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_w2v_bert(sd, jcfg)
    hiddens = w2v_bert_apply(params, jcfg, jnp.asarray(feats))
    assert len(hiddens) == len(out.hidden_states) == 4
    for i, (ours, ref) in enumerate(zip(hiddens, out.hidden_states)):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-3,
                                   atol=2e-4, err_msg=f"hidden {i}")
    # output_layer shortcut matches full pass
    h2 = w2v_bert_apply(params, jcfg, jnp.asarray(feats), output_layer=2)
    np.testing.assert_allclose(np.asarray(h2), out.hidden_states[2].numpy(),
                               rtol=2e-3, atol=2e-4)


def test_feature_extractor_wrapper(hf_model):
    """SeamlessM4T fbank features via the installed transformers numpy path."""
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.RandomState(1)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)
    out = fe(wav, sampling_rate=16000, return_tensors="np")
    feats = out.input_features
    assert feats.shape[-1] == 160  # stride-2 stacked 80-mel
    assert np.isfinite(feats).all()
    model, jcfg = hf_model
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_w2v_bert(sd, jcfg)
    h = w2v_bert_apply(params, jcfg, jnp.asarray(feats), output_layer=3)
    assert h.shape[0] == 1 and h.shape[-1] == 64
