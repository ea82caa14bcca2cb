"""Semantic branch with the in-loop native w2v-bert teacher (tiny)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.models.w2v_bert import W2vBertConfig, convert_w2v_bert

from test_train_step import tiny_config


def test_semantic_forward_with_inloop_teacher(monkeypatch):
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(0)
    hf = Wav2Vec2BertModel(Wav2Vec2BertConfig(
        hidden_size=1024, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, layerdrop=0.0)).eval()
    jcfg = W2vBertConfig(hidden_size=1024, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=128)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    teacher = convert_w2v_bert(sd, jcfg)

    cfg = tiny_config()
    cfg.train.use_semantic = True
    params = C.init_codec(jax.random.key(0), cfg)
    params["w2v_bert"] = teacher

    # patch the branch to use the tiny teacher config with layer 2
    import audiotokenization_tpu.models.semantic as S

    orig_apply = S.semantic_forward

    from audiotokenization_tpu.models import w2v_bert as W

    monkeypatch.setattr(W, "W2vBertConfig", lambda: jcfg)
    real_apply = W.w2v_bert_apply
    monkeypatch.setattr(W, "w2v_bert_apply",
                        lambda p, c, f, output_layer=16: real_apply(p, c, f, output_layer=2))

    rng = np.random.RandomState(0)
    batch = {
        "wav": jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32)),
        "feats": jnp.asarray(rng.randn(2, 80, 160).astype(np.float32)),
    }
    out = C.forward(params, cfg, batch, training=True)
    assert out.semantic_recon_loss is not None
    assert np.isfinite(float(out.semantic_recon_loss))
    assert out.gen_wav.shape == (2, 1, 800)
