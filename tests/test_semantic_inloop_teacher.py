"""Semantic branch with the in-loop native w2v-bert teacher (tiny)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.models.w2v_bert import W2vBertConfig, convert_w2v_bert

from test_train_step import tiny_config


def tiny_teacher_config(cfg):
    """Teacher knobs for a 2-layer/4-head tiny w2v-bert (hidden stays 1024)."""
    cfg.train.teacher_layers = 2
    cfg.train.teacher_heads = 4
    cfg.train.teacher_intermediate = 128
    cfg.train.teacher_layer = 2
    return W2vBertConfig(num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128)


def test_semantic_forward_with_inloop_teacher():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(0)
    hf = Wav2Vec2BertModel(Wav2Vec2BertConfig(
        hidden_size=1024, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, layerdrop=0.0)).eval()
    cfg = tiny_config()
    cfg.train.use_semantic = True
    jcfg = tiny_teacher_config(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    teacher = convert_w2v_bert(sd, jcfg)

    params = C.init_codec(jax.random.key(0), cfg)
    params["w2v_bert"] = teacher

    rng = np.random.RandomState(0)
    batch = {
        "wav": jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32)),
        "feats": jnp.asarray(rng.randn(2, 80, 160).astype(np.float32)),
    }
    out = C.forward(params, cfg, batch, training=True)
    assert out.semantic_recon_loss is not None
    assert np.isfinite(float(out.semantic_recon_loss))
    assert out.gen_wav.shape == (2, 1, 800)


def test_train_step_with_inloop_teacher_excludes_teacher_from_updates():
    """The frozen teacher rides outside gen_params: the step must run with
    feats batches and must NOT update (or even see) the teacher weights."""
    from audiotokenization_tpu.models.w2v_bert import init_w2v_bert
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = tiny_config()
    cfg.train.use_semantic = True
    jcfg = tiny_teacher_config(cfg)
    teacher = init_w2v_bert(jax.random.key(1), jcfg)
    state = init_train_state(jax.random.key(0), cfg)
    assert "w2v_bert" not in state.gen_params
    step = jit_train_step(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "wav": jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32)),
        "feats": jnp.asarray(rng.randn(2, 80, 160).astype(np.float32)),
    }
    t0 = jax.tree.map(lambda x: np.asarray(x), teacher)
    state1, metrics = step(state, batch, teacher)
    assert np.isfinite(float(metrics["semantic_recon_loss"]))
    assert "w2v_bert" not in state1.gen_params
    # teacher buffers untouched (no weight decay / optimizer contact)
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(teacher)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_semantic_precomputed_target():
    """semantic_target batches (precomputed teacher path) drive the same step."""
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = tiny_config()
    cfg.train.use_semantic = True
    state = init_train_state(jax.random.key(0), cfg)
    step = jit_train_step(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "wav": jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32)),
        "semantic_target": jnp.asarray(rng.randn(2, 1024, 80).astype(np.float32)),
    }
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["semantic_recon_loss"]))
