"""Streaming tokenizer: chunked emission must equal offline tokenization exactly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.models.streaming import StreamingTokenizer

from test_train_step import tiny_config


def causal_tiny_config():
    cfg = tiny_config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_decoder.causal = True
    return cfg


def test_streaming_matches_offline_tokens():
    cfg = causal_tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    T = 1200  # hop 10 -> 120 frames
    wav = (rng.randn(2, T) * 0.1).astype(np.float32)
    offline = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)))

    st = StreamingTokenizer(params, cfg, chunk_samples=200)
    state = st.init_state(batch_size=2)
    pieces = []
    for start in range(0, T, 200):
        codes, state = st.step(state, jnp.asarray(wav[:, start:start + 200]))
        pieces.append(np.asarray(codes))
    streamed = np.concatenate(pieces, axis=2)
    assert streamed.shape == offline.shape
    np.testing.assert_array_equal(streamed, offline)


def test_streaming_rejects_noncausal():
    cfg = tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        StreamingTokenizer(params, cfg, chunk_samples=200)


def test_streaming_five_stage_config():
    """Full 5-stage causal stack (hop 200) streams exactly (small ngf)."""
    cfg = tiny_config()
    e = cfg.model.codec_encoder
    e.causal = True
    e.ngf = 4
    e.up_ratios = (2, 2, 2, 5, 5)
    e.out_channels = 32
    d = cfg.model.codec_decoder
    d.causal = True
    d.in_channels = 32
    d.upsample_initial_channel = 64
    d.up_ratios = (5, 5, 2, 2, 2)
    params = C.init_codec(jax.random.key(1), cfg)
    rng = np.random.RandomState(1)
    T = 2400  # 12 frames
    wav = (rng.randn(1, T) * 0.1).astype(np.float32)
    offline = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)))
    st = StreamingTokenizer(params, cfg, chunk_samples=400)
    state = st.init_state(batch_size=1)
    pieces = []
    for start in range(0, T, 400):
        codes, state = st.step(state, jnp.asarray(wav[:, start:start + 400]))
        pieces.append(np.asarray(codes))
    streamed = np.concatenate(pieces, axis=2)
    np.testing.assert_array_equal(streamed, offline)
