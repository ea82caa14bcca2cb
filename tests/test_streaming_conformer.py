"""Streaming causal-conformer tokenizer (VERDICT r3 next #4).

models/streaming.StreamingConformerTokenizer: chunked emission must equal
offline `codec.tokenize` token-for-token — KV-cache causal attention,
depthwise-conv rings, and the STFT lookahead handled as a fixed
`delay_frames` latency with a flush.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.models.streaming import StreamingConformerTokenizer

from test_conformer_train import conformer_tiny_config

HOP = 40


def causal_conformer_config(n_layers=2):
    cfg = conformer_tiny_config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_decoder.causal = True
    cfg.model.codec_encoder.n_layers = n_layers
    return cfg


def _stream_tokens(tok, wav, chunk):
    state = tok.init_state(batch_size=1)
    outs = []
    for s in range(0, len(wav), chunk):
        codes, state = tok.step(state, jnp.asarray(wav[None, s:s + chunk]))
        outs.append(np.asarray(codes))
    tail, state = tok.flush(state)
    outs.append(np.asarray(tail))
    all_codes = np.concatenate(outs, axis=-1)
    # leading delay_frames are warm-up garbage; the rest is the stream
    return all_codes[:, 0, tok.delay_frames:]


@pytest.mark.parametrize("chunk_frames", [2, 5])
def test_streaming_conformer_tokens_exact(chunk_frames):
    cfg = causal_conformer_config()
    params = C.init_codec(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    n_frames = 20
    wav = (rng.randn(HOP * n_frames) * 0.1).astype(np.float32)
    ref = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)[None]))[:, 0]

    tok = StreamingConformerTokenizer(params, cfg,
                                      chunk_samples=chunk_frames * HOP)
    assert tok.delay_frames >= 1  # the STFT lookahead is real
    got = _stream_tokens(tok, wav, chunk_frames * HOP)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(ref, got)


def test_streaming_conformer_single_frame_chunks():
    cfg = causal_conformer_config(n_layers=1)
    params = C.init_codec(jax.random.key(1), cfg)
    rng = np.random.RandomState(1)
    wav = (rng.randn(HOP * 9) * 0.1).astype(np.float32)
    ref = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)[None]))[:, 0]
    tok = StreamingConformerTokenizer(params, cfg, chunk_samples=HOP)
    got = _stream_tokens(tok, wav, HOP)
    np.testing.assert_array_equal(ref, got)


def test_streaming_conformer_rejects_noncausal():
    cfg = conformer_tiny_config()  # causal = False
    params = C.init_codec(jax.random.key(2), cfg)
    with pytest.raises(ValueError, match="causal"):
        StreamingConformerTokenizer(params, cfg, chunk_samples=HOP)
