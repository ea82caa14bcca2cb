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


# ---------------------------------------------------------------------------
# Streaming conformer SYNTHESIZER (VERDICT r4 next #2)
# ---------------------------------------------------------------------------

from audiotokenization_tpu.models.streaming import StreamingConformerSynthesizer


def _offline_decode(params, cfg, codes):
    """codes (Nq, B, T) -> offline waveform (B, T*hop) via the stock path."""
    emb = C.codes_to_emb(params, cfg, jnp.moveaxis(jnp.asarray(codes), 0, -1))
    emb = C.apply_fc_post_a(params, cfg, emb)
    return np.asarray(C.decode(params, cfg, emb))[:, 0]


def _stream_wav(syn, codes, chunk_frames):
    state = syn.init_state(batch_size=codes.shape[1])
    outs = []
    for s in range(0, codes.shape[-1], chunk_frames):
        wav, state = syn.step(state, jnp.asarray(codes[:, :, s:s + chunk_frames]))
        outs.append(np.asarray(wav))
    tail, state = syn.flush(state)
    outs.append(np.asarray(tail))
    full = np.concatenate(outs, axis=1)
    # leading delay_samples are warm-up garbage (the offline-trimmed region)
    return full[:, syn.delay_samples:]


@pytest.mark.parametrize("chunk_frames", [2, 5])
def test_streaming_conformer_synth_exact(chunk_frames):
    cfg = causal_conformer_config()
    params = C.init_codec(jax.random.key(3), cfg)
    rng = np.random.RandomState(3)
    n_frames = 20
    codes = rng.randint(0, cfg.model.codec_decoder.codebook_size,
                        size=(1, 1, n_frames)).astype(np.int32)
    ref = _offline_decode(params, cfg, codes)

    syn = StreamingConformerSynthesizer(params, cfg, chunk_frames=chunk_frames)
    assert syn.delay_samples == (cfg.model.codec_decoder.window_size
                                 - cfg.model.codec_decoder.hop_length) // 2
    got = _stream_wav(syn, codes, chunk_frames)
    assert got.shape == ref.shape
    np.testing.assert_allclose(ref, got, atol=2e-6, rtol=1e-5)


def test_streaming_conformer_synth_single_frame_chunks():
    cfg = causal_conformer_config(n_layers=1)
    cfg.model.codec_decoder.n_layers = 1
    params = C.init_codec(jax.random.key(4), cfg)
    rng = np.random.RandomState(4)
    codes = rng.randint(0, cfg.model.codec_decoder.codebook_size,
                        size=(1, 1, 9)).astype(np.int32)
    ref = _offline_decode(params, cfg, codes)
    syn = StreamingConformerSynthesizer(params, cfg, chunk_frames=1)
    got = _stream_wav(syn, codes, 1)
    np.testing.assert_allclose(ref, got, atol=2e-6, rtol=1e-5)


def test_streaming_conformer_roundtrip_stream_in_stream_out():
    """Full streaming serving loop: tokenize chunks in, synthesize chunks
    out; the waveform must equal offline tokenize->decode."""
    cfg = causal_conformer_config()
    params = C.init_codec(jax.random.key(5), cfg)
    rng = np.random.RandomState(5)
    n_frames = 16
    wav = (rng.randn(HOP * n_frames) * 0.1).astype(np.float32)
    # offline reference
    ref_codes = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)[None]))
    ref_wav = _offline_decode(params, cfg, ref_codes)
    # streamed
    tok = StreamingConformerTokenizer(params, cfg, chunk_samples=4 * HOP)
    got_codes = _stream_tokens(tok, wav, 4 * HOP)[None]  # (Nq=1? ...)
    np.testing.assert_array_equal(ref_codes[:, 0], got_codes[0])
    syn = StreamingConformerSynthesizer(params, cfg, chunk_frames=4)
    got_wav = _stream_wav(syn, ref_codes, 4)
    np.testing.assert_allclose(ref_wav, got_wav, atol=2e-6, rtol=1e-5)


def test_streaming_conformer_synth_rejects_noncausal():
    cfg = conformer_tiny_config()
    params = C.init_codec(jax.random.key(6), cfg)
    with pytest.raises(ValueError, match="causal"):
        StreamingConformerSynthesizer(params, cfg, chunk_frames=2)


def test_stream_decode_helper_partial_chunks():
    """models/streaming.stream_decode == offline decode for BOTH causal
    families, including a trailing partial chunk (T % chunk != 0)."""
    from audiotokenization_tpu.models.streaming import stream_decode

    # conformer family
    cfg = causal_conformer_config()
    params = C.init_codec(jax.random.key(8), cfg)
    rng = np.random.RandomState(8)
    codes = rng.randint(0, cfg.model.codec_decoder.codebook_size,
                        size=(1, 1, 13)).astype(np.int32)  # 13 % 4 != 0
    ref = _offline_decode(params, cfg, codes)
    got = stream_decode(params, cfg, codes, chunk_frames=4)
    np.testing.assert_allclose(ref, got, atol=2e-6, rtol=1e-5)

    # bigcodec causal family
    from test_train_step import tiny_config
    cfg2 = tiny_config()
    cfg2.model.codec_encoder.causal = True
    cfg2.model.codec_decoder.causal = True
    params2 = C.init_codec(jax.random.key(9), cfg2)
    codes2 = rng.randint(0, cfg2.model.codec_decoder.codebook_size,
                         size=(1, 1, 11)).astype(np.int32)
    ref2 = _offline_decode(params2, cfg2, codes2)
    got2 = stream_decode(params2, cfg2, codes2, chunk_frames=4)
    np.testing.assert_allclose(ref2, got2, atol=2e-6, rtol=1e-5)
