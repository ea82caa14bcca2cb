"""Real-time streaming codec demo: live tokenize -> live synthesize.

Builds a small CAUSAL codec, then runs a chunk-by-chunk loop — 200 ms of
audio in, tokens out, waveform back — with carried state on both sides
(models/streaming.py). The streamed round trip equals the offline round
trip exactly at the token level and to fp32 rounding in the waveform,
which is what makes the causal configs (BigCodec_SSL's `causal` flags)
actually servable.

Run from the repo root:  python examples/streaming_demo.py
(~1 minute on CPU; forces the CPU backend for fast compiles.)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.models.streaming import (StreamingSynthesizer,
                                                        StreamingTokenizer)

    cfg = Config()
    e, d = cfg.model.codec_encoder, cfg.model.codec_decoder
    e.ngf, e.out_channels, e.up_ratios, e.rnn_num_layers = 8, 64, (2, 2, 5, 5), 1
    d.in_channels, d.upsample_initial_channel, d.up_ratios = 64, 32, (5, 5, 2, 2)
    d.rnn_num_layers, d.codebook_size, d.codebook_dim = 1, 256, 8
    e.causal = d.causal = True
    hop = int(np.prod(e.up_ratios))  # 100 samples -> 160 tokens/s @16 kHz

    params = C.init_codec(jax.random.key(0), cfg)
    sr = cfg.dataset.sample_rate
    chunk = 3200  # 200 ms
    t = np.arange(sr * 2) / sr
    speech_like = (0.4 * np.sin(2 * np.pi * 220 * t) *
                   (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    tok = StreamingTokenizer(params, cfg, chunk_samples=chunk)
    syn = StreamingSynthesizer(params, cfg, chunk_frames=chunk // hop)
    ts, ss = tok.init_state(1), syn.init_state(1)

    out, n_tokens = [], 0
    t0 = time.time()
    for start in range(0, len(speech_like), chunk):
        audio_in = jnp.asarray(speech_like[start:start + chunk])[None]
        codes, ts = tok.step(ts, audio_in)          # (Nq, 1, chunk/hop)
        wav_out, ss = syn.step(ss, codes)           # (1, chunk)
        out.append(np.asarray(wav_out))
        n_tokens += codes.shape[-1]
        lat = (time.time() - t0) / (start // chunk + 1)
    streamed = np.concatenate(out, axis=1)

    # cross-check against the offline round trip
    offline_codes = C.tokenize(params, cfg, jnp.asarray(speech_like)[None])
    emb = C.codes_to_emb(params, cfg, jnp.moveaxis(offline_codes, 0, -1))
    offline = np.asarray(C.decode(params, cfg, emb))[:, 0]
    print(f"streamed {len(speech_like)/sr:.1f}s in {len(out)} chunks, "
          f"{n_tokens} tokens, ~{lat*1e3:.0f} ms/chunk on this backend")
    print(f"stream vs offline waveform maxdiff: "
          f"{np.abs(streamed - offline).max():.2e}")

    # --- the causal CONFORMER pair: stream in AND stream out (r5) --------
    from audiotokenization_tpu.models.streaming import (
        StreamingConformerSynthesizer, StreamingConformerTokenizer)

    cfg2 = Config()
    for part in (cfg2.model.codec_encoder, cfg2.model.codec_decoder):
        part.type = ("conformer_stft" if part is cfg2.model.codec_encoder
                     else "conformer_istft")
        part.hop_length, part.n_fft, part.window_size = 40, 160, 160
        part.dim, part.n_layers, part.n_head = 32, 2, 2
        part.causal = True
    cfg2.model.codec_encoder.out_channels = 32
    cfg2.model.codec_decoder.in_channels = 32
    cfg2.model.codec_decoder.codebook_size = 256
    cfg2.model.codec_decoder.codebook_dim = 8
    params2 = C.init_codec(jax.random.key(1), cfg2)
    ctok = StreamingConformerTokenizer(params2, cfg2, chunk_samples=4 * 40)
    csyn = StreamingConformerSynthesizer(params2, cfg2, chunk_frames=4)
    ct, cs = ctok.init_state(1), csyn.init_state(1)
    # IMPORTANT serving detail: the tokenizer's leading delay_frames tokens
    # are warm-up garbage and must be DROPPED before synthesis — the
    # synthesizer is causal, so feeding them would pollute its KV/conv
    # state for every later frame. A tiny token buffer does the stripping.
    wav_pieces, buf = [], []
    to_drop = ctok.delay_frames
    sig = speech_like[:40 * 32]

    def push(codes, cs):
        nonlocal to_drop
        codes = np.asarray(codes)
        if to_drop:
            d = min(to_drop, codes.shape[-1])
            codes = codes[:, :, d:]
            to_drop -= d
        if codes.shape[-1]:
            wav_out, cs = csyn.step(cs, jnp.asarray(codes))
            wav_pieces.append(np.asarray(wav_out))
        return cs

    for start in range(0, len(sig), 4 * 40):
        codes, ct = ctok.step(ct, jnp.asarray(sig[start:start + 4 * 40])[None])
        cs = push(codes, cs)
    tail_codes, ct = ctok.flush(ct)
    cs = push(tail_codes, cs)
    tail_wav, cs = csyn.flush(cs)
    wav_pieces.append(np.asarray(tail_wav))
    streamed2 = np.concatenate(wav_pieces, axis=1)
    # discard only the synthesizer's own latency now
    skip = csyn.delay_samples
    offline_codes2 = C.tokenize(params2, cfg2, jnp.asarray(sig)[None])
    emb2 = C.codes_to_emb(params2, cfg2, jnp.moveaxis(offline_codes2, 0, -1))
    offline2 = np.asarray(C.decode(params2, cfg2, emb2))[:, 0]
    got2 = streamed2[:, skip:skip + offline2.shape[1]]
    print(f"conformer stream-in/stream-out vs offline maxdiff: "
          f"{np.abs(got2 - offline2).max():.2e} "
          f"(latency {ctok.delay_frames} frames in, "
          f"{csyn.delay_samples} samples out)")


if __name__ == "__main__":
    main()
