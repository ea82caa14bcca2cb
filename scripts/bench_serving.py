"""Serving-path benchmarks on the attached TPU chip.

Three production-relevant numbers that the headline bench (batch-32 offline
tokenize) doesn't capture:

1. Token-LM KV-cache decode throughput (tokens/s) at serving batch sizes —
   the stage-2 CodecLLM's generation path (token_lm_generate_kv).
2. StreamingTokenizer sustained throughput (real-time factor) and per-chunk
   latency at batch 1 — the live-captioning/telephony shape.
3. StreamingSynthesizer RTF — the TTS-style playback shape.

Timing on this remote-tunneled backend: dispatch is async and
block_until_ready lies, so sustained throughput chains N steps and ends
with one np.asarray fetch; per-chunk LATENCY includes a host->device
round trip (~40 ms through the tunnel — a deployment on a PCIe-attached
host would see ~1 ms; both are reported).

Usage: python scripts/bench_serving.py [--quick]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_token_lm_decode(results):
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.models.token_lm import (TokenLMConfig,
                                                       init_token_lm,
                                                       token_lm_generate_kv)

    lm_cfg = TokenLMConfig(vocab_size=8194)  # codebook 8192 + BOS/EOS
    params = init_token_lm(jax.random.key(0), lm_cfg)
    length = 512  # 6.4 s of audio at 80 tokens/s
    for B in (1, 16, 64):
        key = jax.random.key(1)
        out = token_lm_generate_kv(params, lm_cfg, batch_size=B, length=length,
                                   key=key, temperature=1.0)
        np.asarray(out[:1, :1])  # compile + warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = token_lm_generate_kv(params, lm_cfg, batch_size=B,
                                       length=length, key=key, temperature=1.0)
            np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        tok_s = B * length / dt
        results[f"token_lm_kv_decode_B{B}"] = {
            "tokens_per_s": round(tok_s, 1),
            "audio_s_per_s": round(tok_s / 80.0, 2),  # 80 tokens/s of audio
            "ms_per_token_step": round(dt / length * 1e3, 3),
        }
        print(f"token-LM KV decode B={B:3d} len={length}: {tok_s:9.1f} tok/s "
              f"({tok_s/80.0:7.2f} audio-s/s), {dt/length*1e3:.3f} ms/step")


def bench_streaming(results, *, quick=False):
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.models.streaming import (StreamingSynthesizer,
                                                        StreamingTokenizer)
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_decoder.causal = True
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios))
    sr = cfg.dataset.sample_rate

    for chunk_ms in ((80,) if quick else (80, 320)):
        chunk = int(sr * chunk_ms / 1000)
        chunk -= chunk % hop
        tok = StreamingTokenizer(params, cfg, chunk_samples=chunk)
        state = tok.init_state(batch_size=1)
        rng = np.random.RandomState(0)
        chunks = [jnp.asarray(rng.randn(1, chunk).astype(np.float32) * 0.1)
                  for _ in range(8)]
        # warmup/compile
        st = state
        for c in chunks[:2]:
            codes, st = tok.step(st, c)
        np.asarray(codes)

        # sustained RTF: chain N chunks, one fetch at the end
        N = 25 if quick else 50
        st = state
        t0 = time.perf_counter()
        for i in range(N):
            codes, st = tok.step(st, chunks[i % len(chunks)])
        np.asarray(codes)
        dt = time.perf_counter() - t0
        rtf = (N * chunk / sr) / dt
        # per-chunk latency: fetch after every step (includes tunnel RTT)
        st = state
        lat = []
        for i in range(10):
            t0 = time.perf_counter()
            codes, st = tok.step(st, chunks[i % len(chunks)])
            np.asarray(codes)
            lat.append(time.perf_counter() - t0)
        lat_ms = float(np.median(lat) * 1e3)
        results[f"streaming_tokenize_chunk{chunk_ms}ms"] = {
            "rtf": round(rtf, 2), "chunk_latency_ms_incl_tunnel": round(lat_ms, 1)}
        print(f"streaming tokenize chunk={chunk_ms}ms: RTF {rtf:7.2f}x realtime, "
              f"per-chunk latency {lat_ms:.1f} ms (incl. ~40 ms tunnel RTT)")

    # streaming CAUSAL CONFORMER tokenizer: KV-cache attention + conv rings
    from audiotokenization_tpu.config import load_config
    from audiotokenization_tpu.models.streaming import StreamingConformerTokenizer

    cfg_c = load_config(str(Path(__file__).resolve().parent.parent
                            / "configs" / "conformer.yaml"))
    cfg_c.model.codec_encoder.causal = True
    cfg_c.model.codec_decoder.causal = True
    params_c = fold_weight_norm(C.init_codec(jax.random.key(2), cfg_c))
    hop_c = cfg_c.model.codec_encoder.hop_length
    for chunk_ms in ((80,) if quick else (80, 320)):
        chunk = int(sr * chunk_ms / 1000)
        chunk -= chunk % hop_c
        tok = StreamingConformerTokenizer(params_c, cfg_c, chunk_samples=chunk)
        state = tok.init_state(batch_size=1)
        rng = np.random.RandomState(2)
        chunks = [jnp.asarray(rng.randn(1, chunk).astype(np.float32) * 0.1)
                  for _ in range(8)]
        st = state
        for c in chunks[:2]:
            codes, st = tok.step(st, c)
        np.asarray(codes)
        N = 25 if quick else 50
        st = state
        t0 = time.perf_counter()
        for i in range(N):
            codes, st = tok.step(st, chunks[i % len(chunks)])
        np.asarray(codes)
        dt = time.perf_counter() - t0
        rtf = (N * chunk / sr) / dt
        results[f"streaming_conformer_tokenize_chunk{chunk_ms}ms"] = {
            "rtf": round(rtf, 2), "delay_frames": tok.delay_frames}
        print(f"streaming CONFORMER tokenize chunk={chunk_ms}ms: "
              f"RTF {rtf:7.2f}x realtime (latency {tok.delay_frames} frames)")

    # streaming CAUSAL CONFORMER synthesizer: codes -> wav through the
    # KV-cache decoder backbone + carried-NOLA ISTFT head
    from audiotokenization_tpu.models.streaming import (
        StreamingConformerSynthesizer)

    for chunk_frames in ((8,) if quick else (8, 25)):
        syn = StreamingConformerSynthesizer(params_c, cfg_c,
                                            chunk_frames=chunk_frames)
        sstate = syn.init_state(batch_size=1)
        rng = np.random.RandomState(3)
        cbs = cfg_c.model.codec_decoder.codebook_size
        code_chunks = [jnp.asarray(rng.randint(0, cbs, (1, 1, chunk_frames)),
                                   dtype=jnp.int32) for _ in range(8)]
        st = sstate
        for c in code_chunks[:2]:
            wav, st = syn.step(st, c)
        np.asarray(wav)
        N = 25 if quick else 50
        st = sstate
        t0 = time.perf_counter()
        for i in range(N):
            wav, st = syn.step(st, code_chunks[i % len(code_chunks)])
        np.asarray(wav)
        dt = time.perf_counter() - t0
        rtf = (N * chunk_frames * hop_c / sr) / dt
        results[f"streaming_conformer_synthesize_chunk{chunk_frames}f"] = {
            "rtf": round(rtf, 2), "delay_ms": round(
                syn.delay_samples * 1000 / sr, 1)}
        print(f"streaming CONFORMER synthesize chunk={chunk_frames} frames "
              f"({chunk_frames*hop_c*1000//sr} ms): RTF {rtf:7.2f}x realtime "
              f"(algorithmic latency {syn.delay_samples*1000/sr:.1f} ms)")

    # synthesizer: codes -> wav, chunk_frames at 80 fps
    for chunk_frames in ((8,) if quick else (8, 25)):
        syn = StreamingSynthesizer(params, cfg, chunk_frames=chunk_frames)
        sstate = syn.init_state(batch_size=1)
        rng = np.random.RandomState(1)
        code_chunks = [jnp.asarray(rng.randint(0, 8192, (1, 1, chunk_frames)),
                                   dtype=jnp.int32) for _ in range(8)]
        st = sstate
        for c in code_chunks[:2]:
            wav, st = syn.step(st, c)
        np.asarray(wav)
        N = 25 if quick else 50
        st = sstate
        t0 = time.perf_counter()
        for i in range(N):
            wav, st = syn.step(st, code_chunks[i % len(code_chunks)])
        np.asarray(wav)
        dt = time.perf_counter() - t0
        rtf = (N * chunk_frames * hop / sr) / dt
        results[f"streaming_synthesize_chunk{chunk_frames}f"] = {"rtf": round(rtf, 2)}
        print(f"streaming synthesize chunk={chunk_frames} frames "
              f"({chunk_frames*hop*1000//sr} ms): RTF {rtf:7.2f}x realtime")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="logic smoke-run on the CPU backend (numbers meaningless)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    results = {}
    bench_token_lm_decode(results)
    bench_streaming(results, quick=args.quick)
    line = json.dumps(results)
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
