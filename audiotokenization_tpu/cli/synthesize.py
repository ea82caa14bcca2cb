"""Token-LM sampling + codec decoding: unconditional audio generation.

Completes the stage-2 story (SURVEY.md §3.4): the reference trains CodecLLM
over token streams but ships no sampling path; here
``--lm_ckpt`` samples token sequences from the trained LM (BOS-conditioned,
temperature sampling) and decodes them to waveforms through the codec's
token->embedding->decoder path (vq2emb + decode, codec_decoder.py:96-109).
Without an LM checkpoint, --random samples uniform tokens (codec smoke test).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--codec_ckpt", type=str, required=True)
    p.add_argument("--lm_ckpt", type=str, default=None,
                   help="token-LM run dir (cli.train_token_lm)")
    p.add_argument("--random", action="store_true",
                   help="sample uniform random tokens instead of the LM")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="synthesized")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="shard each sample's decode across every attached "
                        "device (parallel/sp.py halo+LSTM-relay synthesizer)")
    p.add_argument("--pipeline_parallel", type=int, default=0, metavar="N",
                   help="conformer decoders: pipeline the backbone over N "
                        "stage devices (parallel/pp.py GPipe schedule; "
                        "n_layers must divide by N)")
    p.add_argument("--streaming", type=int, default=0, metavar="CHUNK_FRAMES",
                   help="causal checkpoints: decode through the streaming "
                        "synthesizer in CHUNK_FRAMES-frame chunks "
                        "(models/streaming.stream_decode — the serving "
                        "runtime driven offline; output equals the plain "
                        "decode to fp32 rounding)")
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.audio_io import write_wav
    from ..models import codec as C
    from ..models.token_lm import TokenLMConfig, token_lm_generate_kv
    from .extract_indices import load_model

    cfg, codec_params = load_model(args.codec_ckpt)
    sr = cfg.dataset.sample_rate
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios)) \
        if cfg.model.codec_encoder.type == "bigcodec" else cfg.model.codec_encoder.hop_length
    n_frames = int(args.seconds * sr) // hop
    vocab = cfg.model.codec_decoder.codebook_size

    key = jax.random.key(args.seed)
    if args.random or args.lm_ckpt is None:
        if not args.random:
            raise SystemExit("no --lm_ckpt given; pass --random for uniform tokens")
        tokens = jax.random.randint(key, (args.num_samples, n_frames), 0, vocab)
    else:
        from .train_token_lm import load_token_lm

        lm_cfg = TokenLMConfig(vocab_size=vocab + 2)
        lm_params = load_token_lm(args.lm_ckpt, lm_cfg)
        # KV-cached decode: O(L) attention per emitted token
        tokens = token_lm_generate_kv(lm_params, lm_cfg,
                                      batch_size=args.num_samples,
                                      length=n_frames, key=key,
                                      temperature=args.temperature)
        tokens = jnp.clip(tokens, 0, vocab - 1)  # drop any BOS/EOS samples

    if sum(map(bool, (args.sequence_parallel, args.pipeline_parallel,
                      args.streaming))) > 1:
        raise SystemExit("--sequence_parallel / --pipeline_parallel / "
                         "--streaming are distinct execution modes; pick one")
    if args.streaming:
        from ..models.streaming import stream_decode

        # tokens (B, Tf) -> (Nq=1, B, Tf) stream layout
        wav = stream_decode(codec_params, cfg,
                            np.asarray(tokens, np.int32)[None],
                            chunk_frames=args.streaming)
    elif args.sequence_parallel:
        from ..parallel.sp import make_sp_synthesizer

        syn = make_sp_synthesizer(cfg)
        wav = np.stack([np.asarray(syn(codec_params, tokens[i][None]))
                        for i in range(args.num_samples)])  # (B, T)
    elif args.pipeline_parallel:
        from ..parallel.pp import jit_pp_synthesize, make_pipe_mesh

        syn = jit_pp_synthesize(
            cfg, make_pipe_mesh(args.pipeline_parallel),
            n_micro=max(args.num_samples, 1))
        wav = np.asarray(syn(codec_params, jnp.asarray(tokens)[None]))  # (B, T)
    else:
        emb = C.codes_to_emb(codec_params, cfg, tokens[..., None])  # (B, C, Tf)
        emb = C.apply_fc_post_a(codec_params, cfg, emb)
        wav = np.asarray(C.decode(codec_params, cfg, emb))[:, 0]
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(args.num_samples):
        write_wav(out / f"sample_{i}.wav", wav[i], sr)
    np.save(out / "tokens.npy", np.asarray(tokens, np.int16))
    print(f"wrote {args.num_samples} samples ({args.seconds}s @ {sr} Hz) to {out}")


if __name__ == "__main__":
    main()
