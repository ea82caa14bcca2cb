"""Corpus token-index extraction CLI.

Reference contract (BigCodec_SSL/extract_indices.py:375-594): walk LibriTTS/
LibriSpeech subsets for audio files, tokenize each (encoder -> VQ only), save
per-utterance indices as int16 .npy under
``<save_path>/<output_folder>/<subset>/<speaker>/<chapter>/<fileid>.npy``,
with per-file error tolerance and a running count.

Model sources:
- a framework run dir (config.json + Orbax ckpt/), or
- a reference PyTorch run dir / .ckpt (converted on the fly via convert.py,
  implementing the *current* encoder/decoder layout the reference CLI
  mismatches — SURVEY.md §3.2).

Shapes & parity: by default inputs are padded to the next hop multiple and
tokenized through the ragged-batched path (utils/ragged.py) — per-sample
edge masks keep every file's tokens byte-identical to processing it alone
while 1 s buckets bound the XLA compile count; ``--exact`` feeds raw
lengths per file instead (byte-for-byte the reference stream for arbitrary
lengths, one compile per unique length).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", type=str, default="../../datasets")
    p.add_argument("--save_path", type=str, required=True,
                   help="run dir (ours or reference) containing the checkpoint")
    p.add_argument("--output_folder", type=str, default="extracted_indices")
    p.add_argument("--duration", type=float, default=None,
                   help="optional fixed clip duration in seconds (pad/trim)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--dataset_path", type=str, default="LibriTTS")
    p.add_argument("--ext_audio", type=str, default=".flac")
    p.add_argument("--subsets", type=str, nargs="+", required=True)
    p.add_argument("--exact", action="store_true",
                   help="feed raw lengths (recompiles per unique length)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--mode", choices=("conformant", "high", "balanced", "fast"),
                   default="conformant",
                   help="'fast' runs the encoder in bf16, 'balanced' keeps the "
                        "LSTM/tail/VQ fp32 (see codec.tokenize); 'conformant' "
                        "is bit-exact vs the torch reference")
    p.add_argument("--semantic_dir", type=str, default=None,
                   help="directory of precomputed w2v-bert targets "
                        "(<fileid>.npy, (1024, Tf) — cli/precompute_semantic"
                        ".py); required for concat_semantic checkpoints "
                        "(tokens depend on the teacher). This path "
                        "tokenizes per file (hop-padded unless --exact; "
                        "one compile per unique length)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="shard each utterance across every attached device "
                        "(parallel/sp.py exact halo+LSTM-relay tokenizer); "
                        "token-identical to single-device, built for long "
                        "files on a multi-chip slice")
    p.add_argument("--tensor_parallel", type=int, nargs="?", const=-1,
                   default=0, metavar="N",
                   help="conformer checkpoints: shard the attention/FFN "
                        "weights over an N-device model axis (parallel/tp.py "
                        "Megatron placement); token-identical to "
                        "single-device, built for wide models on a "
                        "multi-chip slice. Bare flag = all attached devices; "
                        "pass a degree when n_head/dims don't divide the "
                        "full slice size")
    return p


def load_model(save_path, *, fold: bool = True):
    """Returns (cfg, params). Dispatches framework vs reference layouts.

    fold=True folds weight-norm (g, v) pairs into plain weights — the
    inference-time `remove_weight_norm` of the reference
    (vq/codec_encoder.py:69-78): one weight tensor per conv instead of two.
    """
    p = Path(save_path)
    if (p / "config.json").exists():
        from ..train.checkpoint import load_checkpoint_params

        cfg, params = load_checkpoint_params(p)
    else:
        from ..convert import load_reference_checkpoint

        cfg, params = load_reference_checkpoint(p)
    if fold:
        from ..ops.conv import fold_weight_norm

        params = fold_weight_norm(params)
    return cfg, params


def iter_corpus(root: Path, subsets, ext: str):
    for subset in subsets:
        base = root / subset
        if not base.exists():
            print(f"warning: subset path missing: {base}")
            continue
        for f in sorted(base.rglob(f"*{ext}")):
            yield subset, f


def parse_fileid(fileid: str):
    if "_" in fileid:
        parts = fileid.split("_")
    elif "-" in fileid:
        parts = fileid.split("-")
    else:
        return "unknown", "unknown"
    if len(parts) >= 2:
        return parts[0], parts[1]
    return "unknown", "unknown"


def main(argv=None):
    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.audio_io import read_audio
    from ..models import codec as C
    from ..ops.resample import resample

    args = build_argparser().parse_args(argv)
    cfg, params = load_model(args.save_path)
    sem_dir = Path(args.semantic_dir) if args.semantic_dir else None
    if cfg.train.use_semantic and cfg.train.concat_semantic and sem_dir is None:
        raise SystemExit(
            "this checkpoint quantizes concat(semantic, latents) "
            "(concat_semantic: true): tokenization needs per-utterance "
            "w2v-bert teacher targets. Precompute them with "
            "cli/precompute_semantic.py and pass --semantic_dir "
            "(the reference's extract_indices predates this layout).")
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios)) \
        if cfg.model.codec_encoder.type == "bigcodec" else cfg.model.codec_encoder.hop_length

    out_dir = Path(args.save_path) / args.output_folder
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.sequence_parallel and sem_dir is not None:
        print("note: --semantic_dir has no sequence-parallel path (the "
              "teacher target is per-frame); ignoring --sequence_parallel")
        args.sequence_parallel = False
    if args.sequence_parallel and args.exact:
        print("note: --sequence_parallel zero-pads to its chunk bucket and "
              "floors to T//hop frames; the --exact length contract does "
              "not apply on this path")
    if args.tensor_parallel and args.sequence_parallel:
        raise SystemExit("--tensor_parallel and --sequence_parallel shard "
                         "different axes of the same devices; pick one")
    if args.tensor_parallel and sem_dir is not None:
        print("note: --semantic_dir has no tensor-parallel path; ignoring "
              "--tensor_parallel")
        args.tensor_parallel = False
    if args.sequence_parallel:
        from ..parallel.mesh import make_data_mesh
        from ..parallel.sp import make_sp_tokenizer

        sp_mode = "conformant" if args.mode == "balanced" else args.mode
        if sp_mode != args.mode:
            print(f"note: --mode {args.mode} has no sequence-parallel "
                  f"variant; using {sp_mode}")
        sp_tok = make_sp_tokenizer(cfg, make_data_mesh(), mode=sp_mode)
    else:
        sp_tok = None

        if args.tensor_parallel:
            # per-file batches are B=1, so the data axis must stay size 1
            # (parallel/tp.jit_tp_tokenize); the model axis defaults to all
            # attached devices but accepts a smaller degree when head/dim
            # divisibility demands it (ADVICE r3)
            from ..parallel.tp import jit_tp_tokenize, make_dp_tp_mesh

            tp_n = (len(jax.devices()) if args.tensor_parallel < 0
                    else args.tensor_parallel)
            if tp_n > len(jax.devices()):
                raise SystemExit(
                    f"--tensor_parallel {tp_n} exceeds the "
                    f"{len(jax.devices())} attached devices")
            # the mesh must span EXACTLY tp_n devices: per-file batches are
            # B=1, which cannot shard over a >1 data axis
            tokenize = jit_tp_tokenize(
                cfg, make_dp_tp_mesh(tp_n, jax.devices()[:tp_n]),
                mode=args.mode)
        else:
            @jax.jit
            def tokenize(params, wav):
                return C.tokenize(params, cfg, wav, mode=args.mode)

    if sem_dir is not None:
        @jax.jit
        def tokenize_sem(params, wav, sem):
            return C.tokenize(params, cfg, wav, mode=args.mode,
                              semantic_target=sem)

    # int16 is the reference contract (codebooks <= 32767); large
    # LFQ-style codebooks fall back to int32 to avoid overflow
    dtype = np.int16 if cfg.model.codec_decoder.codebook_size <= 32767 else np.int32

    def save_one(subset, fileid, codes):  # codes (Nq, frames)
        indices = codes.T if codes.shape[0] > 1 else codes[0]  # (T, Nq) | (T,)
        speaker, chapter = parse_fileid(fileid)
        sub_dir = out_dir / subset / speaker / chapter
        sub_dir.mkdir(parents=True, exist_ok=True)
        np.save(sub_dir / f"{fileid}.npy", indices.astype(dtype))

    # ragged batching (utils/ragged.py): exact per-file tokens, one device
    # call per batch; buckets of ceil(len/1s) bound compiles. The reference
    # forces batch 1 (extract_indices.py:397) — this is the TPU throughput
    # fix, and it is used even at batch_size=1: bucketing via the per-sample
    # edge mask avoids one XLA compile per unique file length.
    enc_cfg = cfg.model.codec_encoder
    ragged_ok = (
        (enc_cfg.type == "bigcodec"
         and not (enc_cfg.use_rnn and enc_cfg.rnn_bidirectional))
        # conformer: exact masked attention/conv path (utils/ragged.py);
        # 'balanced' splits the bigcodec conv front and has no conformer
        # variant, and MoE capacity routing is batch-global — both stay
        # per-file
        or (enc_cfg.type == "conformer_stft" and args.mode != "balanced"
            and getattr(enc_cfg, "ffn_type", "dense") != "moe"))
    batched = (sp_tok is None and not args.tensor_parallel and not args.exact
               and sem_dir is None and ragged_ok
               and not (cfg.train.use_semantic and cfg.train.concat_semantic))
    if batched:
        from ..utils.ragged import make_ragged_tokenizer

        ragged = make_ragged_tokenizer(cfg, mode=args.mode)
    pending: dict = {}
    quantum = max(args.sample_rate // hop * hop, hop)

    count = 0
    errors = 0
    last_print = 0

    def flush(key):
        nonlocal count, errors
        items = pending.pop(key, None)
        if not items:
            return
        plen, dt = key
        try:
            wavs = np.zeros((args.batch_size, plen), dt)
            lens = np.zeros((args.batch_size,), np.int32)
            for i, (_, _, w) in enumerate(items):
                wavs[i, :len(w)] = w
                lens[i] = len(w)
            codes = np.asarray(ragged(params, jnp.asarray(wavs),
                                      jnp.asarray(lens)))  # (Nq, B, plen/hop)
            for i, (subset_i, fileid_i, w) in enumerate(items):
                save_one(subset_i, fileid_i, codes[:, i, :len(w) // hop])
            count += len(items)
        except Exception as exc:
            # one bad batch must not lose batch_size files: retry each item
            # alone through the same bucketed path (B rows, one live)
            print(f"batch error ({len(items)} files), retrying per file: "
                  f"{type(exc).__name__}: {exc}")
            for subset_i, fileid_i, w in items:
                try:
                    wavs = np.zeros((args.batch_size, plen), dt)
                    lens = np.zeros((args.batch_size,), np.int32)
                    wavs[0, :len(w)] = w
                    lens[0] = len(w)
                    codes = np.asarray(ragged(params, jnp.asarray(wavs),
                                              jnp.asarray(lens)))
                    save_one(subset_i, fileid_i, codes[:, 0, :len(w) // hop])
                    count += 1
                except Exception as exc2:
                    print(f"error on {fileid_i}: {type(exc2).__name__}: {exc2}")
                    errors += 1

    t0 = time.time()
    audio_seconds = 0.0
    for subset, f in iter_corpus(Path(args.dataset_root) / args.dataset_path,
                                 args.subsets, args.ext_audio):
        fileid = f.stem
        try:
            wav, sr = read_audio(f)
            wav = wav[0]
            if args.duration is not None:
                target = int(args.duration * sr)
                if len(wav) < target:
                    wav = np.pad(wav, (0, target - len(wav)))
                wav = wav[:target]
            if sr != args.sample_rate:
                wav = np.asarray(resample(jnp.asarray(wav), sr, args.sample_rate))
            audio_seconds += len(wav) / args.sample_rate
            if not args.exact and len(wav) % hop != 0:
                wav = np.pad(wav, (0, hop - len(wav) % hop))
            if batched:
                plen = -(-len(wav) // quantum) * quantum
                # PCM16-origin audio round-trips int16 exactly; shipping it
                # as int16 halves the host->device bytes (converted on device
                # inside the ragged tokenizer, bit-identically)
                w = np.asarray(wav, np.float32)
                scaled = w * 32768.0
                if (np.abs(scaled) <= 32767).all() and \
                        (scaled == np.round(scaled)).all():
                    w = scaled.astype(np.int16)
                key = (plen, w.dtype.str)
                bucket = pending.setdefault(key, [])
                bucket.append((subset, fileid, w))
                if len(bucket) == args.batch_size:
                    flush(key)
            else:
                if sem_dir is not None:
                    sem = np.load(sem_dir / f"{fileid}.npy").astype(np.float32)
                    tf = len(wav) // hop
                    if sem.shape[1] < tf:
                        sem = np.pad(sem, ((0, 0), (0, tf - sem.shape[1])))
                    sem = sem[:, :tf]
                    codes = tokenize_sem(params, jnp.asarray(wav)[None],
                                         jnp.asarray(sem)[None])
                    codes = np.asarray(codes)[:, 0]
                elif sp_tok is not None:
                    codes = np.asarray(sp_tok(params, jnp.asarray(wav)))  # (Nq, T)
                else:
                    codes = tokenize(params, jnp.asarray(wav)[None])  # (Nq, 1, T)
                    codes = np.asarray(codes)[:, 0]  # (Nq, T)
                save_one(subset, fileid, codes)
                count += 1
            if count - last_print >= 100:
                last_print = count
                dt = time.time() - t0
                print(f"saved={count} errors={errors} "
                      f"throughput={audio_seconds / dt:.1f} audio-s/s", flush=True)
        except FileNotFoundError as e:
            print(f"skip (missing): {e}")
            errors += 1
        except Exception as e:
            print(f"error on {fileid}: {type(e).__name__}: {e}")
            errors += 1
    for key in sorted(pending):
        flush(key)
    dt = time.time() - t0
    print(json.dumps({"saved": count, "errors": errors,
                      "audio_seconds": round(audio_seconds, 1),
                      "wall_seconds": round(dt, 1),
                      "audio_s_per_s": round(audio_seconds / max(dt, 1e-9), 2)}))


if __name__ == "__main__":
    main()
