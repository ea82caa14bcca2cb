"""Full reconstruction-evaluation CLI (inference_full.py equivalent).

Reference contract (BigCodec_SSL/inference_full.py:606-871): load a
checkpoint, run the eval corpus through encode -> VQ -> decode, accumulate
losses + codebook usage + SI-SNR/SI-SDR/STOI/PESQ, dump example
reconstructions (wav + spectrogram image) and a codebook-usage histogram,
tee stdout to log.txt, and print an epoch summary with normalized & raw
perplexity (calculate_perplexity, :570-604).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np


class Tee:
    """stdout tee to log.txt (inference_full.py:828-842)."""

    def __init__(self, path):
        self.terminal = sys.stdout
        self.log = open(path, "w")

    def write(self, msg):
        self.terminal.write(msg)
        self.log.write(msg)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


def calculate_perplexity(counter: Counter, codebook_size: int):
    """Normalized + raw perplexity from a usage Counter (inference_full.py:570-604)."""
    total = sum(counter.values())
    if total == 0:
        return 0.0, 0.0
    probs = np.asarray([c / total for c in counter.values()])
    entropy = -np.sum(probs * np.log(probs))
    raw = float(np.exp(entropy))
    norm = raw / codebook_size
    return norm, raw


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--filelist", type=str, default=None,
                   help="eval filelist (defaults to cfg.dataset.test.filelist)")
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--duration", type=float, default=1.0,
                   help="crop seconds (<=0 for full-length batch-1 eval)")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--num_examples", type=int, default=10)
    p.add_argument("--output_folder", type=str, default="inference_full")
    p.add_argument("--w2v_bert_path", type=str, default=None,
                   help="local facebook/w2v-bert-2.0 snapshot dir — needed to "
                        "evaluate use_semantic checkpoints (the teacher "
                        "features feed fc_prior / the concat branch)")
    p.add_argument("--w2v_bert_init", choices=["pretrained", "random"],
                   default="pretrained",
                   help="random: seeded random teacher (smoke/tests only)")
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.audio_io import write_wav
    from ..data.dataset import AudioDataset, DataLoader
    from ..config import DatasetSplit
    from ..models import codec as C
    from ..train import metrics as M
    from .extract_indices import load_model

    out_dir = Path(args.save_path) / args.output_folder
    out_dir.mkdir(parents=True, exist_ok=True)

    # tee stdout to <out_dir>/log.txt (reference: inference_full.py:828-842)
    sys.stdout = Tee(out_dir / "log.txt")

    cfg, params = load_model(args.save_path)
    sr = cfg.dataset.sample_rate
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios)) \
        if cfg.model.codec_encoder.type == "bigcodec" else cfg.model.codec_encoder.hop_length

    filelist = (args.filelist or cfg.dataset.test.filelist
                or cfg.dataset.val.filelist or cfg.dataset.train.filelist)
    if not filelist:
        raise SystemExit("no eval filelist: pass --filelist (config has no "
                         "dataset.test/val/train filelist)")
    dur = None if args.duration is None or args.duration <= 0 else args.duration
    split = DatasetSplit(
        filelist=filelist,
        batch_size=args.batch_size if dur else 1,
        shuffle=False,
        min_audio_length=int(dur * sr) if dur else -1)

    # full-length eval: bucketed ragged batches instead of the reference's
    # batch-1 full-length policy (one compile per unique length). Exact
    # per-file tokens; waveforms to fp32 rounding (utils/ragged.py).
    ragged_codec = None
    if dur is None and args.batch_size > 1:
        try:
            from ..utils.ragged import make_ragged_codec

            ragged_codec = make_ragged_codec(cfg)
        except NotImplementedError as exc:
            print(f"note: ragged full-length batching unavailable ({exc}); "
                  "running batch-1")

    # use_semantic checkpoints need the frozen teacher at eval time
    # (lightning_module.py:240-255: fc_prior consumes teacher-derived input):
    # the crop / batch-1 paths feed dataset-computed feats through
    # codec.forward; the ragged concat path computes per-file targets via the
    # masked teacher (train/loop._make_test_teacher)
    teacher_fwd = None
    compute_feats = cfg.train.use_semantic and ragged_codec is None
    # the ragged path for NON-concat semantic checkpoints only applies
    # fc_prior/fc_post (per-position) — no teacher needed there; don't
    # demand 600M params of weights for an eval that never touches them
    needs_teacher = compute_feats or (cfg.train.use_semantic
                                      and cfg.train.concat_semantic
                                      and ragged_codec is not None)
    if needs_teacher:
        from .train import _build_teacher

        params = {**params, "w2v_bert": _build_teacher(cfg, args)}
        if cfg.train.concat_semantic and ragged_codec is not None:
            from ..train.loop import _make_test_teacher

            teacher_fwd = _make_test_teacher(cfg)
    ds = AudioDataset(split, sample_rate=sr, pad_to_multiple_of=hop,
                      root=args.dataset_root, train=False,
                      compute_feats=compute_feats, hop_length=hop)
    loader = DataLoader(ds, batch_size=split.batch_size, shuffle=False,
                        drop_last=False, num_workers=8)

    @jax.jit
    def eval_step(params, batch):
        out = C.forward(params, cfg, batch, training=False)
        y, y_ = out.gt_wav[:, 0], out.gen_wav[:, 0]
        return {
            "gen": out.gen_wav, "codes": out.vq_code,
            "si_snr": M.si_snr(y_, y), "si_sdr": M.si_sdr(y_, y),
        }

    usage = Counter()
    agg = {"si_snr": [], "si_sdr": [], "stoi": [], "pesq": []}
    saved_examples = 0
    n_frames_total = 0
    t0 = time.time()
    audio_seconds = 0.0

    def per_file(gt_i, gen_i, codes_i, want_quality: bool,
                 si_snr_i: float, si_sdr_i: float):
        nonlocal saved_examples, n_frames_total
        agg["si_snr"].append(si_snr_i)
        agg["si_sdr"].append(si_sdr_i)
        flat = codes_i.reshape(-1)
        usage.update(flat.tolist())
        n_frames_total += flat.size
        if want_quality:
            st = M.stoi(gt_i, gen_i, sr)
            if np.isfinite(st):
                agg["stoi"].append(st)
            pq = M.pesq_metric(gt_i, gen_i, sr)
            if pq is not None:
                agg["pesq"].append(pq)
        if saved_examples < args.num_examples:
            i = saved_examples
            write_wav(out_dir / f"example_{i}_gt.wav", gt_i, sr)
            write_wav(out_dir / f"example_{i}_recon.wav", gen_i, sr)
            _save_spectrogram_png(out_dir / f"example_{i}_spec.png", gt_i,
                                  gen_i, sr)
            saved_examples += 1

    if ragged_codec is not None:
        quantum = max(sr // hop * hop, hop)
        pending: dict = {}
        done = [0, 0]  # files, device batches

        @jax.jit
        def batch_si(gt, gen, lens):
            # per-sample metrics in ONE device call (per-file eager metric
            # dispatch costs ~40 ms/round-trip on remote-attached chips)
            return (M.masked_si(gen, gt, lens, zero_mean=True),
                    M.masked_si(gen, gt, lens, zero_mean=False))

        def flush(plen):
            nonlocal audio_seconds
            items = pending.pop(plen, None)
            if not items:
                return
            # accrue coverage per FLUSHED file: files enqueued but never
            # flushed (early --max_batches stop) must not inflate the summary
            audio_seconds += sum(len(w) for w in items) / sr
            wavs = np.zeros((args.batch_size, plen), np.float32)
            lens = np.zeros((args.batch_size,), np.int32)
            for i, w in enumerate(items):
                wavs[i, :len(w)] = w
                lens[i] = len(w)
            wavs_d, lens_d = jnp.asarray(wavs), jnp.asarray(lens)
            sem_t = None
            if teacher_fwd is not None:
                rows = [np.asarray(teacher_fwd(params["w2v_bert"], w, plen, hop))
                        for w in items]
                sem_t = np.zeros((args.batch_size, rows[0].shape[1],
                                  plen // hop), np.float32)
                for i, r in enumerate(rows):
                    sem_t[i] = r[0]
                sem_t = jnp.asarray(sem_t)
            recon, codes = ragged_codec(params, wavs_d, lens_d, sem_t)
            snr, sdr = batch_si(wavs_d, recon, lens_d)
            recon, codes = np.asarray(recon), np.asarray(codes)
            snr, sdr = np.asarray(snr), np.asarray(sdr)
            for i, w in enumerate(items):
                # STOI/PESQ are slow CPU metrics: first 2 files per batch,
                # mirroring the non-ragged path's min(len(gt), 2)
                per_file(w, recon[i, :len(w)], codes[:, i, :len(w) // hop],
                         want_quality=i < 2,
                         si_snr_i=float(snr[i]), si_sdr_i=float(sdr[i]))
            done[0] += len(items)
            done[1] += 1
            if done[1] % 5 == 0:
                print(f"batch {done[1]}: files={done[0]} "
                      f"si_snr={agg['si_snr'][-1]:.2f}", flush=True)

        for batch in loader:
            # --max_batches means DEVICE batches in both paths
            if args.max_batches is not None and done[1] >= args.max_batches:
                break
            w = np.asarray(batch["wav"])[0]
            plen = -(-len(w) // quantum) * quantum
            bucket = pending.setdefault(plen, [])
            bucket.append(w)
            if len(bucket) == args.batch_size:
                flush(plen)
        for plen in sorted(pending):
            if args.max_batches is not None and done[1] >= args.max_batches:
                break
            flush(plen)
    else:
        for bi, batch in enumerate(loader):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            wav = jnp.asarray(batch["wav"])
            audio_seconds += wav.shape[0] * wav.shape[1] / sr
            dev_batch = {"wav": wav}
            if compute_feats:
                dev_batch["feats"] = jnp.asarray(batch["feats"])
            out = eval_step(params, dev_batch)
            agg["si_snr"].append(float(out["si_snr"]))
            agg["si_sdr"].append(float(out["si_sdr"]))
            codes = np.asarray(out["codes"]).reshape(-1)
            usage.update(codes.tolist())
            n_frames_total += codes.size
            gt = np.asarray(batch["wav"])
            gen = np.asarray(out["gen"])[:, 0]
            for j in range(min(len(gt), 2)):
                s = M.stoi(gt[j], gen[j], sr)
                if np.isfinite(s):
                    agg["stoi"].append(s)
                pq = M.pesq_metric(gt[j], gen[j], sr)
                if pq is not None:
                    agg["pesq"].append(pq)
            while saved_examples < args.num_examples and saved_examples < len(gt):
                i = saved_examples
                write_wav(out_dir / f"example_{i}_gt.wav", gt[i], sr)
                write_wav(out_dir / f"example_{i}_recon.wav", gen[i], sr)
                _save_spectrogram_png(out_dir / f"example_{i}_spec.png", gt[i], gen[i], sr)
                saved_examples += 1
            if bi % 20 == 0:
                print(f"batch {bi}: si_snr={agg['si_snr'][-1]:.2f}", flush=True)

    norm_ppl, raw_ppl = calculate_perplexity(usage, cfg.model.codec_decoder.codebook_size)
    dt = time.time() - t0
    summary = {
        "si_snr": float(np.mean(agg["si_snr"])) if agg["si_snr"] else None,
        "si_sdr": float(np.mean(agg["si_sdr"])) if agg["si_sdr"] else None,
        "stoi": float(np.mean(agg["stoi"])) if agg["stoi"] else None,
        "pesq": float(np.mean(agg["pesq"])) if agg["pesq"] else None,
        "pesq_impl": M.pesq_impl() if agg["pesq"] else None,
        "codebook_used": len(usage),
        "codebook_size": cfg.model.codec_decoder.codebook_size,
        "utilization": len(usage) / cfg.model.codec_decoder.codebook_size,
        "perplexity_raw": raw_ppl,
        "perplexity_normalized": norm_ppl,
        "frames": int(n_frames_total),
        "audio_s_per_s": round(audio_seconds / max(dt, 1e-9), 2),
    }
    _save_usage_histogram(out_dir / "codebook_usage.png", usage,
                          cfg.model.codec_decoder.codebook_size)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


def _save_spectrogram_png(path, gt, gen, sr):
    """Mel-spectrogram comparison image; soft-skips without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    import jax.numpy as jnp

    from ..ops.stft import mel_spectrogram

    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
    for ax, sig, title in ((axes[0], gt, "ground truth"), (axes[1], gen, "reconstruction")):
        m = np.asarray(mel_spectrogram(jnp.asarray(sig)[None], sample_rate=sr,
                                       n_fft=1024, hop_length=256, n_mels=128))[0]
        ax.imshow(20 * np.log10(np.maximum(m, 1e-5))[::-1], aspect="auto")
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def _save_usage_histogram(path, usage, codebook_size):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    counts = np.zeros(codebook_size)
    for k, v in usage.items():
        counts[int(k)] = v
    fig, ax = plt.subplots(figsize=(12, 3))
    ax.bar(np.arange(codebook_size), np.sort(counts)[::-1], width=1.0)
    ax.set_title(f"codebook usage ({(counts > 0).sum()}/{codebook_size} used)")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


if __name__ == "__main__":
    main()
