"""Precompute Wav2Vec2-BERT semantic targets for the distillation branch.

Reference behavior: with use_semantic on, the frozen
Wav2Vec2BertModel("facebook/w2v-bert-2.0") runs inside every training step on
AutoFeatureExtractor features, taking hidden layer 16 as the distillation
target (BigCodec_SSL/lightning_module.py:192-239, data_module.py:124-132).

The teacher is frozen, so on TPU the idiomatic choice (SURVEY.md §7.7) is to
run it ONCE offline over the corpus and store per-utterance targets as
float16 .npy files that the dataset attaches as batch["semantic_target"].
Requires transformers + locally cached w2v-bert weights (this image has no
network egress; point --model_path at a local snapshot).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--filelist", type=str, required=True)
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--model_path", type=str, default="facebook/w2v-bert-2.0",
                   help="HF id or local snapshot dir with weights")
    p.add_argument("--layer", type=int, default=16)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args(argv)

    try:
        import torch
        from transformers import AutoFeatureExtractor, Wav2Vec2BertModel
    except ImportError as e:
        raise SystemExit(f"transformers/torch required for the teacher: {e}")

    from ..data.audio_io import read_audio
    from ..data.dataset import read_filelist

    extractor = AutoFeatureExtractor.from_pretrained(args.model_path)
    model = Wav2Vec2BertModel.from_pretrained(args.model_path,
                                              output_hidden_states=True).eval()

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = read_filelist(args.filelist, args.dataset_root)
    for i, f in enumerate(files):
        wav, sr = read_audio(f)
        wav = wav[0]
        # reference pads ±160 samples before feature extraction (data_module.py:129)
        wav = np.pad(wav, (160, 160))
        feats = extractor(wav, sampling_rate=args.sample_rate,
                          return_tensors="pt").input_features
        with torch.no_grad():
            hidden = model(feats).hidden_states[args.layer]  # (1, Tf, 1024)
        target = hidden[0].T.numpy().astype(np.float16)  # (1024, Tf)
        np.save(out_dir / (Path(f).stem + ".npy"), target)
        if i % 100 == 0:
            print(f"{i}/{len(files)}", flush=True)


if __name__ == "__main__":
    main()
