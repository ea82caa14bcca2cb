"""Speaker-verification / speaker-similarity CLI.

Reference: BigCodec_SSL/speaker_verification/verification.py (cosine
similarity of two utterances under a speaker model) and spk_sim.py (speaker
similarity of codec reconstructions). This CLI uses the native ECAPA-TDNN
(models/ecapa_tdnn.py) with optional converted torch weights; without a
trained checkpoint it runs in --smoke mode only (random embedding weights
produce meaningless absolute scores).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav1", type=str, required=True)
    p.add_argument("--wav2", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Orbax/npz ECAPA-TDNN weights")
    p.add_argument("--torch_checkpoint", type=str, default=None,
                   help="reference-layout torch state dict (e.g. a UniSpeech "
                        "SV release) converted via convert_ecapa_from_torch")
    p.add_argument("--smoke", action="store_true",
                   help="allow random-init weights (scores not meaningful)")
    p.add_argument("--feat_type", choices=("fbank", "mfcc"), default="fbank",
                   help="acoustic frontend (models/ecapa_tdnn.py; the "
                        "s3prl-style SSL frontend is available via the "
                        "extract_features API with an SSL teacher)")
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.audio_io import read_audio
    from ..models.ecapa_tdnn import init_ecapa_tdnn, speaker_similarity
    from ..ops.resample import resample

    n_mels = {"fbank": 80, "mfcc": 40}[args.feat_type]
    if args.torch_checkpoint:
        import torch

        from ..models.ecapa_tdnn import convert_ecapa_from_torch

        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=True)
        sd = sd.get("model", sd.get("state_dict", sd))
        params = convert_ecapa_from_torch(
            {k: v.numpy() for k, v in sd.items()})
        args.checkpoint = args.torch_checkpoint  # trained-weights marker
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(Path(args.checkpoint).resolve())
    elif args.smoke:
        params = init_ecapa_tdnn(jax.random.key(0), n_mels=n_mels)
    else:
        raise SystemExit("no --checkpoint given; pass --smoke to run with "
                         "random weights (absolute scores are meaningless)")

    def load(path):
        wav, sr = read_audio(path)
        wav = wav[0]
        if sr != 16000:
            wav = np.asarray(resample(jnp.asarray(wav), sr, 16000))
        return jnp.asarray(wav)[None]

    sim = float(speaker_similarity(params, load(args.wav1), load(args.wav2),
                                   feat_type=args.feat_type)[0])
    print(json.dumps({"similarity": sim,
                      "trained_weights": args.checkpoint is not None}))


if __name__ == "__main__":
    main()
