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
    p.add_argument("--feat_type", choices=("fbank", "mfcc", "ssl"),
                   default="fbank",
                   help="acoustic frontend (models/ecapa_tdnn.py); 'ssl' is "
                        "the s3prl-style layer-weighted frontend over a "
                        "native upstream (--ssl_family/--ssl_checkpoint)")
    p.add_argument("--ssl_family",
                   choices=("wavlm", "wav2vec2", "hubert", "unispeech_sat",
                            # reference init_model names (verification.py:11-28)
                            "wavlm_base_plus", "wavlm_large", "hubert_large",
                            "wav2vec2_xlsr"),
                   default="wavlm",
                   help="SSL upstream family (reference "
                        "speaker_verification/models/ecapa_tdnn.py:258-273; "
                        "the reference's init_model names are accepted as "
                        "aliases)")
    p.add_argument("--ssl_checkpoint", type=str, default=None,
                   help="transformers-layout torch state dict for the "
                        "upstream (config inferred from weight shapes)")
    p.add_argument("--ssl_heads", type=int, default=None,
                   help="override inferred attention-head count (default: "
                        "rel_attn_embed width for wavlm, else "
                        "hidden_size // 64)")
    p.add_argument("--ssl_strides", type=str, default=None,
                   help="override inferred conv strides, comma-separated "
                        "(default: the canonical 5,2,2,2,2,2,2)")
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.audio_io import read_audio
    from ..models.ecapa_tdnn import init_ecapa_tdnn, speaker_similarity
    from ..ops.resample import resample

    ssl_fn, ssl_layers, ssl_hidden = None, None, None
    if args.feat_type == "ssl":
        if args.ssl_checkpoint is None:
            raise SystemExit("--feat_type ssl needs --ssl_checkpoint "
                             "(a transformers-layout torch state dict)")
        import torch

        from ..models.wav2vec2 import load_ssl_upstream

        try:
            ssd = torch.load(args.ssl_checkpoint, map_location="cpu",
                             weights_only=True)
        except Exception as exc:  # pickled s3prl/fairseq objects
            raise SystemExit(
                f"--ssl_checkpoint failed to load as a plain state dict "
                f"({type(exc).__name__}: {exc}). s3prl/fairseq upstream "
                "pickles are not supported — export the model to the "
                "transformers layout first (e.g. save_pretrained from "
                "transformers' WavLMModel/Wav2Vec2Model and point at its "
                "pytorch_model.bin).") from exc
        ssd = ssd.get("model", ssd.get("state_dict", ssd))
        ssd = {k: v.numpy() for k, v in ssd.items()
               if hasattr(v, "numpy")}
        if not any(k.startswith("feature_extractor.conv_layers.")
                   for k in ssd):
            hint = next((p for p in ("w2v_model.", "model.feature_extractor",
                                     "w2v_encoder.")
                         for k in ssd if k.startswith(p)), None)
            raise SystemExit(
                "--ssl_checkpoint is not a transformers-layout state dict "
                "(no feature_extractor.conv_layers.* keys"
                + (f"; found {hint}* keys, which looks like an s3prl/"
                   "fairseq layout" if hint else "")
                + "). Convert it to the transformers layout (HF hub "
                "checkpoints of wavlm/wav2vec2/hubert/unispeech-sat load "
                "directly).")
        strides = (tuple(int(s) for s in args.ssl_strides.split(","))
                   if args.ssl_strides else None)
        family = {"wavlm_base_plus": "wavlm", "wavlm_large": "wavlm",
                  "hubert_large": "hubert", "wav2vec2_xlsr": "wav2vec2",
                  }.get(args.ssl_family, args.ssl_family)
        ssl_fn, ssl_cfg = load_ssl_upstream(
            ssd, family, num_attention_heads=args.ssl_heads,
            conv_stride=strides)
        ssl_layers = ssl_cfg.num_hidden_layers + 1
        ssl_hidden = ssl_cfg.hidden_size

    n_mels = {"fbank": 80, "mfcc": 40, "ssl": ssl_hidden}[args.feat_type]
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

    kw = {}
    if args.feat_type == "ssl":
        fw = params.get("feature_weight")
        if fw is None:  # untrained layer weights: uniform softmax
            fw = jnp.zeros((ssl_layers,))
        kw = dict(ssl_fn=ssl_fn, feature_weight=fw)
    sim = float(speaker_similarity(params, load(args.wav1), load(args.wav2),
                                   feat_type=args.feat_type, **kw)[0])
    print(json.dumps({"similarity": sim,
                      "trained_weights": args.checkpoint is not None}))


if __name__ == "__main__":
    main()
