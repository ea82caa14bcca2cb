"""End-to-end extract_indices CLI test: corpus walk, int16 .npy contract,
and cross-checked token parity between a reference torch checkpoint and the
CLI's converted-model path."""
import json
from pathlib import Path

import numpy as np
import pytest
import torch
import yaml

from reference_loader import load_reference

from audiotokenization_tpu.data.audio_io import write_wav


def _make_reference_run(tmp_path):
    """Create a reference-layout run dir: hydra/config.yaml + pl_log/last.ckpt."""
    vq = load_reference()
    torch.manual_seed(0)
    enc = vq.BigCodecEncoder(ngf=8, out_channels=64).eval()
    dec = vq.BigCodecDecoder(in_channels=64, upsample_initial_channel=96,
                             codebook_size=64, codebook_dim=8).eval()
    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in dec.state_dict().items():
        sd[f"decoder.{k}"] = v
    run = tmp_path / "ref_run"
    (run / "hydra").mkdir(parents=True)
    (run / "pl_log").mkdir()
    cfg = {
        "name": "tiny-ref",
        "model": {
            "codec_encoder": {"type": "bigcodec", "out_channels": 64, "ngf": 8,
                              "use_rnn": True, "rnn_bidirectional": False,
                              "rnn_num_layers": 2, "up_ratios": [2, 2, 2, 5, 5],
                              "dilations": [1, 3, 9], "causal": False,
                              "antialias": False},
            "codec_decoder": {"type": "bigcodec", "in_channels": 64,
                              "upsample_initial_channel": 96, "ngf": 8,
                              "use_rnn": True, "rnn_bidirectional": False,
                              "rnn_num_layers": 2, "up_ratios": [5, 5, 2, 2, 2],
                              "dilations": [1, 3, 9], "causal": False,
                              "antialias": False, "vq_num_quantizers": 1,
                              "vq_commit_weight": 0.25, "vq_weight_init": False,
                              "vq_full_commit_loss": False, "fsq": False,
                              "fsq_levels": [4, 4, 4, 8], "codebook_size": 64,
                              "codebook_dim": 8},
        },
        "dataset": {"sample_rate": 16000, "pad_to_multiple_of": 320},
    }
    (run / "hydra" / "config.yaml").write_text(yaml.dump(cfg))
    torch.save({"state_dict": sd}, run / "pl_log" / "last.ckpt")
    return run, enc, dec


def _make_corpus(tmp_path):
    """LibriSpeech-style tree: root/LibriSpeech/test-clean/<spk>/<chap>/<id>.wav"""
    rng = np.random.RandomState(0)
    root = tmp_path / "datasets" / "LibriSpeech"
    wavs = {}
    for spk, chap, utt in [(19, 198, 0), (19, 198, 1), (26, 495, 0)]:
        d = root / "test-clean" / str(spk) / str(chap)
        d.mkdir(parents=True, exist_ok=True)
        fileid = f"{spk}-{chap}-{utt:04d}"
        wav = (rng.randn(3000 + 400 * utt) * 0.1).astype(np.float32)
        write_wav(d / f"{fileid}.wav", wav, 16000)
        wavs[fileid] = wav
    return tmp_path / "datasets", wavs


def test_extract_cli_reference_ckpt_parity(tmp_path):
    run, enc, dec = _make_reference_run(tmp_path)
    dataset_root, wavs = _make_corpus(tmp_path)

    from audiotokenization_tpu.cli.extract_indices import main

    main(["--dataset_root", str(dataset_root), "--save_path", str(run),
          "--dataset_path", "LibriSpeech", "--ext_audio", ".wav",
          "--subsets", "test-clean"])

    out_dir = run / "extracted_indices" / "test-clean"
    files = sorted(out_dir.rglob("*.npy"))
    assert len(files) == 3
    for f in files:
        fileid = f.stem
        spk, chap, _ = fileid.split("-")
        assert f.parent.name == chap and f.parent.parent.name == spk
        got = np.load(f)
        assert got.dtype == np.int16
        # golden: reference model on the same (hop-padded) wav
        wav = wavs[fileid]
        pad = (-len(wav)) % 200
        wav_p = np.pad(wav, (0, pad))
        with torch.no_grad():
            lat = enc(torch.from_numpy(wav_p)[None, None])
            _, idx, _ = dec(lat, vq=True)
        ref = idx.squeeze(1).numpy()  # (Nq, T) -> squeeze batch
        ref = ref[0] if ref.shape[0] == 1 else ref.T
        np.testing.assert_array_equal(got, ref.astype(np.int16))
