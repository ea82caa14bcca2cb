"""End-to-end quickstart on synthetic audio (no dataset needed).

Builds a tiny corpus, trains a small codec for a few steps, extracts token
indices, and runs the reconstruction eval — the full reference workflow
(preprocess -> train -> extract_indices -> inference_full) in miniature.

Run from the repo root:  python examples/quickstart.py [workdir]
(~3 minutes on CPU; forces the CPU backend for fast compiles.)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from audiotokenization_tpu.data.audio_io import write_wav


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "quickstart_out")
    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)

    # 1. synthetic LibriSpeech-layout corpus
    for spk, chap, n in [(19, 198, 3), (26, 495, 2)]:
        d = work / "data/LibriSpeech/test-clean" / str(spk) / str(chap)
        d.mkdir(parents=True, exist_ok=True)
        for u in range(n):
            t = np.arange(3200) / 16000.0
            wav = (0.3 * np.sin(2 * np.pi * (180 + 60 * u) * t)
                   + 0.05 * rng.randn(len(t))).astype(np.float32)
            write_wav(d / f"{spk}-{chap}-{u:04d}.wav", wav, 16000)

    # 2. filelist
    from audiotokenization_tpu.cli.preprocess import main as preprocess

    preprocess(["--root", str(work / "data/LibriSpeech"),
                "--out_dir", str(work / "filelists"), "--ext_audio", ".wav",
                "--groups", "test_clean"])

    # 3. tiny config + short training run
    cfg_yaml = work / "tiny.yaml"
    cfg_yaml.write_text(f"""
name: quickstart
train:
  precision: fp32
  max_steps: 5
  log_every_n_steps: 1
  checkpoint_every_n_steps: 5
  val_every_n_steps: 1000
model:
  codec_encoder: {{ngf: 4, out_channels: 32, up_ratios: [2, 5], rnn_num_layers: 1}}
  codec_decoder: {{in_channels: 32, upsample_initial_channel: 16, up_ratios: [5, 2],
                  rnn_num_layers: 1, codebook_size: 64, codebook_dim: 8}}
  mpd: {{periods: [2, 3], channels: 4, max_downsample_channels: 16}}
  mstft:
    stft_params: {{fft_sizes: [128, 256], hop_sizes: [32, 64], win_lengths: [128, 256]}}
    channels: 4
    max_downsample_channels: 16
dataset:
  train: {{filelist: {work / 'filelists/librispeech_test_clean.txt'}, batch_size: 2, min_audio_length: 800}}
  pad_to_multiple_of: 10
""")
    from audiotokenization_tpu.cli.train import main as train

    train(["--config", str(cfg_yaml), "--run_dir", str(work / "run"), "--no_wandb"])

    # 4. token extraction (int16 .npy corpus contract)
    from audiotokenization_tpu.cli.extract_indices import main as extract

    extract(["--dataset_root", str(work / "data"), "--save_path", str(work / "run"),
             "--dataset_path", "LibriSpeech", "--ext_audio", ".wav",
             "--subsets", "test-clean"])

    # 5. reconstruction eval
    from audiotokenization_tpu.cli.inference_full import main as inference

    inference(["--save_path", str(work / "run"), "--batch_size", "2",
               "--duration", "0.05", "--num_examples", "2"])

    print("\nquickstart artifacts under:", work)
    print("  tokens:", *(work / "run/extracted_indices").rglob("*.npy"))
    print("  eval:  ", work / "run/inference_full/summary.json")


if __name__ == "__main__":
    main()
