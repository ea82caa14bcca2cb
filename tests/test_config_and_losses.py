"""Config mapping, STFT loss, and checkpoint-best-tracking tests."""
import json

import numpy as np
import yaml
import jax
import jax.numpy as jnp

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.config import Config, load_config, save_config
from audiotokenization_tpu.losses.stft_loss import multi_resolution_stft_loss
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_reference_hydra_config_mapping(tmp_path):
    """The actual reference config/default trees must map onto our Config."""
    ref_yaml = {
        "name": "bigcodec512-ls-500k-vq8192-50hz",
        "model": {
            "codec_encoder": {"type": "bigcodec", "out_channels": 1024, "ngf": 48,
                              "use_rnn": True, "rnn_bidirectional": False,
                              "rnn_num_layers": 2, "up_ratios": [2, 2, 2, 5, 5],
                              "dilations": [1, 3, 9], "causal": False,
                              "antialias": False},
            "codec_decoder": {"in_channels": 1024, "upsample_initial_channel": 1536,
                              "ngf": 48, "up_ratios": [5, 5, 2, 2, 2],
                              "vq_num_quantizers": 1, "vq_dim": 1024,
                              "vq_commit_weight": 0.25, "fsq": False,
                              "codebook_size": 8192, "codebook_dim": 8},
            "mpd": {"periods": [2, 3, 5, 7, 11], "channels": 16},
            "mstft": {"stft_params": {"fft_sizes": [128, 256, 512, 1024, 2048]}},
        },
        "train": {"lambdas": {"lambda_mel_loss": 15.0},
                  "use_semantic": False, "gen_grad_clip": 1.0},
        "dataset": {"sample_rate": 16000, "pad_to_multiple_of": 320,
                    "train": {"batch_size": 32, "min_audio_length": 16000}},
    }
    cfg = CV.reference_config_to_config(ref_yaml)
    assert cfg.model.codec_encoder.up_ratios == (2, 2, 2, 5, 5)
    assert cfg.model.codec_decoder.codebook_size == 8192
    assert cfg.model.mpd.periods == (2, 3, 5, 7, 11)
    assert cfg.train.lambdas.lambda_mel_loss == 15.0
    assert cfg.dataset.train.batch_size == 32
    assert cfg.name == "bigcodec512-ls-500k-vq8192-50hz"
    # unknown keys (vq_dim exists only in reference yaml) are ignored, not fatal


def test_config_save_load_roundtrip(tmp_path):
    cfg = Config()
    cfg.model.codec_encoder.ngf = 24
    cfg.train.lambdas.lambda_mel_loss = 7.5
    save_config(cfg, tmp_path / "c.json")
    cfg2 = load_config(tmp_path / "c.json")
    assert cfg2.model.codec_encoder.ngf == 24
    assert cfg2.train.lambdas.lambda_mel_loss == 7.5
    # yaml path too
    (tmp_path / "c.yaml").write_text(yaml.dump({"train": {"max_steps": 123}}))
    cfg3 = load_config(tmp_path / "c.yaml", overrides=["model.codec_encoder.ngf=12"])
    assert cfg3.train.max_steps == 123
    assert cfg3.model.codec_encoder.ngf == 12


def test_stft_loss_properties():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    zero = float(multi_resolution_stft_loss(y, y))
    assert zero < 1e-4
    noisy = y + 0.3 * jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    very_noisy = y + 2.0 * jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    l1 = float(multi_resolution_stft_loss(noisy, y))
    l2 = float(multi_resolution_stft_loss(very_noisy, y))
    assert 0 < l1 < l2


def test_checkpoint_best_tracking(tmp_path):
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import TrainState

    cfg = Config()
    mngr = CheckpointManager(tmp_path / "run", cfg)

    def state(step):
        return TrainState(step=jnp.asarray(step), gen_params={"w": jnp.ones(2)},
                          disc_params={}, gen_opt_state=(), disc_opt_state=())

    mngr.save(state(1), metric=5.0)
    mngr.save(state(2), metric=3.0)
    mngr.save(state(3), metric=4.0)
    mngr.wait()
    best = json.loads((tmp_path / "run" / "best.json").read_text())
    assert best["step"] == 2 and best["metric"] == 3.0
    assert mngr.latest_step() == 3


def test_base512_grid_config_instantiates():
    """cfgs/config8-12 base-size grid (out 512, ngf 32, up_ratios [2,4,5,5]
    => hop 200): config loads, model round-trips a batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiotokenization_tpu.config import load_config
    from audiotokenization_tpu.models import codec as C

    cfg = load_config("configs/bigcodec_base512.yaml")
    assert tuple(cfg.model.codec_encoder.up_ratios) == (2, 4, 5, 5)
    assert int(np.prod(cfg.model.codec_encoder.up_ratios)) == 200
    params = C.init_codec(jax.random.key(0), cfg)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 800).astype(np.float32))
    out = C.forward(params, cfg, {"wav": wav})
    assert out.gen_wav.shape == (1, 1, 800)
    assert out.vq_code.shape == (1, 1, 4)


def test_mel_loss_gradient_finite_at_exact_zero_frames():
    """An exactly-zero stretch of generator output must not NaN the mel
    backward: plain sqrt(re^2+im^2) backpropagates 0/0 at a zero bin while
    torch's complex abs defines the subgradient as 0 — this poisoned a real
    TPU training run (r4 soak resume branches, finite loss + NaN grad)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audiotokenization_tpu.losses.mel import MultiResolutionMelLoss

    mel = MultiResolutionMelLoss(sample_rate=16000)
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)
    x = x.at[:, 1000:3000].set(0.0)  # silent stretch: zero STFT frames

    val, g = jax.jit(jax.value_and_grad(lambda x: mel(x, y)))(x)
    assert np.isfinite(float(val))
    g = np.asarray(g)
    assert np.isfinite(g).all(), "mel backward NaN at exact-zero frames"
