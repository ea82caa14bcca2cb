"""Conformer codec end-to-end train-step test (tiny, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.config import Config
from audiotokenization_tpu.train.state import init_train_state
from audiotokenization_tpu.train.step import jit_train_step


def conformer_tiny_config() -> Config:
    cfg = Config()
    cfg.train.precision = "fp32"
    e = cfg.model.codec_encoder
    e.type = "conformer_stft"
    e.hop_length = 40
    e.n_fft = 160
    e.window_size = 160
    e.dim = 32
    e.n_layers = 1
    e.n_head = 2
    e.out_channels = 32
    e.rope_theta = 500.0
    d = cfg.model.codec_decoder
    d.type = "conformer_istft"
    d.in_channels = 32
    d.hop_length = 40
    d.n_fft = 160
    d.window_size = 160
    d.dim = 32
    d.n_layers = 1
    d.n_head = 2
    d.rope_theta = 500.0
    d.codebook_size = 64
    d.codebook_dim = 8
    m = cfg.model.mpd
    m.periods = (2, 3)
    m.channels = 4
    m.max_downsample_channels = 16
    s = cfg.model.mstft
    s.stft_params.fft_sizes = (128,)
    s.stft_params.hop_sizes = (32,)
    s.stft_params.win_lengths = (128,)
    s.channels = 4
    s.max_downsample_channels = 16
    return cfg


def test_conformer_codec_train_step():
    cfg = conformer_tiny_config()
    state = init_train_state(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    batch = {"wav": jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32))}
    state1, metrics = jit_train_step(cfg)(state, batch)
    assert int(state1.step) == 1
    for k in ("disc_loss", "gen_loss", "mel_loss", "vq_loss"):
        assert np.isfinite(float(metrics[k])), k
    # conformer output length matches hop arithmetic: 800 / 40 frames -> 800 wav
    from audiotokenization_tpu.models import codec as C

    out = C.forward(state1.gen_params, cfg, batch)
    assert out.gen_wav.shape == (2, 1, 800)
    assert out.vq_code.shape == (1, 2, 800 // 40)


def test_conformer_train_step_bf16():
    """Mixed-precision conformer step: the fp32 STFT frontend must hand the
    backbone bf16 activations (lax.conv requires matching dtypes — regression
    for the round-3 soak failure)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = conformer_tiny_config()
    cfg.train.precision = "bf16"
    state = init_train_state(jax.random.key(2), cfg)
    wav = jnp.asarray(np.random.RandomState(2).randn(2, 800).astype(np.float32) * 0.1)
    _, m = jit_train_step(cfg)(state, {"wav": wav})
    assert np.isfinite(float(m["gen_loss"]))
