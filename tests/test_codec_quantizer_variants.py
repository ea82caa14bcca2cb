"""End-to-end codec tests with alternate quantizers (FSQ / EMA-VQ / LFQ)."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.train.state import init_train_state
from audiotokenization_tpu.train.step import jit_train_step

from test_train_step import tiny_config


def _batch(seed=0, B=2, T=800):
    rng = np.random.RandomState(seed)
    return {"wav": jnp.asarray((rng.randn(B, T) * 0.1).astype(np.float32))}


def test_codec_fsq_end_to_end():
    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.fsq = True
    d.fsq_levels = (4, 4, 4)
    d.codebook_size = 64
    state = init_train_state(jax.random.key(0), cfg)
    state1, metrics = jit_train_step(cfg)(state, _batch())
    assert np.isfinite(float(metrics["gen_loss"]))
    assert float(metrics["vq_loss"]) == 0.0  # FSQ has no commit loss
    assert metrics["codebook_hist"].shape == (64,)


def test_codec_ema_vq_end_to_end():
    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.quantizer = "ema_vq"
    d.codebook_size = 64
    state = init_train_state(jax.random.key(1), cfg)
    embed0 = np.asarray(state.gen_params["quantizer"]["embed"])
    step = jit_train_step(cfg)
    batch = _batch(1)
    s = state
    for _ in range(3):
        s, metrics = step(s, batch)
    assert np.isfinite(float(metrics["gen_loss"]))
    embed1 = np.asarray(s.gen_params["quantizer"]["embed"])
    assert not np.allclose(embed0, embed1)  # EMA updated the codebook
    # EMA state statistics are tracked
    assert float(np.asarray(s.gen_params["quantizer"]["cluster_size"]).sum()) > 0


def test_codec_ema_vq_cosine_end_to_end():
    """vq_cosine_sim: codebook stays on the unit sphere through training."""
    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.quantizer = "ema_vq"
    d.codebook_size = 64
    d.vq_cosine_sim = True
    state = init_train_state(jax.random.key(5), cfg)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.gen_params["quantizer"]["embed"]), axis=-1),
        1.0, rtol=1e-5)
    step = jit_train_step(cfg)
    s, metrics = step(state, _batch(5))
    assert np.isfinite(float(metrics["gen_loss"]))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s.gen_params["quantizer"]["embed"]), axis=-1),
        1.0, rtol=1e-4, atol=1e-4)


def test_codec_ema_vq_step_salted_rng():
    """EMA-VQ randomness is salted by the step counter, not the batch data:
    identical consecutive batches must draw DIFFERENT dead-code expiry
    samples each step (the reference's expiry sampling is fresh per call,
    vector_quantize_pytorch.py:474-484), while the same (step, batch) pair
    stays deterministic."""
    from audiotokenization_tpu.models import codec

    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.quantizer = "ema_vq"
    d.codebook_size = 256  # tiny batch -> most codes starved -> expiry fires
    params = codec.init_codec(jax.random.key(3), cfg)
    batch = _batch(3)
    out_a = codec.forward(params, cfg, batch, training=True, step=0)
    out_a2 = codec.forward(params, cfg, batch, training=True, step=0)
    out_b = codec.forward(params, cfg, batch, training=True, step=1)
    ea = np.asarray(out_a.quantizer_state["embed"])
    np.testing.assert_array_equal(ea, np.asarray(out_a2.quantizer_state["embed"]))
    assert not np.allclose(ea, np.asarray(out_b.quantizer_state["embed"]))
    # integration: the jitted train step threads state.step, so two identical
    # consecutive batches evolve the codebook differently on the expiry slots
    state = init_train_state(jax.random.key(4), cfg)
    step = jit_train_step(cfg)
    s1, _ = step(state, batch)
    e1 = np.asarray(s1.gen_params["quantizer"]["embed"])
    s2, _ = step(s1, batch)
    e2 = np.asarray(s2.gen_params["quantizer"]["embed"])
    # the expiry-resampled rows come from rng-chosen batch vectors; with a
    # step-salted rng they differ between the two steps
    assert not np.allclose(e1, e2)


def test_codec_lfq_end_to_end():
    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.quantizer = "lfq"
    d.in_channels = 8          # 8 bits -> 256 codes
    d.codebook_size = 256
    cfg.model.codec_encoder.out_channels = 8
    d.upsample_initial_channel = 16
    state = init_train_state(jax.random.key(2), cfg)
    state1, metrics = jit_train_step(cfg)(state, _batch(2))
    assert np.isfinite(float(metrics["gen_loss"]))
    assert metrics["codebook_hist"].shape == (256,)
