"""Aux blocks (ECA/DropPath/ScaleBias) and chunked long-audio tokenization."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from audiotokenization_tpu.ops.aux_blocks import (drop_path, eca, init_eca,
                                                  scale_bias)


def test_eca_matches_reference_math():
    """ECA (vq/module.py:169-182) golden vs a torch transcription."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 30).astype(np.float32)
    w = rng.randn(1, 1, 5).astype(np.float32)
    xt = torch.from_numpy(x)
    s = xt.mean(2).unsqueeze(1)
    s = torch.nn.functional.conv1d(s, torch.from_numpy(w), padding=2)
    ref = (xt * torch.sigmoid(s.squeeze(1)).unsqueeze(-1)).numpy()
    got = np.asarray(eca(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_drop_path_statistics():
    x = jnp.ones((1000, 4))
    y = drop_path(x, rate=0.3, rng=jax.random.key(0))
    kept = np.asarray(y[:, 0]) > 0
    assert 0.6 < kept.mean() < 0.8
    np.testing.assert_allclose(np.asarray(y)[kept][:, 0], 1 / 0.7, rtol=1e-5)
    # eval mode: identity
    np.testing.assert_array_equal(np.asarray(drop_path(x, rate=0.3, rng=jax.random.key(0), training=False)), np.asarray(x))


def test_scale_bias():
    x = jnp.ones((2, 3, 4))
    out = scale_bias(x, jnp.full((4,), 2.0), jnp.full((4,), -1.0))
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 3, 4)))


def test_chunked_tokenize_matches_full():
    """Interior tokens from chunked tokenization == full-sequence tokens."""
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.utils.chunked import tokenize_chunked

    from test_train_step import tiny_config

    cfg = tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    T = 3000  # hop = 10
    wav = (rng.randn(T) * 0.1).astype(np.float32)
    full = np.asarray(C.tokenize(params, cfg, jnp.asarray(wav)[None]))[:, 0]
    chunked = tokenize_chunked(params, cfg, wav, chunk_seconds=0.05,
                               context_seconds=0.02)
    assert chunked.shape == full.shape
    # interior agreement (edges of each chunk may differ within conv RF)
    agree = (chunked == full).mean()
    assert agree > 0.9, agree
