"""LatentQuantize + quantize-dropout residual tests."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models.quantizers.latent_quantize import (
    init_latent_quantize, latent_quantize_apply, residual_vq_with_dropout)
from audiotokenization_tpu.models.quantizers.misc import init_sim_vq, sim_vq_apply


def test_latent_quantize_roundtrip():
    rng = np.random.RandomState(0)
    p = init_latent_quantize(jax.random.key(0), levels_per_dim=4, codebook_dim=3,
                             dim=16)
    z = jnp.asarray(rng.randn(2, 16, 9).astype(np.float32))
    q, idx, loss = latent_quantize_apply(p, z, training=True)
    assert q.shape == z.shape
    assert idx.shape == (2, 9)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 64).all()
    assert np.isfinite(np.asarray(loss)).all()
    # grads flow to the learned level values
    g = jax.grad(lambda p: jnp.mean(latent_quantize_apply(p, z, training=True)[2]))(p)
    assert float(jnp.sum(jnp.abs(g["values"]))) > 0


def test_quantize_dropout_variable_bitrate():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 7).astype(np.float32))
    ps = [init_sim_vq(jax.random.key(i), codebook_size=16, dim=8) for i in range(3)]
    fns = [lambda v, p=p: sim_vq_apply(p, v, training=True) for p in ps]
    # eval: full stack always
    q, idx, loss, n = residual_vq_with_dropout(fns, x, key=jax.random.key(0),
                                               training=False)
    assert int(n) == 3 and idx.shape == (3, 2, 7)
    # training: some draws use fewer quantizers
    ns = {int(residual_vq_with_dropout(fns, x, key=jax.random.key(k),
                                       training=True, dropout_prob=1.0)[3])
          for k in range(10)}
    assert ns <= {1, 2, 3} and len(ns) > 1
