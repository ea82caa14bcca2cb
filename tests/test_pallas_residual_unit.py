"""Fused ResidualUnit Pallas kernel vs the XLA oracle (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models.bigcodec import _AA, residual_unit
from audiotokenization_tpu.ops.conv import init_wn_conv1d
from audiotokenization_tpu.ops.pallas.residual_unit_kernel import (
    fusable, fused_residual_unit)
from audiotokenization_tpu.ops.snake import init_snake_beta


def _params(key, C):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "snake1": init_snake_beta(C),
        "conv1": init_wn_conv1d(k1, C, C, 7, torch_default=True),
        "snake2": init_snake_beta(C),
        "conv2": init_wn_conv1d(k2, C, C, 1, torch_default=True),
    }
    # non-trivial snake params
    p["snake1"]["alpha"] = 0.1 * jax.random.normal(k3, (C,))
    p["snake1"]["beta"] = 0.1 * jax.random.normal(jax.random.fold_in(k3, 1), (C,))
    p["snake2"]["alpha"] = 0.1 * jax.random.normal(jax.random.fold_in(k3, 2), (C,))
    p["snake2"]["beta"] = 0.1 * jax.random.normal(jax.random.fold_in(k3, 3), (C,))
    return p


@pytest.mark.parametrize("C,T,dilation", [
    (128, 512, 1),
    (128, 700, 3),   # non-multiple of TILE_T exercises tail masking
    (256, 1024, 9),
])
@pytest.mark.parametrize("version", [1, 2, 3, 4, 5])
def test_fused_unit_matches_oracle(C, T, dilation, version):
    params = _params(jax.random.key(0), C)
    x = jax.random.normal(jax.random.key(1), (2, C, T), jnp.float32)
    aa = _AA(antialias=False)
    oracle = residual_unit(x, params, dilation=dilation, causal=False, aa=aa)
    fused = fused_residual_unit(x, params, dilation=dilation, interpret=True,
                                version=version)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_fusable_predicate():
    p = _params(jax.random.key(0), 128)
    x = jnp.zeros((1, 128, 64))
    assert fusable(p, x)
    p768 = _params(jax.random.key(0), 768)
    assert not fusable(p768, jnp.zeros((1, 768, 64)))
