"""Pallas VQ argmin kernel vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from audiotokenization_tpu.models.quantizers.factorized_vq import nearest_code_indices
from audiotokenization_tpu.ops.pallas.vq_kernel import vq_argmin
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_vq_argmin_matches_oracle():
    rng = np.random.RandomState(0)
    enc = rng.randn(700, 8).astype(np.float32)
    cb = rng.randn(8192, 8).astype(np.float32)
    oracle = np.asarray(nearest_code_indices(jnp.asarray(enc.T)[None], jnp.asarray(cb),
                                             use_pallas=False))[0]
    got = np.asarray(vq_argmin(jnp.asarray(enc), jnp.asarray(cb), interpret=True))
    np.testing.assert_array_equal(got, oracle)


def test_vq_argmin_small_codebook():
    rng = np.random.RandomState(1)
    enc = rng.randn(37, 8).astype(np.float32)
    cb = rng.randn(128, 8).astype(np.float32)
    oracle = np.asarray(nearest_code_indices(jnp.asarray(enc.T)[None], jnp.asarray(cb),
                                             use_pallas=False))[0]
    got = np.asarray(vq_argmin(jnp.asarray(enc), jnp.asarray(cb), interpret=True))
    np.testing.assert_array_equal(got, oracle)


def test_vq_argmin_duplicate_codes_tiebreak():
    """Duplicated codebook rows: ties must resolve to the lowest index."""
    rng = np.random.RandomState(2)
    half = rng.randn(64, 8).astype(np.float32)
    cb = np.concatenate([half, half], axis=0)
    enc = rng.randn(50, 8).astype(np.float32)
    got = np.asarray(vq_argmin(jnp.asarray(enc), jnp.asarray(cb), interpret=True))
    assert (got < 64).all()
