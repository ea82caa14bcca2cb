"""Weight-norm folding: folded params must reproduce the same outputs/tokens."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.ops.conv import fold_weight_norm

from test_train_step import tiny_config
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_folded_params_identical_tokens_and_audio():
    cfg = tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    folded = fold_weight_norm(params)
    # every (v, g) pair became a plain w
    leaves = jax.tree_util.tree_flatten_with_path(folded)[0]
    assert not any("'v'" in str(p) or "'g'" in str(p) for p, _ in leaves)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(2, 800) * 0.1).astype(np.float32))
    tok_a = np.asarray(C.tokenize(params, cfg, wav))
    tok_b = np.asarray(C.tokenize(folded, cfg, wav))
    np.testing.assert_array_equal(tok_a, tok_b)
    out_a = C.forward(params, cfg, {"wav": wav})
    out_b = C.forward(folded, cfg, {"wav": wav})
    np.testing.assert_allclose(np.asarray(out_a.gen_wav), np.asarray(out_b.gen_wav),
                               rtol=1e-5, atol=1e-6)
