"""Init-scale regression: from-scratch activations must stay O(1).

Guards the torch-default kaiming bound (a sqrt(3) error here compounds
~1000x over the conv depth and NaNs training — found via a TPU soak run).
"""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models.bigcodec import (bigcodec_decode,
                                                   bigcodec_encode,
                                                   init_bigcodec_decoder,
                                                   init_bigcodec_encoder)
import pytest

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def test_encoder_decoder_init_activation_scale():
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(2, 1, 8000) * 0.3).astype(np.float32))
    p = init_bigcodec_encoder(jax.random.key(0), ngf=16, out_channels=256,
                              up_ratios=(2, 2, 5, 5))
    lat = bigcodec_encode(p, x, up_ratios=(2, 2, 5, 5))
    assert float(jnp.std(lat)) < 1.0  # reference init measures ~0.03
    dp = init_bigcodec_decoder(jax.random.key(1), in_channels=256,
                               upsample_initial_channel=256, up_ratios=(5, 5, 2, 2))
    wav = bigcodec_decode(dp, lat, up_ratios=(5, 5, 2, 2))
    assert float(jnp.std(wav)) < 1.0
    assert np.isfinite(np.asarray(wav)).all()


def test_kaiming_bound_matches_torch():
    import torch

    from audiotokenization_tpu.ops.conv import kaiming_uniform_fan_in

    torch.manual_seed(0)
    conv = torch.nn.Conv1d(48, 96, 7)
    t_bound = float(conv.weight.abs().max())
    w = kaiming_uniform_fan_in(jax.random.key(0), (96, 48, 7))
    j_bound = float(jnp.max(jnp.abs(w)))
    # both ~U(-1/sqrt(336), 1/sqrt(336)); maxima within 5%
    assert abs(t_bound - j_bound) / t_bound < 0.05
