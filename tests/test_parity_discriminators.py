"""Parity: reference MPD / spec discriminators vs converted JAX versions."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_loader import load_reference_module

from audiotokenization_tpu import convert as CV
from audiotokenization_tpu.models import discriminators as D


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_mpd_parity():
    mpd_mod = load_reference_module("module.mpd")
    torch.manual_seed(0)
    ref = mpd_mod.HiFiGANMultiPeriodDiscriminator(
        periods=[2, 3, 5, 7, 11], max_downsample_channels=512, channels=16,
        channel_increasing_factor=4).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 3200).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    params = CV.convert_mpd(_sd(ref))
    outs = D.mpd_apply(params, jnp.asarray(x))
    assert len(outs) == len(outs_ref) == 5
    for sub, sub_ref in zip(outs, outs_ref):
        assert len(sub) == len(sub_ref) == 6
        for a, b in zip(sub, sub_ref):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-4, atol=1e-5)


def test_spec_discriminator_parity():
    mstft = load_reference_module("module.mstft")
    torch.manual_seed(1)
    stft_params = {
        "fft_sizes": [128, 512], "hop_sizes": [32, 128],
        "win_lengths": [128, 512], "window": "hann_window",
    }
    ref = mstft.SpecDiscriminator(stft_params=stft_params, channels=8,
                                  max_downsample_channels=64).eval()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 3200).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    params = CV.convert_spec_discriminator(_sd(ref), n_resolutions=2)
    outs = D.spec_discriminator_apply(
        params, jnp.asarray(x), fft_sizes=(128, 512), hop_sizes=(32, 128),
        win_lengths=(128, 512))
    assert len(outs) == len(outs_ref) == 2
    for sub, sub_ref in zip(outs, outs_ref):
        assert len(sub) == len(sub_ref) == 6
        for a, b in zip(sub, sub_ref):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)
