"""GAN discriminators: HiFiGAN multi-period + multi-resolution spectrogram.

Reference: BigCodec_SSL/module/mpd.py:10-139 and module/mstft.py:11-142.

- MPD: one period discriminator per period in (2,3,5,7,11). Input (B, 1, T)
  is reflect-padded to a multiple of p and folded to (B, 1, T/p, p); 5 conv2d
  stages with kernel (5,1), stride (3,3,3,3,1), channels 16->64->256->512->512
  (cap), LeakyReLU(0.1); output conv kernel (2,1). Returns every intermediate
  feature map plus flattened logits (feature-matching needs them all).
- Spec discriminator: per-resolution magnitude STFT (5 resolutions,
  fft 128..2048) -> conv2d pyramid (k5 s2 stem, 3 downsample stages k=2s+1,
  channel x2 capped at 512, LeakyReLU(0.2), two k3 tails).

All convs are weight-normed. Effective init is the torch default (the spec
disc's normal_(0.02) reset lands on the hook-recomputed weight, same
subtlety as the codec convs).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..ops.conv import (get_weight, kaiming_uniform_fan_in, uniform_fan_in_bias,
                        weight_norm_init)
from ..ops.stft import stft_magnitude

_DN2D = ("NCHW", "OIHW", "NCHW")


def conv2d(x, p, *, stride=(1, 1), padding=(0, 0)):
    w = get_weight(p)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DN2D)
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# Multi-period discriminator
# ---------------------------------------------------------------------------

def period_discriminator(params, x, *, period: int,
                         downsample_scales=(3, 3, 3, 3, 1),
                         slope: float = 0.1) -> List[jnp.ndarray]:
    """x: (B, 1, T) -> [5 feature maps, flattened logits] (mpd.py:77-99)."""
    B, C, T = x.shape
    if T % period != 0:
        n_pad = period - (T % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        T += n_pad
    x = x.reshape(B, C, T // period, period)
    outs = []
    for i, scale in enumerate(downsample_scales):
        x = conv2d(x, params["convs"][i], stride=(scale, 1), padding=(2, 0))
        x = _leaky(x, slope)
        outs.append(x)
    x = conv2d(x, params["out"], padding=(1, 0))
    outs.append(x.reshape(B, -1))
    return outs


def mpd_apply(params, x, *, periods=(2, 3, 5, 7, 11)) -> List[List[jnp.ndarray]]:
    return [period_discriminator(params["discs"][i], x, period=p)
            for i, p in enumerate(periods)]


def init_mpd(key, *, periods=(2, 3, 5, 7, 11), channels=16,
             channel_increasing_factor=4, max_downsample_channels=512,
             downsample_scales=(3, 3, 3, 3, 1), kernel_sizes=(5, 3)):
    def init_conv2d_wn(k, cin, cout, ksz):
        kw, kb = jax.random.split(k)
        w = kaiming_uniform_fan_in(kw, (cout, cin) + ksz)
        p = weight_norm_init(w)
        p["b"] = uniform_fan_in_bias(kb, (cout,), cin * ksz[0] * ksz[1])
        return p

    discs = []
    for p_idx in range(len(periods)):
        key, sk = jax.random.split(key)
        in_chs, out_chs = 1, channels
        convs = []
        for scale in downsample_scales:
            sk, k1 = jax.random.split(sk)
            convs.append(init_conv2d_wn(k1, in_chs, out_chs, (kernel_sizes[0], 1)))
            in_chs = out_chs
            out_chs = min(out_chs * channel_increasing_factor, max_downsample_channels)
        sk, k2 = jax.random.split(sk)
        out = init_conv2d_wn(k2, in_chs, 1, (kernel_sizes[1] - 1, 1))
        discs.append({"convs": convs, "out": out})
    return {"discs": discs}


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator
# ---------------------------------------------------------------------------

def _ksize(p):
    return get_weight(p).shape[-1]


def nlayer_spec_discriminator(params, spec, *, downsample_scales=(2, 2, 2)) -> List[jnp.ndarray]:
    """spec: (B, 1, F, T) -> per-layer features + logits (mstft.py:137-142).

    Paddings follow the reference construction (k//2 stem, scale for the
    downsample stages, k//2 tails), with kernel sizes read off the weights.
    """
    outs = []
    k0 = _ksize(params["layers"][0])
    x = conv2d(spec, params["layers"][0], stride=(2, 2), padding=(k0 // 2, k0 // 2))
    x = _leaky(x, 0.2)
    outs.append(x)
    for i, scale in enumerate(downsample_scales):
        x = conv2d(x, params["layers"][1 + i], stride=(scale, scale),
                   padding=(scale, scale))
        x = _leaky(x, 0.2)
        outs.append(x)
    for j, final in ((len(downsample_scales) + 1, False),
                     (len(downsample_scales) + 2, True)):
        kj = _ksize(params["layers"][j])
        x = conv2d(x, params["layers"][j], padding=(kj // 2, kj // 2))
        if not final:
            x = _leaky(x, 0.2)
        outs.append(x)
    return outs


def spec_discriminator_apply(params, x, *, fft_sizes=(128, 256, 512, 1024, 2048),
                             hop_sizes=(32, 64, 128, 256, 512),
                             win_lengths=(128, 256, 512, 1024, 2048),
                             downsample_scales=(2, 2, 2)):
    """x: (B, 1, T) -> list over resolutions of per-layer feature lists."""
    wav = x[:, 0, :]
    results = []
    for i, (nf, hp, wl) in enumerate(zip(fft_sizes, hop_sizes, win_lengths)):
        mag = stft_magnitude(wav, n_fft=nf, hop_length=hp, win_length=wl)  # (B, T', F)
        # STFT runs fp32; match the discriminator's compute dtype afterwards
        mag = mag.astype(get_weight(params["discs"][i]["layers"][0]).dtype)
        spec = jnp.swapaxes(mag, 1, 2)[:, None]  # (B, 1, F, T')
        results.append(nlayer_spec_discriminator(
            params["discs"][i], spec, downsample_scales=downsample_scales))
    return results


def init_spec_discriminator(key, *, n_resolutions=5, channels=32,
                            max_downsample_channels=512,
                            downsample_scales=(2, 2, 2), kernel_sizes=(5, 3)):
    def init_conv2d_wn(k, cin, cout, ksz):
        kw, kb = jax.random.split(k)
        w = kaiming_uniform_fan_in(kw, (cout, cin, ksz, ksz))
        p = weight_norm_init(w)
        p["b"] = uniform_fan_in_bias(kb, (cout,), cin * ksz * ksz)
        return p

    discs = []
    for _ in range(n_resolutions):
        key, sk = jax.random.split(key)
        layers = []
        sk, k0 = jax.random.split(sk)
        layers.append(init_conv2d_wn(k0, 1, channels, kernel_sizes[0]))
        in_chs = channels
        for scale in downsample_scales:
            out_chs = min(in_chs * scale, max_downsample_channels)
            sk, k1 = jax.random.split(sk)
            layers.append(init_conv2d_wn(k1, in_chs, out_chs, scale * 2 + 1))
            in_chs = out_chs
        out_chs = min(in_chs * 2, max_downsample_channels)
        sk, k2, k3 = jax.random.split(sk, 3)
        layers.append(init_conv2d_wn(k2, in_chs, out_chs, kernel_sizes[1]))
        layers.append(init_conv2d_wn(k3, out_chs, 1, kernel_sizes[1]))
        discs.append({"layers": layers})
    return {"discs": discs}
