"""Auxiliary blocks: ECA, DropPath (stochastic depth), ScaleBiasLayer.

Reference: BigCodec_SSL/vq/module.py:169-240. These are not on the trained
configs' main path (SURVEY.md §2.3 marks them unused aux), but they are part
of the component inventory and usable by experiment variants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .conv import conv1d


def eca(x, weight, *, kernel_size: int = 5):
    """Efficient Channel Attention (vq/module.py:169-182).

    x: (B, C, T); weight: (1, 1, k) conv kernel. Channel descriptor = mean
    over time -> 1-D conv across channels -> sigmoid gate.
    """
    s = jnp.mean(x, axis=2)          # (B, C)
    s = s[:, None, :]                # (B, 1, C) conv across channel axis
    pad = (kernel_size - 1) // 2
    s = conv1d(s, weight, padding=pad)
    gate = jax.nn.sigmoid(s[:, 0, :])  # (B, C)
    return x * gate[:, :, None]


def init_eca(key, kernel_size: int = 5):
    from .conv import kaiming_uniform_fan_in

    return {"w": kaiming_uniform_fan_in(key, (1, 1, kernel_size))}


def drop_path(x, *, rate: float, rng, training: bool = True,
              scale_by_keep: bool = True):
    """Stochastic depth per sample (vq/module.py:184-212)."""
    if rate == 0.0 or not training:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if scale_by_keep and keep > 0.0:
        mask = mask / keep
    return x * mask


def scale_bias(x, scale, bias):
    """y = x * scale + bias over the last dim (vq/module.py:214-240)."""
    return x * scale[None, None, :] + bias[None, None, :]


def init_scale_bias(d_model: int, adaptive: bool = True):
    return {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,)),
            "adaptive": adaptive}
