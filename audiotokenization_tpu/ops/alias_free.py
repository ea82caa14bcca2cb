"""Anti-aliased activation machinery (alias-free-torch equivalent).

Reference: BigCodec_SSL/vq/alias_free_torch/{filter,resample,act}.py — a
Kaiser-windowed sinc low-pass filter, 2x upsample via transposed grouped conv,
2x downsample via strided grouped conv with replicate padding, and
``Activation1d`` which sandwiches an activation between them when
``antialias=True`` (plain passthrough otherwise; all default configs ship with
antialias off, cfgs/config11 turns it on).

Filters are precomputed on host (numpy) — they are static buffers.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def kaiser_beta(A: float) -> float:
    if A > 50.0:
        return 0.1102 * (A - 8.7)
    if A >= 21.0:
        return 0.5842 * (A - 21.0) ** 0.4 + 0.07886 * (A - 21.0)
    return 0.0


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int):
    """Windowed-sinc low-pass, normalized to unit DC gain; shape (1, 1, K)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    beta = kaiser_beta(A)
    window = np.kaiser(kernel_size, beta)  # symmetric (periodic=False)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        filt = np.zeros_like(time)
    else:
        filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
        filt = filt / filt.sum()
    return jnp.asarray(filt, jnp.float32).reshape(1, 1, kernel_size)


def upsample1d(x, filt, ratio: int = 2):
    """x: (B, C, T) -> (B, C, ratio*T); replicate-pad + transposed grouped conv."""
    from .conv import conv_transpose1d
    # the filter tables are precomputed fp32 constants; under bf16 mixed-
    # precision training the activations arrive bf16 and lax.conv demands
    # matching dtypes (caught by the r4 antialias soak leg)
    filt = filt.astype(x.dtype)
    C = x.shape[1]
    K = filt.shape[-1]
    stride = ratio
    pad = K // ratio - 1
    pad_left = pad * stride + (K - stride) // 2
    pad_right = pad * stride + (K - stride + 1) // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    w = jnp.broadcast_to(filt, (C, 1, K))
    out = ratio * conv_transpose1d(x, jnp.swapaxes(w, 0, 1).reshape(C, 1, K),
                                   stride=stride, groups=C)
    return out[..., pad_left:-pad_right]


def lowpass1d(x, filt, *, stride: int = 1):
    """Grouped low-pass conv with replicate padding (LowPassFilter1d)."""
    from .conv import conv1d
    filt = filt.astype(x.dtype)  # see upsample1d
    C = x.shape[1]
    K = filt.shape[-1]
    even = K % 2 == 0
    pad_left = K // 2 - int(even)
    pad_right = K // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    w = jnp.broadcast_to(filt, (C, 1, K))
    return conv1d(x, w, stride=stride, groups=C)


def downsample1d(x, filt, ratio: int = 2):
    return lowpass1d(x, filt, stride=ratio)


def make_resample_filters(ratio: int = 2, kernel_size: int | None = None):
    ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    filt = kaiser_sinc_filter1d(cutoff=0.5 / ratio, half_width=0.6 / ratio,
                                kernel_size=ks)
    return filt


def activation1d(x, act_fn, *, antialias: bool = False, up_filter=None,
                 down_filter=None, ratio: int = 2):
    """Activation1d (alias_free_torch/act.py): optionally up->act->down."""
    if not antialias:
        return act_fn(x)
    x = upsample1d(x, up_filter, ratio)
    x = act_fn(x)
    return downsample1d(x, down_filter, ratio)
