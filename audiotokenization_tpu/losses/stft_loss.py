"""Multi-resolution STFT loss (spectral convergence + log magnitude).

The reference exposes a ``use_stft_loss`` flag whose implementation was never
imported (lightning_module.py:201-206 references an undefined
MultiResolutionSTFTLoss — a latent NameError; all configs ship it off,
SURVEY.md §2.5). We implement the standard Parallel-WaveGAN formulation the
flag clearly intended, so the capability actually works here:

  L = sum_res [ |||S(y)| - |S(y')|||_F / |||S(y)|||_F  +  (1/N) ||log|S(y)| - log|S(y')|||_1 ]
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..ops.stft import stft


def multi_resolution_stft_loss(x, y, *,
                               fft_sizes: Sequence[int] = (128, 256, 512, 1024, 2048),
                               hop_sizes: Sequence[int] = (32, 64, 128, 256, 512),
                               win_lengths: Sequence[int] = (128, 256, 512, 1024, 2048),
                               eps: float = 1e-7):
    """x, y: (B, T) generated/target waveforms -> scalar loss."""
    loss = 0.0
    for nf, hp, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sx = stft(x, n_fft=nf, hop_length=hp, win_length=wl, center=True)
        sy = stft(y, n_fft=nf, hop_length=hp, win_length=wl, center=True)
        mx = jnp.sqrt(jnp.maximum(sx.real ** 2 + sx.imag ** 2, eps))
        my = jnp.sqrt(jnp.maximum(sy.real ** 2 + sy.imag ** 2, eps))
        sc = jnp.linalg.norm(my - mx) / jnp.maximum(jnp.linalg.norm(my), eps)
        mag = jnp.mean(jnp.abs(jnp.log(my) - jnp.log(mx)))
        loss += sc + mag
    return loss
