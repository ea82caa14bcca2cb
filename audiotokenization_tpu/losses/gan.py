"""LSGAN losses + feature matching.

Reference: BigCodec_SSL/criterions/gan_loss.py:6-17 (least-squares GAN:
disc gets mse(real, 1) + mse(fake, 0), gen gets mse(fake, 1), applied to the
final logits of every sub-discriminator) and the feature-matching sum in
lightning_module.py:352-370 (L1 over every intermediate layer, real side
stop-gradiented).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _mse(x, target):
    x = x.astype(jnp.float32)  # fp32 loss accumulation under bf16 compute
    return jnp.mean(jnp.square(x - target))


def disc_loss(real_outs: Sequence[Sequence[jnp.ndarray]],
              fake_outs: Sequence[Sequence[jnp.ndarray]]):
    """Sum over sub-discriminators of mse(real,1) and mse(fake,0).

    Each element of real_outs/fake_outs is one sub-discriminator's feature
    list; only the last entry (logits) feeds the GAN loss
    (lightning_module.py:294-307).
    """
    real_loss = sum(_mse(r[-1], 1.0) for r in real_outs)
    fake_loss = sum(_mse(f[-1], 0.0) for f in fake_outs)
    return real_loss, fake_loss


def gen_adv_loss(fake_outs: Sequence[Sequence[jnp.ndarray]]):
    """Sum over sub-discriminators of mse(fake, 1) (lightning_module.py:340-348)."""
    return sum(_mse(f[-1], 1.0) for f in fake_outs)


def feature_matching_loss(fake_outs: Sequence[Sequence[jnp.ndarray]],
                          real_outs: Sequence[Sequence[jnp.ndarray]]):
    """L1 over all intermediate layers, real features detached
    (lightning_module.py:352-370). Summed, not averaged, like the reference."""
    loss = 0.0
    for f_list, r_list in zip(fake_outs, real_outs):
        for f, r in zip(f_list[:-1], r_list[:-1]):
            diff = f.astype(jnp.float32) - jax.lax.stop_gradient(r).astype(jnp.float32)
            loss += jnp.mean(jnp.abs(diff))
    return loss
