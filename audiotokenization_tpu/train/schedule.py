"""LR schedule: quadratic warmup -> linear decay -> flat floor.

Reference: WarmupLR (BigCodec_SSL/common/schedulers.py:4-15). The torch
version is a LambdaLR whose lambda returns the ABSOLUTE learning rate (the
optimizers are built with base lr=1.0, config/train/default.yaml:38-43); as
an optax schedule the absolute value feeds the optimizer directly.

  step <  warmup:             1e-5 + (max_lr - 1e-5)/warmup^2 * step^2
  warmup <= step < w+down:    linear from max_lr to min_lr
  step >= w+down:             min_lr
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_lr_schedule(*, warmup_step: int = 1000, down_step: int = 500000,
                       max_lr: float = 1e-4, min_lr: float = 1e-5,
                       init_lr: float = 1e-5):
    alpha = (max_lr - init_lr) / max(warmup_step, 1) ** 2
    s1, s2 = warmup_step, warmup_step + down_step

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + alpha * step * step
        lin = (max_lr - min_lr) / (s1 - s2) * step + (min_lr * s1 - max_lr * s2) / (s1 - s2)
        return jnp.where(step < s1, warm, jnp.where(step < s2, lin, min_lr))

    return schedule
