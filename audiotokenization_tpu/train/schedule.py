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


def cosine_decay_with_warmup_schedule(*, total_steps: int = 1000,
                                      warmup_steps: int = 100,
                                      max_lr: float = 1e-3,
                                      min_lr: float = 1e-7):
    """Linear warmup -> cosine decay to min_lr.

    Reference: get_cosine_decay_with_warmup (BigCodec_SSL/inference_full.py:
    406-418) — the offline harness's training-mode schedule.
    """
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = max_lr * step / max(warmup_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(
            jnp.pi * (step - warmup_steps) / max(total_steps - warmup_steps, 1)))
        return jnp.where(step < warmup_steps, warm, min_lr + (max_lr - min_lr) * cos)

    return schedule
