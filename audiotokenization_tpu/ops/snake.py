"""Snake / SnakeBeta periodic activations.

Reference: BigCodec_SSL/vq/activations.py:9-119. Every Snake in the trained
configs uses `alpha_logscale=True`: parameters are stored in log scale
(initialized to zeros) and exponentiated at forward time.

    snake(x)      = x + (1 / (alpha + 1e-9)) * sin^2(alpha * x)
    snake_beta(x) = x + (1 / (beta  + 1e-9)) * sin^2(alpha * x)

with per-channel alpha/beta broadcast over (B, C, T).

These are purely elementwise — XLA fuses them into neighboring convs. A
Pallas fused variant lives in ops/pallas/snake_kernel.py for the residual-unit
fast path.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def snake(x, alpha, *, logscale: bool = True):
    a = alpha[None, :, None]
    if logscale:
        a = jnp.exp(a)
    s = jnp.sin(x * a)
    return x + (1.0 / (a + _EPS)) * (s * s)


def snake_beta(x, alpha, beta, *, logscale: bool = True):
    a = alpha[None, :, None]
    b = beta[None, :, None]
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    s = jnp.sin(x * a)
    return x + (1.0 / (b + _EPS)) * (s * s)


def init_snake_beta(channels, *, logscale: bool = True):
    """log-scale alphas/betas init to zeros (exp -> 1); linear scale init to ones."""
    init = jnp.zeros if logscale else jnp.ones
    return {"alpha": init((channels,)), "beta": init((channels,))}
