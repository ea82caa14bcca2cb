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

Cos form (`cos_form()` context): sin^2(ax) == (1 - cos(2ax))/2 — one
transcendental in the forward AND one (sin(2ax)) in the VJP, where the sin^2
form needs sin forward plus sin+cos in the backward. The train-step profile
attributes ~34% of the step to snake fwd+bwd transcendentals (docs/ROADMAP),
so the rewrite targets that directly while staying plain jnp (XLA keeps
fusing it into the neighboring convs — the earlier custom-VJP attempt lost
to fusion barriers). Values differ from the sin^2 form only by fp rounding;
the conformance-pinned tokenize paths never enable it. The flag is read at
TRACE time — wrap the tracing call (first execution), not the hot loop.
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp

_EPS = 1e-9
_COS_FORM = False


@contextlib.contextmanager
def cos_form(enable: bool = True):
    """Trace-time switch to the half-angle cosine form (training only)."""
    global _COS_FORM
    prev = _COS_FORM
    _COS_FORM = enable
    try:
        yield
    finally:
        _COS_FORM = prev


def _sin2(x, a):
    """sin^2(a*x) in the active form."""
    if _COS_FORM:
        return 0.5 - 0.5 * jnp.cos(2.0 * (x * a))
    s = jnp.sin(x * a)
    return s * s


def snake(x, alpha, *, logscale: bool = True):
    a = alpha[None, :, None]
    if logscale:
        a = jnp.exp(a)
    return x + (1.0 / (a + _EPS)) * _sin2(x, a)


def snake_beta(x, alpha, beta, *, logscale: bool = True):
    a = alpha[None, :, None]
    b = beta[None, :, None]
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    return x + (1.0 / (b + _EPS)) * _sin2(x, a)


def init_snake_beta(channels, *, logscale: bool = True):
    """log-scale alphas/betas init to zeros (exp -> 1); linear scale init to ones."""
    init = jnp.zeros if logscale else jnp.ones
    return {"alpha": init((channels,)), "beta": init((channels,))}
