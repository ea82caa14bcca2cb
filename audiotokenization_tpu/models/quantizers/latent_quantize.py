"""Latent quantization (per-dimension learned levels).

Reference capability: the vendored lucidrains latent_quantization.py
(BigCodec_SSL/vq/vector_quantize_pytorch_lucidrains/latent_quantization.py:28)
— each latent dimension is quantized independently against its own small set
of learned values (levels per dim), with commitment + quantization losses
and an STE. Mixed-radix indices like FSQ, but with *learned* (not fixed)
per-dimension codebooks.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.conv import init_linear, linear


def init_latent_quantize(key, *, levels_per_dim: int, codebook_dim: int,
                         dim: int | None = None):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"values": jax.random.uniform(k1, (codebook_dim, levels_per_dim),
                                      minval=-0.5, maxval=0.5)}
    if dim is not None and dim != codebook_dim:
        p["project_in"] = init_linear(k2, dim, codebook_dim)
        p["project_out"] = init_linear(k3, codebook_dim, dim)
    return p


def latent_quantize_apply(params, z, *, commitment: float = 0.25,
                          quant_weight: float = 1.0, training: bool = False):
    """z: (B, D, T) -> (quantized (B, D, T), indices (B, T), loss (B,))."""
    B, Din, T = z.shape
    zt = jnp.swapaxes(z, 1, 2)  # (B, T, Din)
    x = linear(zt, params["project_in"]) if "project_in" in params else zt
    values = params["values"]  # (d, L)
    d, L = values.shape
    # per-dimension nearest level
    dist = jnp.abs(x[..., None] - values[None, None, :, :])  # (B, T, d, L)
    level_idx = jnp.argmin(dist, axis=-1)  # (B, T, d)
    quant = jnp.take_along_axis(values[None, None], level_idx[..., None], axis=-1)[..., 0]
    if training:
        commit = commitment * jnp.mean(
            jnp.square(x - jax.lax.stop_gradient(quant)), axis=(1, 2))
        qloss = quant_weight * jnp.mean(
            jnp.square(quant - jax.lax.stop_gradient(x)), axis=(1, 2))
        loss = commit + qloss
    else:
        loss = jnp.zeros((B,), z.dtype)
    q = x + jax.lax.stop_gradient(quant - x)  # STE
    basis = jnp.asarray(L ** np.arange(d), jnp.int32)
    indices = jnp.sum(level_idx.astype(jnp.int32) * basis[None, None, :], axis=-1)
    out = linear(q, params["project_out"]) if "project_out" in params else q
    return jnp.swapaxes(out, 1, 2), indices, loss


def residual_vq_with_dropout(apply_fns, x, *, key, dropout_prob: float = 0.5,
                             training: bool = False):
    """Quantize-dropout residual stack (lucidrains residual_vq.py:177-182).

    During training, with probability dropout_prob a random prefix length n
    of quantizers is used (the rest contribute zero), teaching the codec to
    operate at variable bitrates. Inference uses the full stack.
    """
    n_q = len(apply_fns)
    if training and n_q > 1:
        k1, k2 = jax.random.split(key)
        use_dropout = jax.random.bernoulli(k1, dropout_prob)
        n_used = jnp.where(use_dropout,
                           jax.random.randint(k2, (), 1, n_q + 1), n_q)
    else:
        n_used = jnp.asarray(n_q)
    quantized_out = jnp.zeros_like(x)
    residual = x
    all_idx, all_loss = [], []
    for i, fn in enumerate(apply_fns):
        q, idx, loss = fn(residual)
        active = (i < n_used).astype(x.dtype)
        q = q * active
        residual = residual - q
        quantized_out = quantized_out + q
        all_idx.append(idx)
        all_loss.append(jnp.mean(loss) * active)
    return quantized_out, jnp.stack(all_idx), jnp.stack(all_loss), n_used
