"""Quantizer zoo: SimVQ, random-projection (BEST-RQ), residual/grouped combinators.

Reference capability map (SURVEY.md §2.4, vendored lucidrains library):
- SimVQ (sim_vq.py:37): frozen random codebook + learned linear transform,
  with the "rotation" of gradients going through the transform only.
- RandomProjectionQuantizer (random_projection_quantizer.py:11): fully
  frozen — random projection + L2-normalized random codebook; used for
  BEST-RQ-style SSL targets.
- ResidualFSQ / ResidualLFQ / GroupedResidualVQ (residual_*.py): residual
  stacking and channel-grouped application of any base quantizer — here
  expressed as generic combinators over quantizer apply functions.
- NSVQ (beyond the reference; PAPERS.md "Mitigating Codebook Collapse by
  Stabilizing Encoder Drift", arXiv 2606.11363): noise-substitution
  quantization — the straight-through estimator is replaced by
  z + ||z - z_q|| * eps/||eps||, whose gradient reaches BOTH the encoder
  and the codebook (through the error norm) with no commitment loss.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from ...ops.conv import init_linear, linear


# ---------------------------------------------------------------------------
# SimVQ
# ---------------------------------------------------------------------------

def init_sim_vq(key, *, codebook_size: int, dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "frozen_codebook": jax.random.normal(k1, (codebook_size, dim)),
        "transform": init_linear(k2, dim, dim),
    }


def sim_vq_apply(params, x, *, commit_weight: float = 0.25,
                 training: bool = False):
    """x: (B, D, T). Codebook = transform(frozen); learning moves the transform."""
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    codebook = linear(jax.lax.stop_gradient(params["frozen_codebook"]),
                      params["transform"])
    dist = (jnp.sum(flat * flat, 1, keepdims=True)
            - 2 * flat @ codebook.T + jnp.sum(codebook * codebook, 1)[None])
    indices = jnp.argmin(dist, axis=1)
    quantized = jnp.take(codebook, indices, axis=0)
    if training:
        commit = commit_weight * jnp.mean(
            jnp.square(flat - jax.lax.stop_gradient(quantized)).reshape(B, T, D),
            axis=(1, 2))
        codebook_loss = jnp.mean(
            jnp.square(quantized - jax.lax.stop_gradient(flat)).reshape(B, T, D),
            axis=(1, 2))
        loss = commit + codebook_loss
    else:
        loss = jnp.zeros((B,))
    q = flat + jax.lax.stop_gradient(quantized - flat)
    return (jnp.swapaxes(q.reshape(B, T, D), 1, 2).astype(x.dtype),
            indices.reshape(B, T), loss)


# ---------------------------------------------------------------------------
# Random-projection quantizer (BEST-RQ)
# ---------------------------------------------------------------------------

def init_random_projection_quantizer(key, *, dim: int, codebook_dim: int,
                                     codebook_size: int):
    k1, k2 = jax.random.split(key)
    # xavier-normal projection, L2-normalized gaussian codebook (both frozen)
    std = (2.0 / (dim + codebook_dim)) ** 0.5
    proj = std * jax.random.normal(k1, (codebook_dim, dim))
    cb = jax.random.normal(k2, (codebook_size, codebook_dim))
    cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True)
    return {"projection": proj, "codebook": cb}


def random_projection_quantize(params, x):
    """x: (B, D, T) -> indices (B, T); everything frozen (stop_gradient)."""
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    proj = jax.lax.stop_gradient(params["projection"])
    cb = jax.lax.stop_gradient(params["codebook"])
    z = flat @ proj.T
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    dist = -2 * z @ cb.T  # norms constant after normalization
    return jnp.argmin(dist, axis=1).reshape(B, T)


# ---------------------------------------------------------------------------
# Generic residual / grouped combinators
# ---------------------------------------------------------------------------

def residual_quantize(apply_fns: Sequence[Callable], x):
    """Residual-stack any quantizers: each fn maps (B,D,T) -> (q, idx, loss)."""
    quantized_out = jnp.zeros_like(x)
    residual = x
    all_idx, all_loss = [], []
    for fn in apply_fns:
        q, idx, loss = fn(residual)
        residual = residual - q
        quantized_out = quantized_out + q
        all_idx.append(idx)
        all_loss.append(jnp.mean(loss))
    return quantized_out, jnp.stack(all_idx), jnp.stack(all_loss)


def grouped_quantize(apply_fns: Sequence[Callable], x):
    """Split channels into len(apply_fns) groups, quantize each independently."""
    groups = jnp.split(x, len(apply_fns), axis=1)
    outs = [fn(g) for fn, g in zip(apply_fns, groups)]
    q = jnp.concatenate([o[0] for o in outs], axis=1)
    idx = jnp.stack([o[1] for o in outs])
    loss = jnp.stack([jnp.mean(o[2]) for o in outs])
    return q, idx, loss


# ---------------------------------------------------------------------------
# NSVQ (noise-substitution vector quantization)
# ---------------------------------------------------------------------------

def init_nsvq(key, *, codebook_size: int, dim: int):
    return {"codebook": jax.random.normal(key, (codebook_size, dim))}


def nsvq_apply(params, x, *, rng=None, training: bool = False):
    """x: (B, D, T) -> (quantized (B, D, T), indices (B, T), loss (B,)).

    Training: the hard-quantized vector is substituted by
    z + ||z - z_q|| * eps/||eps|| (eps ~ N(0, I)); the substitution is
    differentiable in both z and z_q (via the error norm), so the codebook
    learns from the task loss directly and no commit/codebook loss is
    needed (loss returns zeros). Eval: plain nearest-codebook lookup.
    """
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    cb = params["codebook"]
    dist = (jnp.sum(flat * flat, 1, keepdims=True) - 2 * flat @ cb.T
            + jnp.sum(cb * cb, 1)[None])
    indices = jnp.argmin(dist, axis=1)
    zq = jnp.take(cb, indices, axis=0)
    if training:
        if rng is None:
            raise ValueError("nsvq_apply(training=True) needs rng")
        eps = jax.random.normal(rng, flat.shape, flat.dtype)
        err = jnp.linalg.norm(flat - zq, axis=-1, keepdims=True)
        unit = eps / jnp.linalg.norm(eps, axis=-1, keepdims=True).clip(1e-12)
        out = flat + err * unit
    else:
        out = zq
    out = jnp.swapaxes(out.reshape(B, T, D), 1, 2).astype(x.dtype)
    return out, indices.reshape(B, T), jnp.zeros((B,), jnp.float32)
