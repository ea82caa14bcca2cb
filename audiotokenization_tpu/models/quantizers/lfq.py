"""Lookup-Free Quantization (LFQ / BSQ).

Reference capability: the vendored lucidrains LFQ
(BigCodec_SSL/vq/vector_quantize_pytorch_lucidrains/lookup_free_quantization.py:96+):
codes are the sign bits of each latent dimension (codebook_dim =
log2(codebook_size)), with an entropy auxiliary loss (minimize per-sample
entropy, maximize batch-average entropy over the implicit codebook) and a
commitment loss; the spherical variant (BSQ) L2-normalizes latents and
codes. Batch statistics reduce over the data mesh with psum when
`axis_name` is given (the reference's maybe_distributed_mean, :37-44).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class LFQResult(NamedTuple):
    quantized: jnp.ndarray
    indices: jnp.ndarray
    entropy_aux_loss: jnp.ndarray
    commit_loss: jnp.ndarray


def _bits_to_codes(bits, scale):
    return (bits * 2.0 - 1.0) * scale


def lfq_apply(x, *, codebook_dim: Optional[int] = None, spherical: bool = False,
              entropy_weight: float = 0.1, commit_weight: float = 0.25,
              diversity_gamma: float = 1.0, inv_temperature: float = 100.0,
              training: bool = False, axis_name: Optional[str] = None,
              codebook_scale: float = 1.0) -> LFQResult:
    """x: (B, D, T) with D = codebook_dim (bits). Returns codes in {-scale, scale}.

    codebook_scale shrinks the code magnitude (residual stacking: layer i
    uses 2^-i — lucidrains residual_lfq.py:72-76).
    """
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    scale = codebook_scale
    if spherical:
        scale = codebook_scale / np.sqrt(D)
        flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
    codes = jnp.where(flat > 0, scale, -scale)
    powers = jnp.asarray(2 ** np.arange(D), jnp.int32)
    indices = jnp.sum((flat > 0).astype(jnp.int32) * powers[None, :], axis=1)

    entropy_aux = jnp.zeros(())
    commit = jnp.zeros((B,))
    if training:
        # distances to the 2^D implicit codebook via per-bit decomposition:
        # logits[n, c] = -||x_n - code_c||^2 = 2 x.code - const; use x @ codes^T
        all_codes = _bits_to_codes(
            ((jnp.arange(2 ** D)[:, None] >> jnp.arange(D)[None, :]) & 1).astype(jnp.float32),
            scale)  # (2^D, D)
        logits = 2.0 * inv_temperature * (flat @ all_codes.T)
        probs = jax.nn.softmax(logits, axis=-1)
        per_sample_entropy = jnp.mean(
            -jnp.sum(probs * jax.nn.log_softmax(logits, -1), axis=-1))
        avg_probs = jnp.mean(probs, axis=0)
        if axis_name is not None:
            avg_probs = jax.lax.pmean(avg_probs, axis_name)
        codebook_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-9))
        entropy_aux = entropy_weight * (per_sample_entropy - diversity_gamma * codebook_entropy)
        commit = commit_weight * jnp.mean(
            jnp.square(flat - jax.lax.stop_gradient(codes)).reshape(B, T, D),
            axis=(1, 2))

    q = flat + jax.lax.stop_gradient(codes - flat)
    q = jnp.swapaxes(q.reshape(B, T, D), 1, 2).astype(x.dtype)
    return LFQResult(q, indices.reshape(B, T), entropy_aux, commit)


def lfq_indices_to_codes(indices, *, codebook_dim: int, spherical: bool = False,
                         codebook_scale: float = 1.0):
    scale = codebook_scale / np.sqrt(codebook_dim) if spherical else codebook_scale
    bits = ((indices[..., None] >> jnp.arange(codebook_dim)) & 1).astype(jnp.float32)
    return _bits_to_codes(bits, scale)
