"""Factorized vector quantization — the core tokenizer.

Reference: BigCodec_SSL/vq/factorized_vector_quantize.py:10-109 and
vq/residual_vq.py:6-53. The trained configs use a single quantizer
(vq_num_quantizers=1) with codebook (8192, 8) and weight-normed 1024<->8
projections.

Numerics the token-parity gate depends on (SURVEY.md §7 hard parts):

- distances are computed on **L2-normalized** projected latents and codebook
  (F.normalize eps=1e-12), via the expanded ||e||^2 - 2 e.c + ||c||^2 form,
  in fp32;
- ``indices = argmax(-dist)`` with first-index tie-break (torch.max semantics);
- the embedding **lookup uses the raw (unnormalized) codebook** — the
  normalize is for the argmin only;
- training loss: 0.25 * mse(z_e, sg[z_q]) + mse(z_q, sg[z_e]), each averaged
  per sample over (D, T); eval returns zeros;
- straight-through estimator z_e + sg[z_q - z_e].

The distance+argmin runs through a Pallas kernel on TPU
(ops/pallas/vq_kernel.py) with this XLA expression as the correctness oracle.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ...ops.conv import get_weight, init_linear, linear


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """F.normalize: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def nearest_code_indices(z_e, codebook, *, use_pallas: bool = True):
    """z_e: (B, D, T) fp32 projected latents; codebook: (N, D). Returns (B, T) int32.

    Matches decode_latents (factorized_vector_quantize.py:93-108): normalize
    both, expanded squared-euclidean distance, argmax(-dist).
    """
    B, D, T = z_e.shape
    enc = jnp.swapaxes(z_e, 1, 2).reshape(B * T, D).astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    if use_pallas:
        from ...ops.pallas.vq_kernel import vq_argmin

        idx = vq_argmin(enc, cb)
    else:
        enc_n = l2_normalize(enc)
        cb_n = l2_normalize(cb)
        dist = (
            jnp.sum(enc_n * enc_n, axis=1, keepdims=True)
            - 2.0 * enc_n @ cb_n.T
            + jnp.sum(cb_n * cb_n, axis=1)[None, :]
        )
        idx = jnp.argmax(-dist, axis=1).astype(jnp.int32)
    return idx.reshape(B, T)


def factorized_vq_apply(params, z, *, commitment: float = 0.25,
                        training: bool = False, use_pallas: bool = True):
    """Forward of one FactorizedVectorQuantize layer.

    z: (B, dim, T) -> (z_q (B, dim, T), indices (B, T), commit_loss (B,)).
    """
    B = z.shape[0]
    zt = jnp.swapaxes(z, 1, 2)  # (B, T, dim)
    z_e = linear(zt, params["in_proj"]) if "in_proj" in params else zt
    z_e = jnp.swapaxes(z_e, 1, 2)  # (B, D, T)

    codebook = params["codebook"]
    indices = nearest_code_indices(z_e, codebook, use_pallas=use_pallas)
    z_q = jnp.swapaxes(jnp.take(codebook, indices, axis=0), 1, 2)  # (B, D, T)
    z_q = z_q.astype(z_e.dtype)

    if training:
        sq_commit = jnp.square(z_e - jax.lax.stop_gradient(z_q))
        sq_codebook = jnp.square(z_q - jax.lax.stop_gradient(z_e))
        commit_loss = (commitment * jnp.mean(sq_commit, axis=(1, 2))
                       + jnp.mean(sq_codebook, axis=(1, 2)))
    else:
        commit_loss = jnp.zeros((B,), z.dtype)

    z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
    z_q = jnp.swapaxes(z_q, 1, 2)
    if "out_proj" in params:
        z_q = linear(z_q, params["out_proj"])
    z_q = jnp.swapaxes(z_q, 1, 2)
    return z_q, indices, commit_loss


def residual_vq_apply(params, x, *, num_quantizers: int, commitment: float = 0.25,
                      training: bool = False, use_pallas: bool = True,
                      shared_codebook: bool = False):
    """ResidualVQ over FactorizedVQ layers (vq/residual_vq.py:21-40).

    Returns (quantized_out (B, dim, T), all_indices (Nq, B, T), all_losses (Nq,)).
    shared_codebook=True applies layer 0's parameters at every level (the
    lucidrains residual_vq.py:153-157 shared-codebook option).
    """
    quantized_out = jnp.zeros_like(x)
    residual = x
    all_indices = []
    all_losses = []
    for q in range(num_quantizers):
        layer = params["layers"][0 if shared_codebook else q]
        quantized, indices, loss = factorized_vq_apply(
            layer, residual, commitment=commitment, training=training,
            use_pallas=use_pallas)
        residual = residual - quantized
        quantized_out = quantized_out + quantized
        all_indices.append(indices)
        all_losses.append(jnp.mean(loss))
    return quantized_out, jnp.stack(all_indices), jnp.stack(all_losses)


def residual_vq_codes_to_emb(params, codes, *, proj: bool = True):
    """codes: (B, T, Nq) int -> summed embeddings (B, T, dim) (residual_vq.py:42-48)."""
    out = 0.0
    for q, layer in enumerate(params["layers"]):
        emb = jnp.take(layer["codebook"], codes[:, :, q], axis=0)
        if proj and "out_proj" in layer:
            emb = linear(emb, layer["out_proj"])
        out = out + emb
    return out


def init_factorized_vq(key, *, dim: int, codebook_size: int, codebook_dim: int):
    """Init one FactorizedVQ layer. Codebook: nn.Embedding default init N(0, 1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p: dict[str, Any] = {}
    if dim != codebook_dim:
        p["in_proj"] = init_linear(k1, dim, codebook_dim, weight_normed=True)
        p["out_proj"] = init_linear(k2, codebook_dim, dim, weight_normed=True)
    p["codebook"] = jax.random.normal(k3, (codebook_size, codebook_dim))
    return p


def init_residual_vq(key, *, num_quantizers: int, dim: int, codebook_size,
                     codebook_dim: int):
    if isinstance(codebook_size, int):
        codebook_size = [codebook_size] * num_quantizers
    keys = jax.random.split(key, num_quantizers)
    return {"layers": [
        init_factorized_vq(k, dim=dim, codebook_size=s, codebook_dim=codebook_dim)
        for k, s in zip(keys, codebook_size)
    ]}
