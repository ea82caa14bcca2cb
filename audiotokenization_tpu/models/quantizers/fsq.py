"""Finite Scalar Quantization (FSQ).

Reference: the vendored lucidrains implementation
(BigCodec_SSL/vq/vector_quantize_pytorch_lucidrains/finite_scalar_quantization.py:55-259),
reachable in the codec via ``fsq: True`` (vq/codec_decoder.py:41-47). The
codec instantiates FSQ(levels, channel_first=True, dim=in_channels) with one
codebook: a Linear projects dim -> len(levels), each latent dim is bounded by
a shifted tanh to ~[-(l-1)/2, (l-1)/2], rounded with a straight-through
estimator, renormalized to [-1, 1] by l//2, and projected back. Indices are
the mixed-radix sum over levels. Quantization runs in fp32 regardless of the
surrounding compute dtype (force_quantization_f32).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.conv import init_linear, linear


def _levels_arrays(levels):
    lv = np.asarray(levels, np.int32)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    return jnp.asarray(lv), jnp.asarray(basis)


def _bound(z, lv, eps: float = 1e-3):
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def _round_ste(z):
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


def fsq_quantize_codes(z, levels, *, preserve_symmetry: bool = False,
                       noise_key=None):
    """z: (..., d) fp32 -> normalized codes in [-1, 1] with STE.

    Variants from finite_scalar_quantization.py:123-150:
    - preserve_symmetry: QL(x) = 2/(L-1)·[(L-1)(tanh x + 1)/2 + 0.5] - 1
      (section 3.2 of arXiv 2411.19842);
    - noise_key (training): noise-approximated quantization
      tanh(x) + U(-1,1)/(L-1) instead of the hard bound+round.
    """
    lv, _ = _levels_arrays(levels)
    lv = lv.astype(z.dtype)
    if noise_key is not None:
        noise = jax.random.uniform(noise_key, z.shape, z.dtype, -1.0, 1.0)
        bounded = jnp.tanh(z) + noise / (lv - 1)
    elif preserve_symmetry:
        bounded = (2.0 / (lv - 1)) * ((lv - 1) * (jnp.tanh(z) + 1) / 2.0 + 0.5) - 1.0
    else:
        bounded = _bound(z, lv)
    q = _round_ste(bounded)
    half_width = jnp.asarray(np.asarray(levels, np.int32) // 2, z.dtype)
    return q / half_width


def fsq_codes_to_indices(codes, levels):
    lv, basis = _levels_arrays(levels)
    half_width = (lv // 2).astype(codes.dtype)
    zhat = codes * half_width + half_width
    return jnp.sum(zhat * basis.astype(codes.dtype), axis=-1).astype(jnp.int32)


def fsq_indices_to_codes(indices, levels):
    lv, basis = _levels_arrays(levels)
    lvl_idx = (indices[..., None] // basis) % lv
    half_width = (lv // 2).astype(jnp.float32)
    return (lvl_idx.astype(jnp.float32) - half_width) / half_width


def fsq_implicit_codebook(levels):
    n = int(np.prod(levels))
    return fsq_indices_to_codes(jnp.arange(n), levels)


def fsq_apply(params, z, *, levels, preserve_symmetry: bool = False,
              noise_key=None):
    """Channel-first forward: z (B, dim, T) -> (out (B, dim, T), indices (B, T))."""
    zt = jnp.swapaxes(z, 1, 2)  # (B, T, dim)
    proj = linear(zt, params["project_in"]) if "project_in" in params else zt
    orig_dtype = proj.dtype
    proj32 = proj.astype(jnp.float32)
    codes = fsq_quantize_codes(proj32, levels, preserve_symmetry=preserve_symmetry,
                               noise_key=noise_key)
    indices = fsq_codes_to_indices(codes, levels)
    codes = codes.astype(orig_dtype)
    out = linear(codes, params["project_out"]) if "project_out" in params else codes
    return jnp.swapaxes(out, 1, 2), indices


def fsq_codes_to_emb(indices, *, levels, params=None):
    """indices (B, T) -> project_out(codes) (B, T, dim)."""
    codes = fsq_indices_to_codes(indices, levels)
    if params is not None and "project_out" in params:
        codes = linear(codes, params["project_out"])
    return codes


def init_fsq(key, *, dim: int, levels):
    d = len(levels)
    if dim == d:
        return {}
    k1, k2 = jax.random.split(key)
    return {"project_in": init_linear(k1, dim, d),
            "project_out": init_linear(k2, d, dim)}


def residual_fsq_apply(params, z, *, levels, num_quantizers: int):
    """Residual FSQ with the reference's per-layer scales.

    Reference: lucidrains ResidualFSQ (BigCodec_SSL/vq/
    vector_quantize_pytorch_lucidrains/residual_fsq.py:81-98,202-210):
    layer i quantizes residual / scale_i with scale_i = (levels-1)^-i
    (per-dim), de-scales, subtracts (detached) and accumulates.
    z: (B, dim, T) -> (out (B, dim, T), indices (Nq, B, T)).
    """
    zt = jnp.swapaxes(z, 1, 2)
    proj = linear(zt, params["project_in"]) if "project_in" in params else zt
    orig_dtype = proj.dtype
    residual = proj.astype(jnp.float32)
    lv = np.asarray(levels, np.float64)
    out = jnp.zeros_like(residual)
    idxs = []
    for i in range(num_quantizers):
        scale = jnp.asarray((lv - 1.0) ** -float(i), jnp.float32)
        codes = fsq_quantize_codes(residual / scale, levels)
        q = codes * scale
        idxs.append(fsq_codes_to_indices(codes, levels))
        residual = residual - jax.lax.stop_gradient(q)
        out = out + q
    out = out.astype(orig_dtype)
    if "project_out" in params:
        out = linear(out, params["project_out"])
    return jnp.swapaxes(out, 1, 2), jnp.stack(idxs)


def residual_fsq_codes_to_emb(indices, *, levels, params=None):
    """indices (Nq, B, T) -> summed scaled codes (B, T, dim), projected out."""
    lv = np.asarray(levels, np.float64)
    out = None
    for i in range(indices.shape[0]):
        scale = jnp.asarray((lv - 1.0) ** -float(i), jnp.float32)
        c = fsq_indices_to_codes(indices[i], levels) * scale
        out = c if out is None else out + c
    if params is not None and "project_out" in params:
        out = linear(out, params["project_out"])
    return out
