"""QINCo residual VQ: implicit neural codebooks (Huijben et al., arXiv 2401.14732).

Reference capability: `ResidualVQ(implicit_neural_codebook=True)` in the
vendored lucidrains library (BigCodec_SSL/vq/vector_quantize_pytorch_lucidrains/
residual_vq.py:55-107 MLP, :147-151 learnable-codebook forcing, :344-349 MLP
wiring, and the transformed-codebook distance path in
vector_quantize_pytorch.py:534-571): every residual stage i >= 1 passes its
base codebook through a conditioning MLP `f_i(codebook_entry, condition)`
where the condition is the accumulated quantization of the previous stages —
so each position (b, t) quantizes against its OWN specialized codebook.

TPU-native formulation: the MLP's input concat `cat(condition, code)` through
the first Linear is split into two matmuls whose results broadcast-add into
the (M, N, D) pair tensor directly — the (M, N, 2D) concat is never
materialized, and both matmuls are MXU-shaped ((M,D)x(D,D) and (N,D)x(D,D)).
The residual blocks are elementwise on (M, N, D) and fuse under XLA. Codebooks
are gradient-learned (the reference forces `learnable_codebook=True,
ema_update=False` for QINCo — residual_vq.py:147-151), so params are a plain
pytree with no EMA state.

Memory note: stage distances materialize (chunk, N, D); `chunk_size` bounds it
via lax.map over flattened positions.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class QincoResult(NamedTuple):
    quantized: jnp.ndarray  # (B, D, T)
    indices: jnp.ndarray    # (Nq, B, T)
    loss: jnp.ndarray       # (B,) commit + codebook loss summed over stages


def init_qinco_mlp(key, dim: int, dim_hidden: Optional[int] = None,
                   depth: int = 4):
    """MLP(dim) as residual_vq.py:55-77: proj_in Linear(2*dim -> dim), then
    `depth` residual blocks Linear(dim->hidden) -> SiLU -> Linear(hidden->dim).
    proj_in is stored split: w_cond (condition half) and w_code (code half)."""
    dim_hidden = dim_hidden or dim
    ks = jax.random.split(key, 2 * depth + 1)
    lim_in = (1.0 / (2 * dim)) ** 0.5  # torch Linear default: U(-1/sqrt(fan_in), ...)
    w_in = jax.random.uniform(ks[0], (dim, 2 * dim), minval=-lim_in, maxval=lim_in)
    b_in = jax.random.uniform(jax.random.fold_in(ks[0], 1), (dim,),
                              minval=-lim_in, maxval=lim_in)
    blocks = []
    lim1 = (1.0 / dim) ** 0.5
    lim2 = (1.0 / dim_hidden) ** 0.5
    for i in range(depth):
        k1, k2 = ks[1 + 2 * i], ks[2 + 2 * i]
        blocks.append({
            "w1": jax.random.uniform(k1, (dim_hidden, dim), minval=-lim1, maxval=lim1),
            "b1": jax.random.uniform(jax.random.fold_in(k1, 1), (dim_hidden,),
                                     minval=-lim1, maxval=lim1),
            "w2": jax.random.uniform(k2, (dim, dim_hidden), minval=-lim2, maxval=lim2),
            "b2": jax.random.uniform(jax.random.fold_in(k2, 1), (dim,),
                                     minval=-lim2, maxval=lim2),
        })
    return {"w_cond": w_in[:, :dim], "w_code": w_in[:, dim:], "b_in": b_in,
            "blocks": blocks}


def init_qinco(key, *, num_quantizers: int, codebook_size: int, dim: int,
               dim_hidden: Optional[int] = None, mlp_depth: int = 4):
    """Params: codebooks (Nq, N, D) + one conditioning MLP per stage >= 1."""
    kc, km = jax.random.split(key)
    codebooks = jax.random.normal(kc, (num_quantizers, codebook_size, dim))
    mlps = [init_qinco_mlp(k, dim, dim_hidden, mlp_depth)
            for k in jax.random.split(km, num_quantizers - 1)]
    return {"codebooks": codebooks, "mlps": mlps}


def qinco_mlp_apply(p, codes, condition, *, l2norm_output: bool = False):
    """codes (N, D), condition (M, D) -> per-position codebooks (M, N, D).

    Equivalent to the reference MLP.forward (residual_vq.py:78-107) with the
    concat+Linear fused into a broadcasted sum of two projections."""
    cond_proj = condition @ p["w_cond"].T            # (M, D)
    code_proj = codes @ p["w_code"].T                # (N, D)
    x = cond_proj[:, None, :] + code_proj[None, :, :] + p["b_in"]
    for blk in p["blocks"]:
        h = jax.nn.silu(x @ blk["w1"].T + blk["b1"])
        x = h @ blk["w2"].T + blk["b2"] + x
    if l2norm_output:
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    return x


def _stage(flat, codebook, mlp, cond, *, chunk_size: Optional[int]):
    """One residual stage over flattened positions flat (M, D).

    Returns (q (M, D), idx (M,)). For stage 0 (mlp None) this is plain
    nearest-neighbor VQ; otherwise distances go against the MLP-transformed
    per-position codebook (vector_quantize_pytorch.py:534-546)."""
    if mlp is None:
        dist = (jnp.sum(flat * flat, 1, keepdims=True) - 2 * flat @ codebook.T
                + jnp.sum(codebook * codebook, 1)[None])
        idx = jnp.argmin(dist, axis=1)
        return jnp.take(codebook, idx, axis=0), idx

    def chunk_fn(args):
        f, c = args  # (m, D), (m, D)
        tcb = qinco_mlp_apply(mlp, codebook, c)      # (m, N, D)
        d = jnp.sum(jnp.square(f[:, None, :] - tcb), axis=-1)
        i = jnp.argmin(d, axis=1)
        return jnp.take_along_axis(tcb, i[:, None, None], axis=1)[:, 0, :], i

    M = flat.shape[0]
    if chunk_size is None or M <= chunk_size:
        return chunk_fn((flat, cond))
    assert M % chunk_size == 0, "positions must divide chunk_size"
    q, idx = jax.lax.map(
        chunk_fn, (flat.reshape(-1, chunk_size, flat.shape[1]),
                   cond.reshape(-1, chunk_size, cond.shape[1])))
    return q.reshape(M, -1), idx.reshape(M)


def qinco_apply(params, x, *, commit_weight: float = 0.25,
                training: bool = False,
                chunk_size: Optional[int] = None) -> QincoResult:
    """x: (B, D, T). Residual loop of residual_vq.py:353-394 with the
    stage->MLP conditioning on the running quantized sum."""
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    residual = flat
    quantized_out = jnp.zeros_like(flat)
    all_idx, losses = [], []
    mlps = [None] + list(params["mlps"])
    for i, mlp in enumerate(mlps):
        cb = params["codebooks"][i]
        q, idx = _stage(residual, cb, mlp, quantized_out, chunk_size=chunk_size)
        if training:
            commit = commit_weight * jnp.mean(
                jnp.square(residual - jax.lax.stop_gradient(q)).reshape(B, T, D),
                axis=(1, 2))
            codebook_loss = jnp.mean(
                jnp.square(q - jax.lax.stop_gradient(residual)).reshape(B, T, D),
                axis=(1, 2))
            losses.append(commit + codebook_loss)
        q_ste = residual + jax.lax.stop_gradient(q - residual)
        residual = residual - jax.lax.stop_gradient(q)
        quantized_out = quantized_out + q_ste
        all_idx.append(idx.reshape(B, T))
    loss = sum(losses) if losses else jnp.zeros((B,))
    out = jnp.swapaxes(quantized_out.reshape(B, T, D), 1, 2).astype(x.dtype)
    return QincoResult(out, jnp.stack(all_idx), loss)


def qinco_codes_to_emb(params, indices, *, chunk_size: Optional[int] = None):
    """indices (Nq, B, T) -> (B, D, T): layer-by-layer decode where each
    stage's codebook is re-derived from the running sum
    (residual_vq.py:248-272 implicit-codebook branch)."""
    Nq, B, T = indices.shape
    D = params["codebooks"].shape[-1]
    out = jnp.zeros((B * T, D), jnp.float32)
    mlps = [None] + list(params["mlps"])
    for i, mlp in enumerate(mlps):
        cb = params["codebooks"][i]
        idx = indices[i].reshape(-1)
        if mlp is None:
            out = out + jnp.take(cb, idx, axis=0)
        else:
            def chunk_fn(args):
                c, ii = args
                tcb = qinco_mlp_apply(mlp, cb, c)
                return jnp.take_along_axis(tcb, ii[:, None, None], axis=1)[:, 0, :]

            M = out.shape[0]
            if chunk_size is None or M <= chunk_size:
                out = out + chunk_fn((out, idx))
            else:
                assert M % chunk_size == 0
                add = jax.lax.map(
                    chunk_fn, (out.reshape(-1, chunk_size, D),
                               idx.reshape(-1, chunk_size)))
                out = out + add.reshape(M, D)
    return jnp.swapaxes(out.reshape(B, T, D), 1, 2)
