"""EMA-codebook vector quantizer (VectorQuantize equivalent).

Reference capability: the vendored lucidrains `VectorQuantize` with
`EuclideanCodebook` (BigCodec_SSL/vq/vector_quantize_pytorch_lucidrains/
vector_quantize_pytorch.py:288-594, 808+): EMA cluster-size/embed-sum
updates, kmeans init, dead-code expiry, commitment loss, and NCCL all-reduce
of the EMA statistics under DDP (:574-583).

TPU-native design: the codebook is *state*, not a gradient parameter — the
apply function returns the updated state, and all EMA statistics are reduced
with `jax.lax.psum` over the data-mesh axis when `axis_name` is given (the
direct equivalent of the reference's distributed all_reduce path,
SURVEY.md §2.8). Dead-code expiry resamples batch vectors deterministically
from a folded PRNG key.

State tree: {"embed": (N, D), "embed_avg": (N, D), "cluster_size": (N,),
"initted": ()} — kmeans-on-first-batch when initted == 0.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmaVQResult(NamedTuple):
    quantized: jnp.ndarray
    indices: jnp.ndarray
    loss: jnp.ndarray
    state: Dict[str, Any]


def init_ema_vq(key, *, codebook_size: int, dim: int, kmeans_init: bool = False):
    embed = jax.random.normal(key, (codebook_size, dim))
    if kmeans_init:
        embed = jnp.zeros((codebook_size, dim))
    return {
        "embed": embed,
        "embed_avg": embed.copy(),
        "cluster_size": jnp.zeros((codebook_size,)),
        "initted": jnp.asarray(0.0 if kmeans_init else 1.0),
    }


def _kmeans(key, data, n_clusters: int, iters: int = 10):
    """Simple kmeans over (M, D) data. Always returns (n_clusters, D): when
    the batch has fewer vectors than clusters, seeds repeat (with-replacement
    sampling keeps the shape static — required because lax.cond traces this
    branch even when kmeans init is disabled)."""
    M = data.shape[0]
    idx = jax.random.randint(key, (n_clusters,), 0, M)
    means = data[idx]

    def step(means, _):
        d = (jnp.sum(data * data, 1, keepdims=True) - 2 * data @ means.T
             + jnp.sum(means * means, 1)[None])
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=data.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ data
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), means)
        return new, None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    return means


def ema_vq_apply(state, x, *, decay: float = 0.8, commitment: float = 1.0,
                 eps: float = 1e-5, threshold_ema_dead_code: float = 2.0,
                 training: bool = False, axis_name: Optional[str] = None,
                 rng: Optional[jax.Array] = None) -> EmaVQResult:
    """x: (B, D, T). Returns quantized (B, D, T), indices (B, T), loss (B,), state."""
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)

    def maybe_psum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    # kmeans init on first training batch (distributed: init from local then sync
    # implicitly since all replicas compute over psum-reduced stats thereafter)
    if training:
        def do_init(s):
            key = rng if rng is not None else jax.random.key(0)
            means = _kmeans(key, flat, s["embed"].shape[0])
            return {**s, "embed": means, "embed_avg": means,
                    "cluster_size": jnp.zeros_like(s["cluster_size"]),
                    "initted": jnp.asarray(1.0)}

        state = jax.lax.cond(state["initted"] > 0, lambda s: s, do_init, state)

    embed = state["embed"]
    dist = (jnp.sum(flat * flat, 1, keepdims=True) - 2 * flat @ embed.T
            + jnp.sum(embed * embed, 1)[None])
    indices = jnp.argmin(dist, axis=1)
    quantized = jnp.take(embed, indices, axis=0)

    new_state = state
    if training:
        onehot = jax.nn.one_hot(indices, embed.shape[0], dtype=jnp.float32)
        counts = maybe_psum(onehot.sum(0))
        sums = maybe_psum(onehot.T @ flat)
        cluster_size = state["cluster_size"] * decay + counts * (1 - decay)
        embed_avg = state["embed_avg"] * decay + sums * (1 - decay)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + eps) / (n + embed.shape[0] * eps) * n
        new_embed = embed_avg / jnp.maximum(smoothed[:, None], 1e-12)
        # dead-code expiry: resample batch vectors for starved codes
        if threshold_ema_dead_code > 0 and rng is not None:
            dead = cluster_size < threshold_ema_dead_code
            samp_idx = jax.random.randint(jax.random.fold_in(rng, 1),
                                          (embed.shape[0],), 0, flat.shape[0])
            samples = flat[samp_idx]
            new_embed = jnp.where(dead[:, None], samples, new_embed)
            embed_avg = jnp.where(dead[:, None], samples, embed_avg)
            cluster_size = jnp.where(dead, threshold_ema_dead_code, cluster_size)
        new_state = {**state, "embed": new_embed, "embed_avg": embed_avg,
                     "cluster_size": cluster_size}

    commit = commitment * jnp.mean(
        jnp.square(flat.reshape(B, T, D) - jax.lax.stop_gradient(quantized.reshape(B, T, D))),
        axis=(1, 2))
    q = flat + jax.lax.stop_gradient(quantized - flat)  # STE
    q = jnp.swapaxes(q.reshape(B, T, D), 1, 2).astype(x.dtype)
    return EmaVQResult(q, indices.reshape(B, T), commit, new_state)
