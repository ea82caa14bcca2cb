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


def _l2norm(t, axis=-1):
    return t / jnp.linalg.norm(t, axis=axis, keepdims=True).clip(1e-12)


def init_ema_vq(key, *, codebook_size: int, dim: int, kmeans_init: bool = False,
                affine_param: bool = False, use_cosine_sim: bool = False):
    embed = jax.random.normal(key, (codebook_size, dim))
    if use_cosine_sim:
        # CosineSimCodebook (vector_quantize_pytorch.py:596-686) keeps the
        # codebook on the unit sphere from init onward
        embed = _l2norm(embed)
    if kmeans_init:
        embed = jnp.zeros((codebook_size, dim))
    # CosineSimCodebook inits cluster_size to ones (vector_quantize_pytorch.py:649)
    # vs EuclideanCodebook's zeros (:321) — affects from-scratch EMA smoothing
    # and dead-code-expiry dynamics
    init_cluster = jnp.ones if use_cosine_sim else jnp.zeros
    state = {
        "embed": embed,
        "embed_avg": embed.copy(),
        "cluster_size": init_cluster((codebook_size,)),
        "initted": jnp.asarray(0.0 if kmeans_init else 1.0),
    }
    if affine_param:
        # affine codebook adaptation (vector_quantize_pytorch.py:414-463):
        # EMA estimates of codebook and batch first/second moments
        state.update({
            "codebook_mean": jnp.zeros((dim,)),
            "codebook_var": jnp.ones((dim,)),
            "batch_mean": jnp.zeros((dim,)),
            "batch_var": jnp.ones((dim,)),
            "affine_initted": jnp.asarray(0.0),
        })
    return state


def _rotate_to(src, tgt):
    """Rotation-trick STE (arXiv 2410.06424; vector_quantize_pytorch.py:240-269):
    transport src onto tgt with a per-vector Householder-pair rotation whose
    parameters are detached — the forward value equals tgt, but gradients
    flow through src as a rotation instead of an identity copy."""
    eps = 1e-12
    ns = jnp.linalg.norm(src, axis=-1, keepdims=True).clip(eps)
    nt = jnp.linalg.norm(tgt, axis=-1, keepdims=True).clip(eps)
    u = src / ns
    q = tgt / nt
    w = u + q
    w = jax.lax.stop_gradient(w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(eps))
    e = src
    rotated = (e - 2.0 * jnp.sum(e * w, -1, keepdims=True) * w
               + 2.0 * jnp.sum(e * jax.lax.stop_gradient(u), -1, keepdims=True)
               * jax.lax.stop_gradient(q))
    return rotated * jax.lax.stop_gradient(nt / ns)


def _kmeans(key, data, n_clusters: int, iters: int = 10,
            use_cosine_sim: bool = False):
    """Simple kmeans over (M, D) data. Always returns (n_clusters, D): when
    the batch has fewer vectors than clusters, seeds repeat (with-replacement
    sampling keeps the shape static — required because lax.cond traces this
    branch even when kmeans init is disabled). use_cosine_sim mirrors the
    reference kmeans flag (vector_quantize_pytorch.py:196-236): assignment by
    cosine similarity and means re-normalized each iteration."""
    M = data.shape[0]
    idx = jax.random.randint(key, (n_clusters,), 0, M)
    means = data[idx]

    def step(means, _):
        if use_cosine_sim:
            assign = jnp.argmax(data @ means.T, axis=1)
        else:
            d = (jnp.sum(data * data, 1, keepdims=True) - 2 * data @ means.T
                 + jnp.sum(means * means, 1)[None])
            assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=data.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ data
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), means)
        if use_cosine_sim:
            new = jnp.where(counts[:, None] > 0, _l2norm(new), new)
        return new, None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    return means


def ema_vq_apply(state, x, *, decay: float = 0.8, commitment: float = 1.0,
                 eps: float = 1e-5, threshold_ema_dead_code: float = 2.0,
                 training: bool = False, axis_name: Optional[str] = None,
                 rng: Optional[jax.Array] = None,
                 sample_codebook_temp: float = 0.0,
                 stochastic_sampling: bool = False,
                 rotation_trick: bool = False,
                 orthogonal_reg_weight: float = 0.0,
                 diversity_weight: float = 0.0,
                 diversity_temperature: float = 100.0,
                 affine_param: bool = False,
                 affine_batch_decay: float = 0.9,
                 affine_codebook_decay: float = 0.99,
                 use_cosine_sim: bool = False,
                 kmeans_init: bool = True) -> EmaVQResult:
    """x: (B, D, T). Returns quantized (B, D, T), indices (B, T), loss (B,), state.

    Optional capabilities mirroring the vendored VectorQuantize:
    - stochastic gumbel sampling of codes at `sample_codebook_temp`
      (gumbel_sample, vector_quantize_pytorch.py:88-112) — training only;
    - rotation-trick straight-through (:240-269) instead of the identity STE;
    - orthogonal codebook regularizer (:279-284; value-only under EMA
      codebooks, which receive no gradients);
    - codebook diversity (negative entropy) loss (:1173-1180) — its gradient
      reaches the encoder through the distances;
    - affine codebook adaptation (:414-463): codebook re-standardized to the
      running batch moments before distance/lookup, with `psum`-reduced batch
      stats when `axis_name` is set (the sync_affine_param path);
    - use_cosine_sim: the CosineSimCodebook variant (:596-686) — inputs
      l2-normalized (transform_input), code selection by cosine similarity,
      EMA means re-normalized onto the unit sphere, cosine kmeans init.
    """
    if use_cosine_sim and affine_param:
        raise ValueError("affine_param is a Euclidean-codebook feature "
                         "(the reference wires it only there)")
    B, D, T = x.shape
    flat = jnp.swapaxes(x, 1, 2).reshape(-1, D).astype(jnp.float32)
    if use_cosine_sim:
        flat = _l2norm(flat)

    def maybe_psum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    # kmeans init on first training batch (distributed: init from local then sync
    # implicitly since all replicas compute over psum-reduced stats thereafter).
    # kmeans_init=False skips the lax.cond STATICALLY: callers whose init
    # path sets initted=1 from the start (the codec's init_ema_vq default)
    # would otherwise trace a dead 10-iteration kmeans branch into every hot
    # step — a pure compile-time/fusion-barrier tax, since the cond never
    # takes that branch at runtime.
    if training and kmeans_init:
        def do_init(s):
            key = rng if rng is not None else jax.random.key(0)
            means = _kmeans(key, flat, s["embed"].shape[0],
                            use_cosine_sim=use_cosine_sim)
            return {**s, "embed": means, "embed_avg": means,
                    "cluster_size": jnp.zeros_like(s["cluster_size"]),
                    "initted": jnp.asarray(1.0)}

        state = jax.lax.cond(state["initted"] > 0, lambda s: s, do_init, state)

    if affine_param and training:
        cb = state["embed"]
        cb_mean = jnp.mean(cb, axis=0)
        cb_var = jnp.var(cb, axis=0)
        n_vec = maybe_psum(jnp.asarray(float(flat.shape[0])))
        b_mean = maybe_psum(jnp.sum(flat, axis=0)) / n_vec
        b_var = maybe_psum(jnp.sum(jnp.square(flat - b_mean), axis=0)) / n_vec

        def upd(old, new, d):
            return jnp.where(state["affine_initted"] > 0, old * d + new * (1 - d), new)

        state = {**state,
                 "codebook_mean": upd(state["codebook_mean"], cb_mean, affine_codebook_decay),
                 "codebook_var": upd(state["codebook_var"], cb_var, affine_codebook_decay),
                 "batch_mean": upd(state["batch_mean"], b_mean, affine_batch_decay),
                 "batch_var": upd(state["batch_var"], b_var, affine_batch_decay),
                 "affine_initted": jnp.asarray(1.0)}

    embed = state["embed"]
    if affine_param:
        cb_std = jnp.sqrt(jnp.clip(state["codebook_var"], 1e-5))
        b_std = jnp.sqrt(jnp.clip(state["batch_var"], 1e-5))
        embed = ((embed - state["codebook_mean"]) * (b_std / cb_std)
                 + state["batch_mean"])
    if use_cosine_sim:
        dist = -(flat @ embed.T)  # negative cosine similarity
    else:
        dist = (jnp.sum(flat * flat, 1, keepdims=True) - 2 * flat @ embed.T
                + jnp.sum(embed * embed, 1)[None])
    if training and stochastic_sampling and sample_codebook_temp > 0 and rng is not None:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(jax.random.fold_in(rng, 7), dist.shape,
                               minval=1e-9, maxval=1.0) + 1e-20))
        indices = jnp.argmax(-dist / sample_codebook_temp + g, axis=1)
    else:
        indices = jnp.argmin(dist, axis=1)
    quantized = jnp.take(embed, indices, axis=0)

    new_state = state
    if training:
        onehot = jax.nn.one_hot(indices, embed.shape[0], dtype=jnp.float32)
        counts = maybe_psum(onehot.sum(0))
        if affine_param:
            # accumulate EMA stats in CODEBOOK coordinates (the reference
            # back-transforms the batch before the embed-sum update)
            flat_cb = ((flat - state["batch_mean"]) * (cb_std / b_std)
                       + state["codebook_mean"])
            sums = maybe_psum(onehot.T @ flat_cb)
        else:
            sums = maybe_psum(onehot.T @ flat)
        cluster_size = state["cluster_size"] * decay + counts * (1 - decay)
        embed_avg = state["embed_avg"] * decay + sums * (1 - decay)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + eps) / (n + embed.shape[0] * eps) * n
        new_embed = embed_avg / jnp.maximum(smoothed[:, None], 1e-12)
        if use_cosine_sim:
            new_embed = _l2norm(new_embed)  # update_ema (:706-712)
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

    loss = commitment * jnp.mean(
        jnp.square(flat.reshape(B, T, D) - jax.lax.stop_gradient(quantized.reshape(B, T, D))),
        axis=(1, 2))
    if training and diversity_weight > 0:
        prob = jax.nn.softmax(-dist * diversity_temperature, axis=-1)
        avg_prob = jnp.mean(prob, axis=0)
        neg_entropy = jnp.sum(avg_prob * jnp.log(jnp.clip(avg_prob, 1e-12)))
        loss = loss + diversity_weight * neg_entropy
    if training and orthogonal_reg_weight > 0:
        normed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True).clip(1e-12)
        cos = normed @ normed.T
        n = embed.shape[0]
        loss = loss + orthogonal_reg_weight * (jnp.sum(cos ** 2) / n ** 2 - 1.0 / n)
    if rotation_trick:
        q = _rotate_to(flat, quantized)
    else:
        q = flat + jax.lax.stop_gradient(quantized - flat)  # STE
    q = jnp.swapaxes(q.reshape(B, T, D), 1, 2).astype(x.dtype)
    return EmaVQResult(q, indices.reshape(B, T), loss, new_state)
