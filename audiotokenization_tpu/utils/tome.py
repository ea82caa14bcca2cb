"""Adjacent token merging (ToMe-style) for latent/token streams.

Reference capability: BigCodec_SSL/tome.py is an empty stub and
test.ipynb contains a 2-cell prototype of `adjacent_chained_merge` — merging
the r most-similar adjacent token pairs with chaining (links (A,B) and (B,C)
collapse into one group (A,B,C)), group-mean pooling, and unmerge info. This
module provides a complete implementation of that capability:

- ``adjacent_chained_merge``: cosine-similarity over adjacent pairs, top-r
  links, connected-component grouping (vectorized prefix trick: a token
  starts a new group iff its left link is NOT selected), mean-pool per group.
- ``unmerge``: scatter groups back to the original length.

Variable group counts are padded to the worst case (N - r groups would be
exact without chaining; chaining can only reduce the count), with a validity
mask — keeping shapes static for jit.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MergeInfo(NamedTuple):
    group_of: jnp.ndarray   # (B, N) int32: group index per original token
    n_groups: jnp.ndarray   # (B,) int32
    mask: jnp.ndarray       # (B, G) bool: valid groups


def adjacent_chained_merge(x, r: int) -> Tuple[jnp.ndarray, MergeInfo]:
    """x: (B, N, C) -> (merged (B, G, C), info). G = N - r (padded; see mask).

    A link i joins tokens i and i+1. After selecting the top-r links by
    adjacent cosine similarity, token j starts a new group iff link j-1 is
    unselected; group ids are the cumulative sum of starts — this reproduces
    the chained connected components of the prototype in one vectorized pass.
    """
    B, N, C = x.shape
    if r <= 0:
        info = MergeInfo(
            group_of=jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N)),
            n_groups=jnp.full((B,), N, jnp.int32),
            mask=jnp.ones((B, N), bool))
        return x, info
    r = min(r, N - 1)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    sim = jnp.sum(xn[:, :-1] * xn[:, 1:], axis=-1)  # (B, N-1)
    _, top_idx = jax.lax.top_k(sim, r)
    selected = jnp.zeros((B, N - 1), bool)
    selected = selected.at[jnp.arange(B)[:, None], top_idx].set(True)

    starts = jnp.concatenate([jnp.ones((B, 1), bool), ~selected], axis=1)  # (B, N)
    group_of = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1  # (B, N)
    n_groups = group_of[:, -1] + 1

    G = N - r  # worst case group count (chaining only reduces it)
    onehot = jax.nn.one_hot(group_of, G, dtype=x.dtype)  # (B, N, G)
    sums = jnp.einsum("bng,bnc->bgc", onehot, x)
    counts = jnp.sum(onehot, axis=1)  # (B, G)
    merged = sums / jnp.maximum(counts[..., None], 1.0)
    mask = counts > 0
    return merged, MergeInfo(group_of=group_of, n_groups=n_groups, mask=mask)


def unmerge(merged, info: MergeInfo) -> jnp.ndarray:
    """(B, G, C) -> (B, N, C): every token takes its group's pooled value."""
    B, N = info.group_of.shape
    return jnp.take_along_axis(merged, info.group_of[..., None], axis=1)
