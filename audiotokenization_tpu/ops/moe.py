"""Mixture-of-experts SwiGLU FFN with expert parallelism.

Beyond-reference library capability (the reference's conformer has dense
SwiGLU FFNs only, BigCodec_SSL/vq/module.py:455-470; SURVEY §2.8 records no
expert parallelism anywhere): a GShard/Switch-style MoE layer whose experts
shard over the `'model'` axis of the same 2-D mesh tensor parallelism uses
(parallel/tp.py), completing the dp / fsdp / tp / sp / pp / **ep** matrix.
Like the vendored lucidrains quantizer zoo on the reference side, this ships
as a library primitive (tested, sharding-annotated) rather than a codec
config switch — the flagship models are dense.

Design (TPU/XLA):
  - Fixed expert capacity => static shapes end to end (no sorting, no
    dynamic gather): tokens route via one-hot dispatch/combine einsums, the
    idiom XLA partitions into an all-to-all when the expert axis is sharded.
  - Expert weights are stacked `(E, ...)` tensors; the expert matmuls are
    batched einsums over E — MXU-friendly, and sharding E over `'model'`
    makes each shard compute only its experts (GSPMD inserts the token
    all-to-all + combine reduction automatically from the annotations).
  - Router runs in fp32 (softmax stability under bf16 training).
  - Aux losses follow Switch Transformers: load-balance loss
    `E * sum_e f_e * P_e` and router z-loss.

`moe_ffn` is a drop-in for `ops/transformer.feed_forward` modulo the extra
`(aux_losses, rng)` plumbing; `tp_shard_activations` (parallel/tp.py) is the
trace-time switch that activates the expert shardings, exactly as for TP.
"""
from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .conv import init_linear

_aux_local = threading.local()


@contextlib.contextmanager
def collect_moe_aux():
    """Trace-time collector for MoE router aux losses.

    The conformer layer stack has no aux-return plumbing (layers map x->x),
    so codec.forward opens this context around the model call and every
    `moe_ffn` traced inside appends its aux dict; the summed load-balance /
    router-z losses then join the generator loss (train/step.py). Outside
    the context recording is a no-op (tokenize/serving paths)."""
    prev = getattr(_aux_local, "bucket", None)
    _aux_local.bucket = []
    try:
        yield _aux_local.bucket
    finally:
        _aux_local.bucket = prev


def _record_aux(aux):
    b = getattr(_aux_local, "bucket", None)
    if b is not None:
        b.append(aux)


def init_moe_ffn(key, dim: int, *, n_experts: int, ffn_mult: int = 4):
    """Router + E stacked SwiGLU experts (same hidden rule as the dense FFN:
    transformer.swiglu_hidden_dim)."""
    from .transformer import swiglu_hidden_dim

    hidden = swiglu_hidden_dim(dim, ffn_mult)
    kr, *keys = jax.random.split(key, 1 + 3 * n_experts)
    k1 = keys[:n_experts]
    k2 = keys[n_experts:2 * n_experts]
    k3 = keys[2 * n_experts:]
    return {
        "router": init_linear(kr, dim, n_experts, bias=False),
        "w1": jnp.stack([init_linear(k, dim, hidden, bias=False)["w"] for k in k1]),
        "w2": jnp.stack([init_linear(k, hidden, dim, bias=False)["w"] for k in k2]),
        "w3": jnp.stack([init_linear(k, dim, hidden, bias=False)["w"] for k in k3]),
    }


def _constrain_experts(t):
    """Shard the leading expert axis over 'model' inside a tp_shard_activations
    context (identity otherwise) — the EP analogue of tp.constrain_heads."""
    from ..parallel.tp import _local

    mesh = getattr(_local, "mesh", None)
    if mesh is None or "model" not in mesh.axis_names:
        return t
    spec = [None] * t.ndim
    spec[0] = "model"
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, P(*spec)))


def moe_ffn(x, p, *, top_k: int = 2, capacity_factor: float = 1.25,
            token_mask=None):
    """x: (B, T, d) -> (out (B, T, d), aux) — GShard top-k routing with fixed
    capacity; dropped tokens (over-capacity) pass through the residual only.

    aux = {"load_balance_loss", "router_z_loss", "dropped_frac"}; also
    recorded into any active `collect_moe_aux` context.

    token_mask: optional (B, T) bool — masked (pad) tokens are excluded from
    dispatch (they claim no capacity slots) and from the router statistics;
    used by the ragged eval path. Note: expert capacity is a static function
    of the BATCH token count, so ragged MoE outputs are batch-composition-
    dependent by construction (unlike every dense path, which is per-file
    exact) — an inherent property of capacity-based routing.
    """
    B, T, d = x.shape
    E = p["router"]["w"].shape[0]
    N = B * T
    xt = x.reshape(N, d)
    tmask = None if token_mask is None else token_mask.reshape(N)
    # fp32 router
    logits = jnp.einsum("nd,ed->ne", xt.astype(jnp.float32),
                        p["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # (N, E)

    capacity = max(1, int(capacity_factor * N * top_k / E))
    gates_k, idx_k = jax.lax.top_k(probs, top_k)  # (N, k)

    # position of each (token, choice) within its expert's capacity buffer:
    # one flat one-hot (N*k, E) in choice-major order so earlier tokens and
    # earlier choices claim slots first (GShard's sequential assignment)
    onehot = jax.nn.one_hot(idx_k.T.reshape(-1), E, dtype=jnp.int32)  # (k*N, E)
    if tmask is not None:
        # pad tokens claim no capacity slots
        onehot = onehot * jnp.tile(tmask, top_k)[:, None].astype(jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) - 1  # slot index per (choice, token)
    pos = jnp.sum(pos * onehot, axis=-1).reshape(top_k, N).T  # (N, k)
    keep = pos < capacity
    if tmask is not None:
        keep = keep & tmask[:, None]

    # dispatch (N, E, C) / combine (weighted) tensors
    def one_hot_pos(i):
        return (jax.nn.one_hot(idx_k[:, i], E, dtype=xt.dtype)[:, :, None]
                * jax.nn.one_hot(pos[:, i], capacity, dtype=xt.dtype)[:, None, :]
                * keep[:, i, None, None])

    dispatch = sum(one_hot_pos(i) for i in range(top_k))  # (N, E, C)
    combine = sum(one_hot_pos(i) * gates_k[:, i, None, None].astype(xt.dtype)
                  for i in range(top_k))

    expert_in = jnp.einsum("nec,nd->ecd", dispatch, xt)  # (E, C, d)
    expert_in = _constrain_experts(expert_in)
    w1, w2, w3 = (_constrain_experts(p[k].astype(xt.dtype))
                  for k in ("w1", "w2", "w3"))
    h = jax.nn.silu(jnp.einsum("ecd,ehd->ech", expert_in, w1)) \
        * jnp.einsum("ecd,ehd->ech", expert_in, w3)
    expert_out = jnp.einsum("ech,edh->ecd", h, w2)  # (E, C, d)
    expert_out = _constrain_experts(expert_out)
    out = jnp.einsum("nec,ecd->nd", combine, expert_out).reshape(B, T, d)

    # Switch aux losses (fp32): f_e = fraction of tokens whose TOP-1 choice
    # is e; P_e = mean router prob for e (valid tokens only under a mask)
    top1 = jax.nn.one_hot(idx_k[:, 0], E, dtype=jnp.float32)
    if tmask is None:
        f = jnp.mean(top1, axis=0)
        pmean = jnp.mean(probs, axis=0)
        z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
        dropped = 1.0 - jnp.mean(keep.astype(jnp.float32))
    else:
        w = tmask.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(w), 1.0)
        f = jnp.sum(top1 * w[:, None], axis=0) / n_valid
        pmean = jnp.sum(probs * w[:, None], axis=0) / n_valid
        z = jnp.sum(jax.nn.logsumexp(logits, axis=-1) ** 2 * w) / n_valid
        dropped = 1.0 - (jnp.sum(keep.astype(jnp.float32))
                         / (n_valid * top_k))
    aux = {
        "load_balance_loss": E * jnp.sum(f * pmean),
        "router_z_loss": z,
        "dropped_frac": dropped,
    }
    _record_aux(aux)
    return out, aux


def moe_ffn_dense_reference(x, p, *, top_k: int = 2):
    """Capacity-free oracle: every token reaches all its top-k experts (the
    infinite-capacity limit moe_ffn converges to as capacity_factor grows).
    O(N·E) compute — tests only."""
    B, T, d = x.shape
    xt = x.reshape(-1, d)
    logits = jnp.einsum("nd,ed->ne", xt.astype(jnp.float32),
                        p["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    gates_k, idx_k = jax.lax.top_k(probs, top_k)
    h = jax.nn.silu(jnp.einsum("nd,ehd->neh", xt, p["w1"])) \
        * jnp.einsum("nd,ehd->neh", xt, p["w3"])
    all_out = jnp.einsum("neh,edh->ned", h, p["w2"])  # every expert's answer
    gate_full = jnp.zeros_like(probs)
    for i in range(top_k):
        gate_full = gate_full + jax.nn.one_hot(idx_k[:, i], probs.shape[-1],
                                               dtype=probs.dtype) * gates_k[:, i:i + 1]
    out = jnp.einsum("ned,ne->nd", all_out, gate_full.astype(xt.dtype))
    return out.reshape(B, T, d)
