"""Tensor parallelism (Megatron-style) for the conformer codec family.

The reference has NO tensor parallelism — its model fits one GPU and the only
training parallelism is DDP (BigCodec_SSL/train.py:34, SURVEY.md §2.8). This
module is the beyond-reference scaling axis for wider conformer variants: a
2-D ``Mesh(('data', 'model'))`` where the batch shards over ``data`` and the
conformer weights shard over ``model``:

  - FFN ``w1``/``w3`` (SwiGLU up-projections, vq/module.py:455-470) are
    **column-parallel**: weight ``(hidden, dim)`` sharded on ``hidden``, no
    communication at the matmul, activations land hidden-sharded;
  - FFN ``w2`` is **row-parallel**: weight ``(dim, hidden)`` sharded on
    ``hidden`` (its contraction axis), each shard produces a partial sum and
    GSPMD inserts ONE ``psum`` over ``model`` back into the replicated
    residual stream — the classic Megatron pattern;
  - attention ``qkv`` (vq/module.py:399-453) is column-parallel on its packed
    output rows, and q/k/v carry an explicit head-sharding constraint
    (``constrain_heads``) so the flash-attention kernel runs head-local; the
    ``out`` projection is row-parallel, closing the block with one ``psum``.

Everything else — conv modules (their interior channel-RMSNorm forces a
gather anyway and they are ~k·C² per frame vs 8·C² for the FFN pair),
norm gains, projections, the quantizer, the whole BigCodec conv family and
the discriminators — stays replicated; for those, FSDP over ``data``
(parallel/mesh.fsdp_state_shardings) is the memory axis and composes with TP
here (`tp_state_shardings(..., fsdp=True)`).

No custom collectives are written: the shardings are declarative and XLA's
SPMD partitioner emits the all-reduces over ICI. Single-chip numerics are
preserved up to reduction order (tests assert token-exact tokenize and
close-to-DP training on the virtual 8-device mesh).
"""
from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_local = threading.local()


def make_dp_tp_mesh(n_model: int, devices=None) -> Mesh:
    """2-D mesh: data-parallel outer axis × model-parallel inner axis.

    The ``model`` axis is innermost so TP collectives ride the fastest ICI
    neighbors; ``data`` gradient all-reduces span the remaining topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices not divisible by tensor_parallel={n_model}")
    arr = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(arr, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Activation constraints (consulted by ops/transformer.self_attention)
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def tp_shard_activations(mesh: Mesh):
    """Trace-time context: inside it, attention head tensors are constrained
    to shard over ``model``. Enter it INSIDE the jitted function so the
    constraint is baked into the traced program (see jit wrappers below)."""
    prev = getattr(_local, "mesh", None)
    _local.mesh = mesh
    try:
        yield
    finally:
        _local.mesh = prev


def tp_qkv_heads(xt, p, n_head: int):
    """Packed-qkv projection returning (B, T, 3, H, D), head-aligned under TP.

    Canonical row order of the (3C, C) weight is [q heads | k heads | v heads]
    (vq/module.py:418-421). Outside a TP context (or when heads don't divide
    the model axis, or the projection carries a bias) this is the plain
    einsum + reshape. Inside one, the rows are regrouped per model-shard as
    [q_s | k_s | v_s] and that VIEW is sharded P('model', None): each shard
    slices its own heads' rows from the replicated stored weight (no
    collective), computes only its rows of the projection, and the output
    reshapes straight into the P('data', None, 'model', None) head sharding
    constrain_heads expects — no per-layer reshard (ADVICE r3 #4).
    """
    import jax.numpy as jnp

    from ..ops.conv import get_weight, linear

    B, T, C = xt.shape
    D = C // n_head
    mesh = getattr(_local, "mesh", None)
    n = (mesh.shape["model"]
         if mesh is not None and "model" in mesh.axis_names else 1)
    if n <= 1 or n_head % n or "b" in p:
        return linear(xt, p).reshape(B, T, 3, n_head, D)
    w = get_weight(p)  # (3C, C): rows (3, H, D) flattened
    wp = (w.reshape(3, n, n_head // n, D, C)
           .transpose(1, 0, 2, 3, 4)
           .reshape(3 * C, C))  # rows (n, 3, H/n, D): shard-major
    wp = jax.lax.with_sharding_constraint(
        wp, NamedSharding(mesh, P("model", None)))
    out = jnp.einsum("btc,oc->bto", xt, wp)
    out = jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", None, "model")))
    # invert the shard-major grouping; heads come back in canonical order
    return (out.reshape(B, T, n, 3, n_head // n, D)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(B, T, 3, n_head, D))


def constrain_heads(x):
    """x: (B, T, H, D) q/k/v — shard H over ``model`` when TP is active.

    Outside a ``tp_shard_activations`` context this is the identity, so the
    single-device and DP paths are untouched.
    """
    mesh = getattr(_local, "mesh", None)
    if mesh is None or "model" not in mesh.axis_names:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", None, "model", None)))


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

def _path_strs(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        elif hasattr(k, "name"):
            out.append(str(k.name))
    return out


def tp_spec_for_path(path) -> P | None:
    """Megatron placement for one leaf path, or None if not a TP leaf.

    Scoped to conformer backbones (path contains ``backbone``) so identically
    named leaves elsewhere (w2v-bert teacher, token-LM) are never touched.
    """
    keys = _path_strs(path)
    if "backbone" not in keys or len(keys) < 3 or keys[-1] != "w":
        return None
    mod, name = keys[-3], keys[-2]
    if mod == "attn":
        if name == "qkv":
            # stored replicated: the packed row order [q|k|v] cannot be
            # contiguously sharded head-aligned (shard 0 would own all of q
            # plus part of k, forcing a reshard per layer — ADVICE r3). The
            # weight is tiny (3C·C); tp_qkv_heads shards a head-block-permuted
            # VIEW at trace time instead, so the projection output lands
            # head-local with zero collectives.
            return None
        return P(None, "model")
    if mod in ("ffn1", "ffn2"):
        if name == "router":
            # MoE router (ops/moe.py): tiny (E, d) weight, stays replicated —
            # every shard needs the full expert distribution for top-k; the
            # EXPERT tensors shard by their leading E axis at trace time
            # (_constrain_experts), not by stored spec (their paths end in
            # the stacked leaf names w1/w2/w3, not .../w, so they fall
            # through to the generic rule)
            return None
        return P("model", None) if name in ("w1", "w3") else P(None, "model")
    return None


def validate_tp(cfg, n_model: int) -> None:
    """Fail fast on indivisible shapes (heads, packed qkv rows, SwiGLU hidden)."""
    from ..ops.transformer import swiglu_hidden_dim

    sides = []
    if cfg.model.codec_encoder.type == "conformer_stft":
        sides.append(("encoder", cfg.model.codec_encoder))
    if cfg.model.codec_decoder.type == "conformer_istft":
        sides.append(("decoder", cfg.model.codec_decoder))
    if not sides:
        raise ValueError(
            "tensor_parallel>1 requires a conformer encoder or decoder; the "
            "BigCodec conv family scales via data/FSDP/sequence parallelism "
            "(parallel/mesh.py, parallel/sp.py)")
    for side, m in sides:
        for what, dim in (("n_head", m.n_head), ("3*dim (packed qkv rows)", 3 * m.dim),
                          ("dim", m.dim),
                          ("swiglu hidden", swiglu_hidden_dim(m.dim, m.ffn_mult))):
            if dim % n_model:
                raise ValueError(
                    f"{side}: {what}={dim} not divisible by tensor_parallel={n_model}")


def tp_shardings(mesh: Mesh, abstract_tree, *, fsdp: bool = False,
                 fsdp_min_size: int = 2 ** 14):
    """Shardings for a param/opt-state pytree: TP specs on conformer
    attention/FFN weights (matched by path suffix, so the rule also lands on
    the optimizer's mirrored ``mu``/``nu`` trees), FSDP over ``data`` for the
    rest when requested, replicated otherwise."""
    from .mesh import fsdp_sharding_for

    def rule(path, leaf):
        spec = tp_spec_for_path(path)
        shape = getattr(leaf, "shape", ())
        if spec is not None:
            n = mesh.shape["model"]
            for dim, ax in zip(shape, spec):
                if ax == "model" and dim % n:
                    raise ValueError(
                        f"TP leaf {'/'.join(_path_strs(path))} shape {shape} "
                        f"not divisible by model={n}")
            return NamedSharding(mesh, spec)
        if fsdp:
            return fsdp_sharding_for(mesh, shape, min_size=fsdp_min_size)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, abstract_tree)


def tp_state_shardings(mesh: Mesh, cfg, *, fsdp: bool = False,
                       fsdp_min_size: int = 2 ** 14):
    """TrainState shardings for the TP train step (train/step.jit_train_step)."""
    from ..train.state import init_train_state

    validate_tp(cfg, mesh.shape["model"])
    abstract = jax.eval_shape(lambda: init_train_state(jax.random.key(0), cfg))
    return tp_shardings(mesh, abstract, fsdp=fsdp, fsdp_min_size=fsdp_min_size)


# ---------------------------------------------------------------------------
# Jitted inference over the TP mesh
# ---------------------------------------------------------------------------

def jit_tp_tokenize(cfg, mesh: Mesh, *, mode: str = "conformant"):
    """Tokenizer jitted over a ('data','model') mesh: batch data-sharded,
    conformer weights model-sharded. Returns fn(params, wav) -> codes.

    Param shardings are derived from the ACTUAL params on first call (not an
    abstract init tree), so both training-layout (v, g) and inference-folded
    (w) checkpoints work.
    """
    from ..models import codec

    validate_tp(cfg, mesh.shape["model"])
    cache: dict = {}

    def fn(params, wav):
        with tp_shard_activations(mesh):
            return codec.tokenize(params, cfg, wav, mode=mode)

    def call(params, wav):
        if "jitted" not in cache:
            cache["p_sh"] = tp_shardings(mesh, params)
            # codes layout is (Nq, B, Tf) — batch is dim 1
            cache["jitted"] = jax.jit(
                fn, in_shardings=(cache["p_sh"], NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P(None, "data")))
        # checkpoint-restored params arrive committed to one device; place
        # them on the mesh explicitly (a no-op copy once resident)
        params = jax.device_put(params, cache["p_sh"])
        return cache["jitted"](params, wav)

    return call
