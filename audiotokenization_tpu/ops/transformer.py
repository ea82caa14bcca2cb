"""Transformer/Conformer building blocks with reference-parity numerics.

Reference: BigCodec_SSL/vq/module.py:357-547 — fp32 RMSNorm (eps 1e-6),
complex-polar RoPE with fp32 round-trip, fused-qkv attention with qk-rmsnorm,
SwiGLU feed-forward (hidden = 2/3*4d rounded up to 256), GLU conv module with
depthwise k=31 conv, and the pre-norm Conformer layer with a `conv_first`
ordering switch and *plain* residual adds (no 0.5x FFN scaling).

TPU notes: attention uses `jax.nn.dot_product_attention`, which XLA lowers to
a fused flash-style kernel on TPU — the idiomatic equivalent of the optional
flash-attn CUDA path (vq/module.py:409-414). RoPE is expressed with real
rotations (cos/sin) rather than complex arithmetic; bitwise identical math.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .conv import causal_conv1d, conv1d, get_weight, linear


def rms_norm(x, weight=None, *, eps: float = 1e-6):
    """fp32 RMS norm over the last dim, cast back to input dtype (vq/module.py:357-370)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    normed = normed.astype(dtype)
    if weight is not None:
        normed = normed * weight
    return normed


def layer_norm(x, gain, bias, *, eps: float = 1e-5):
    """torch nn.LayerNorm over the last dim (biased variance). Shared by the
    SSL upstream ports (models/w2v_bert.py, models/wavlm.py) so the
    numeric-critical formula lives once."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gain + bias


def precompute_rope(head_dim: int, max_len: int, theta: float = 10000.0):
    """cos/sin tables (max_len, head_dim//2), fp32; matches precompute_freqs_cis."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    ang = np.outer(t, freqs)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def apply_rope(x, cos, sin):
    """x: (B, T, H, D); pairs (x[2i], x[2i+1]) rotated by angle tables (T, D/2).

    Equivalent to the reference's complex multiply (vq/module.py:387-397):
    out[2i] = x[2i] cos - x[2i+1] sin; out[2i+1] = x[2i] sin + x[2i+1] cos.
    Computed in fp32 and cast back, as the reference does.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_even = x_even * c - x_odd * s
    out_odd = x_even * s + x_odd * c
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def _frame_mask(valid, T):
    """(B,) per-sample valid frame counts -> (B, T) bool keep-mask."""
    return jnp.arange(T)[None, :] < jnp.asarray(valid)[:, None]


def self_attention(x, p, cos, sin, *, n_head: int, causal: bool = False,
                   deterministic: bool = True, dropout: float = 0.0, rng=None,
                   valid=None):
    """Fused-qkv attention with qk-rmsnorm + RoPE (vq/module.py:399-453).

    x: (B, C, T) -> (B, C, T). p: {qkv: {w}, out: {w}}.

    valid: optional (B,) per-sample frame counts for ragged batches — pad
    keys are masked out of the softmax so each sample's attention equals
    processing its own exact length alone (utils/ragged.py conformer path).
    Outputs at pad QUERY positions are meaningless (softmax over the same
    valid keys); callers re-mask them before any cross-frame op.
    """
    B, C, T = x.shape
    xt = jnp.swapaxes(x, 1, 2)  # (B, T, C)
    # Tensor parallelism: inside a parallel.tp.tp_shard_activations context,
    # the qkv projection is computed against a head-block-permuted weight
    # view sharded over 'model' (head-local output, no per-layer reshard)
    # and head tensors are constrained to shard over 'model'; both are the
    # identity otherwise.
    from ..parallel.tp import constrain_heads, tp_qkv_heads

    qkv = tp_qkv_heads(xt, p["qkv"], n_head)  # (B, T, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = rms_norm(q)
    k = rms_norm(k)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    q, k, v = constrain_heads(q), constrain_heads(k), constrain_heads(v)
    mask = (None if valid is None
            else _frame_mask(valid, T)[:, None, None, :])  # (B, 1, 1, Tk)
    out = jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=causal)
    if not deterministic and dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    out = out.reshape(B, T, C)
    out = linear(out, p["out"])
    return jnp.swapaxes(out, 1, 2)


def swiglu_hidden_dim(dim: int, mult: int = 4) -> int:
    hidden = int(2 * (dim * mult) / 3)
    multiple = 256
    return multiple * ((hidden + multiple - 1) // multiple)


def feed_forward(x, p):
    """SwiGLU FFN: w2(silu(w1 x) * w3 x) (vq/module.py:455-470). x: (B, T, C)."""
    return linear(jax.nn.silu(linear(x, p["w1"])) * linear(x, p["w3"]), p["w2"])


def conformer_conv_module(x, p, *, causal: bool = False, valid=None):
    """1x1 -> GLU -> depthwise k conv -> RMSNorm -> SiLU -> 1x1 (vq/module.py:472-494).

    x: (B, C, T) -> (B, C, T).

    valid: optional (B,) frame counts — pad frames are zeroed between the
    GLU and the depthwise conv (pw1's bias makes them nonzero even for a
    zeroed input), so the k-wide conv reads exactly the per-file zero
    padding at each sample's true edge (ragged exactness).
    """
    out = conv1d(x, get_weight(p["pw1"]), p["pw1"].get("b"))  # (B, 2C, T)
    a, b = jnp.split(out, 2, axis=1)
    out = a * jax.nn.sigmoid(b)  # GLU over channel dim
    if valid is not None:
        out = out * _frame_mask(valid, out.shape[-1])[:, None, :].astype(out.dtype)
    dw = get_weight(p["dw"])
    k = dw.shape[-1]
    groups = dw.shape[0]
    if causal:
        out = causal_conv1d(out, dw, p["dw"].get("b"), groups=groups)
    else:
        # torch padding='same' for odd k
        out = conv1d(out, dw, p["dw"].get("b"), padding=(k - 1) // 2, groups=groups)
    out = jnp.swapaxes(rms_norm(jnp.swapaxes(out, 1, 2), p["norm"]), 1, 2)
    out = jax.nn.silu(out)
    out = conv1d(out, get_weight(p["pw2"]), p["pw2"].get("b"))
    return out


def conformer_layer(x, p, cos, sin, *, n_head: int, conv_first: bool = False,
                    causal: bool = False, valid=None,
                    moe_args: Sequence = (2, 1.25)):
    """Pre-norm residual {conv|attn, ffn1, attn|conv, ffn2} (vq/module.py:496-526).

    Plain residual adds — the reference deliberately has no half-step FFN
    scaling. x: (B, C, T). valid: optional (B,) ragged frame counts
    (masked attention keys + conv-module edge zeroing; per-frame ops need
    no masking). FFN params containing a "router" key run as a GShard MoE
    (ops/moe.py, ffn_type: moe) with (top_k, capacity_factor) = moe_args;
    dense SwiGLU otherwise.
    """
    def norm_t(x, w):
        return jnp.swapaxes(rms_norm(jnp.swapaxes(x, 1, 2), w), 1, 2)

    def attn(x):
        return x + self_attention(norm_t(x, p["attn_norm"]), p["attn"], cos, sin,
                                  n_head=n_head, causal=causal, valid=valid)

    def conv(x):
        return x + conformer_conv_module(norm_t(x, p["conv_norm"]), p["conv"],
                                         causal=causal, valid=valid)

    def ffn(x, fp, w):
        y = rms_norm(jnp.swapaxes(x, 1, 2), w)
        if "router" in fp:
            from .moe import moe_ffn

            tm = (None if valid is None
                  else _frame_mask(valid, y.shape[1]))  # (B, T)
            out, _ = moe_ffn(y, fp, top_k=int(moe_args[0]),
                             capacity_factor=float(moe_args[1]),
                             token_mask=tm)
        else:
            out = feed_forward(y, fp)
        return x + jnp.swapaxes(out, 1, 2)

    if conv_first:
        x = conv(x)
    else:
        x = attn(x)
    x = ffn(x, p["ffn1"], p["ffn1_norm"])
    if conv_first:
        x = attn(x)
    else:
        x = conv(x)
    x = ffn(x, p["ffn2"], p["ffn2_norm"])
    return x


def conformer_backbone(x, p, *, n_head: int, rope_theta: float = 10000.0,
                       max_seq_len: int = 8192, conv_first: bool = False,
                       causal: bool = False, cos_sin=None, remat: bool = False,
                       valid=None, moe_args: Sequence = (2, 1.25)):
    """Stack of conformer layers with a shared sliced RoPE table (vq/module.py:528-547).

    remat=True checkpoints each layer (activation recompute in backward).
    valid: optional (B,) ragged frame counts, threaded to every layer.
    """
    import functools

    B, C, T = x.shape
    if cos_sin is None:
        cos, sin = precompute_rope(C // n_head, max_seq_len, rope_theta)
    else:
        cos, sin = cos_sin
    cos, sin = cos[:T], sin[:T]
    layer_fn = functools.partial(conformer_layer, n_head=n_head,
                                 conv_first=conv_first, causal=causal,
                                 valid=valid, moe_args=tuple(moe_args))
    if remat:
        # MoE aux values recorded inside a jax.checkpoint region would leak
        # its trace (UnexpectedTracerError): make them REAL outputs of the
        # checkpointed function and re-record them outside the boundary
        from .moe import _record_aux, collect_moe_aux

        def layer_with_aux(x, layer_p, cos, sin):
            with collect_moe_aux() as bucket:
                y = layer_fn(x, layer_p, cos, sin)
            return y, list(bucket)

        ckpt_fn = jax.checkpoint(layer_with_aux)
        for layer_p in p["layers"]:
            x, auxes = ckpt_fn(x, layer_p, cos, sin)
            for a in auxes:
                _record_aux(a)
        return x
    for layer_p in p["layers"]:
        x = layer_fn(x, layer_p, cos, sin)
    return x


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_conformer_layer(key, dim: int, *, n_head: int = 8, ffn_mult: int = 4,
                         conv_kernel_size: int = 31, ffn_type: str = "dense",
                         moe_experts: int = 4):
    from .conv import init_conv1d, init_linear
    hidden = swiglu_hidden_dim(dim, ffn_mult)
    keys = jax.random.split(key, 12)

    def ffn_init(k1, k2, k3):
        if ffn_type == "moe":
            from .moe import init_moe_ffn

            return init_moe_ffn(k1, dim, n_experts=moe_experts,
                                ffn_mult=ffn_mult)
        return {"w1": init_linear(k1, dim, hidden, bias=False),
                "w2": init_linear(k2, hidden, dim, bias=False),
                "w3": init_linear(k3, dim, hidden, bias=False)}

    return {
        "ffn1": ffn_init(keys[0], keys[1], keys[2]),
        "ffn2": ffn_init(keys[3], keys[4], keys[5]),
        "attn": {"qkv": init_linear(keys[6], dim, 3 * dim, bias=False),
                 "out": init_linear(keys[7], dim, dim, bias=False)},
        "conv": {"pw1": init_conv1d(keys[8], dim, 2 * dim, 1, torch_default=True),
                 "dw": init_conv1d(keys[9], dim, dim, conv_kernel_size,
                                   torch_default=True, groups=dim),
                 "pw2": init_conv1d(keys[10], dim, dim, 1, torch_default=True),
                 "norm": jnp.ones((dim,))},
        "attn_norm": jnp.ones((dim,)),
        "conv_norm": jnp.ones((dim,)),
        "ffn1_norm": jnp.ones((dim,)),
        "ffn2_norm": jnp.ones((dim,)),
    }


def init_conformer_backbone(key, dim: int, n_layers: int, **kw):
    keys = jax.random.split(key, n_layers)
    return {"layers": [init_conformer_layer(k, dim, **kw) for k in keys]}
