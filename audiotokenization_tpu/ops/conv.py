"""1-D convolution primitives with PyTorch-parity semantics, TPU-first layout.

The reference codec is built almost entirely from ``torch.nn.Conv1d`` /
``nn.ConvTranspose1d`` wrapped in weight normalization
(reference: BigCodec_SSL/vq/module.py:11-72). Here we provide the same
*mathematical* operations as pure functions over explicit parameter pytrees:

- ``conv1d``: cross-correlation (torch semantics), arbitrary stride/dilation/
  groups, symmetric or explicit padding.
- ``conv_transpose1d``: exact ``nn.ConvTranspose1d`` semantics, including
  ``output_padding``, implemented as an input-dilated convolution with a
  flipped kernel so that XLA maps it onto the MXU.
- causal variants (reference: vq/module.py:11-57): left-pad
  ``(k - stride) * dilation`` for conv; trim the last ``stride`` samples for
  transpose conv.
- weight normalization (w = g * v / ||v||, norm over all dims but dim 0 —
  torch.nn.utils.weight_norm) kept as an explicit ``{v, g}`` parameterization
  for training fidelity, with a ``fold`` helper for inference.

Layout convention: activations are ``(B, C, T)`` ("NCH"), weights are
``(O, I/groups, K)`` ("OIH") — identical to PyTorch, so checkpoint conversion
is a pure tree rename and XLA still tiles the convs onto the MXU.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = ("NCH", "OIH", "NCH")


def conv1d(x, w, b=None, *, stride: int = 1, padding=0, dilation: int = 1,
           groups: int = 1, precision=None):
    """torch.nn.functional.conv1d equivalent. x: (B, Cin, T), w: (Cout, Cin/groups, K)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = [tuple(padding)]
    if w.shape[-1] == 1 and groups == 1:
        # Pointwise conv as a dot: XLA's TPU conv emitter runs k=1 convs
        # lane-serially (~1.2 TF/s measured at C=48, scripts/
        # profile_train_step.py — they were the largest single cost family
        # of the train step); einsum over the channel dim hits the MXU's
        # matmul path instead (~20x). The activation layout is C-minor, so
        # the contraction is already on lanes. Autodiff then yields dots
        # for the weight/data grads too, with the same win.
        if pad[0] != (0, 0):
            x = jnp.pad(x, ((0, 0), (0, 0), pad[0]))
        if stride != 1:
            x = x[:, :, ::stride]
        out = jnp.einsum("bct,oc->bot", x, w[:, :, 0], precision=precision)
        if b is not None:
            out = out + b[None, :, None]
        return out
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_transpose1d(x, w, b=None, *, stride: int = 1, padding: int = 0,
                     output_padding: int = 0, dilation: int = 1,
                     groups: int = 1, precision=None):
    """torch.nn.functional.conv_transpose1d equivalent.

    x: (B, Cin, T), w: (Cin, Cout/groups, K) — note torch's transposed layout.
    out length = (T - 1) * stride - 2 * padding + dilation * (K - 1) + output_padding + 1.

    Implemented as: dilate input by ``stride`` (lhs_dilation), pad with
    ``dilation*(K-1) - padding`` on the left and
    ``dilation*(K-1) - padding + output_padding`` on the right, and correlate
    with the flipped kernel with in/out channels swapped. This is the exact
    adjoint of ``conv1d`` and compiles to a single MXU-friendly conv.
    """
    if groups != 1:
        cin, cout_g, k = w.shape
        w = w.reshape(groups, cin // groups, cout_g, k)
        w = jnp.flip(w, axis=-1).transpose(0, 2, 1, 3).reshape(groups * cout_g, cin // groups, k)
    else:
        w = jnp.flip(w, axis=-1).transpose(1, 0, 2)
    pad_l = dilation * (w.shape[-1] - 1) - padding
    pad_r = dilation * (w.shape[-1] - 1) - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def causal_conv1d(x, w, b=None, *, stride: int = 1, dilation: int = 1,
                  groups: int = 1, precision=None):
    """Streaming-causal conv: left-pad (K - stride) * dilation, no right pad.

    Mirrors the reference CausalConv1d behavior (vq/module.py:11-48).
    """
    k = w.shape[-1]
    pad = (k - stride) * dilation
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
    return conv1d(x, w, b, stride=stride, padding=0, dilation=dilation,
                  groups=groups, precision=precision)


def causal_conv_transpose1d(x, w, b=None, *, stride: int = 1, precision=None):
    """Causal transpose conv: plain transpose conv then trim last `stride` samples.

    Mirrors the reference CausalConvTranspose1d (vq/module.py:50-57).
    """
    out = conv_transpose1d(x, w, b, stride=stride, padding=0, precision=precision)
    return out[..., :-stride]


# ---------------------------------------------------------------------------
# Weight normalization
# ---------------------------------------------------------------------------

def _norm_except_dim0(v):
    """L2 norm over all dims except dim 0, keepdims (torch _weight_norm, dim=0)."""
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


def weight_norm(v, g):
    """w = g * v / ||v||; g shaped (O, 1, ...) like torch weight_norm's `weight_g`."""
    return v * (g / _norm_except_dim0(v))


def weight_norm_init(w):
    """Split a plain weight into the (v, g) parameterization (torch weight_norm init)."""
    return {"v": w, "g": _norm_except_dim0(w)}


def fold_weight_norm(params):
    """Recursively fold every {v, g} pair in a param tree into a plain weight `w`.

    Equivalent to the reference's `remove_weight_norm` used at inference
    (vq/codec_encoder.py:69-78): after folding, forward passes touch one weight
    tensor per conv instead of two, saving HBM reads.
    """
    if isinstance(params, dict):
        if set(params.keys()) >= {"v", "g"}:
            rest = {k: fold_weight_norm(val) for k, val in params.items() if k not in ("v", "g")}
            return {"w": weight_norm(params["v"], params["g"]), **rest}
        return {k: fold_weight_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(v) for v in params)
    return params


def get_weight(p):
    """Fetch the effective weight from a conv/linear param dict, weight-normed or folded."""
    if "w" in p:
        return p["w"]
    return weight_norm(p["v"], p["g"])


# ---------------------------------------------------------------------------
# Parameter initializers (match the reference init where it matters)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """torch.nn.init.trunc_normal_(std=0.02): N(0, std) truncated to [-2std, 2std].

    Reference applies this to every Conv1d weight (vq/codec_encoder.py:9-12).
    """
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform_fan_in(key, shape, dtype=jnp.float32):
    """torch's default Conv/Linear weight init.

    kaiming_uniform_(a=sqrt(5)): bound = gain * sqrt(3/fan_in) with
    gain = sqrt(2/(1+5)) = sqrt(1/3), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    (Getting this wrong by the sqrt(3) factor compounds ~1000x over the
    codec's conv depth and NaNs training — measured against the reference
    init's activation scale.)
    """
    fan_in = int(np.prod(shape[1:]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fan_in_bias(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_wn_conv1d(key, in_ch, out_ch, k, *, torch_default=False, bias=True,
                   trunc_std=0.02):
    """Init a weight-normed conv1d param dict {v, g, b}.

    The reference builds convs with torch defaults then overwrites weights with
    trunc_normal(0.02) and zeros biases via `reset_parameters`
    (vq/codec_encoder.py:89-90) — note: because weight_norm registers v/g and
    `init_weights` only matches nn.Conv1d instances whose `.weight` is the
    recomputed tensor, the trunc-normal lands on the *recomputed* weight in
    torch; functionally the trained checkpoint carries v/g so init parity only
    matters for from-scratch training.
    """
    kw, kb = jax.random.split(key)
    if torch_default:
        w = kaiming_uniform_fan_in(kw, (out_ch, in_ch, k))
    else:
        w = trunc_normal(kw, (out_ch, in_ch, k), std=trunc_std)
    p = weight_norm_init(w)
    if bias:
        p["b"] = jnp.zeros((out_ch,)) if not torch_default else uniform_fan_in_bias(kb, (out_ch,), in_ch * k)
    return p


def init_conv1d(key, in_ch, out_ch, k, *, bias=True, trunc_std=0.02,
                torch_default=False, groups: int = 1):
    kw, kb = jax.random.split(key)
    shape = (out_ch, in_ch // groups, k)
    if torch_default:
        w = kaiming_uniform_fan_in(kw, shape)
    else:
        w = trunc_normal(kw, shape, std=trunc_std)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,)) if not torch_default else uniform_fan_in_bias(kb, (out_ch,), (in_ch // groups) * k)
    return p


def init_wn_conv_transpose1d(key, in_ch, out_ch, k, *, bias=True):
    """ConvTranspose1d weight layout is (in, out, K); torch default init then WN split."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform_fan_in(kw, (in_ch, out_ch, k))
    p = weight_norm_init(w)
    if bias:
        # fan_in for transpose conv in torch = out_ch * k (uses weight.size(1)*k)
        p["b"] = uniform_fan_in_bias(kb, (out_ch,), out_ch * k)
    return p


def init_linear(key, in_f, out_f, *, bias=True, weight_normed=False):
    kw, kb = jax.random.split(key)
    w = kaiming_uniform_fan_in(kw, (out_f, in_f))
    p = weight_norm_init(w) if weight_normed else {"w": w}
    if bias:
        p["b"] = uniform_fan_in_bias(kb, (out_f,), in_f)
    return p


def linear(x, p, precision=None):
    """torch.nn.functional.linear: x @ w.T + b, weight (out, in). x: (..., in)."""
    w = get_weight(p)
    out = jnp.einsum("...i,oi->...o", x, w, precision=precision)
    if "b" in p:
        out = out + p["b"]
    return out
