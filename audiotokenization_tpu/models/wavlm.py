"""Native WavLM (microsoft/wavlm) — the s3prl SSL upstream family the
reference's speaker-verification suite taps for layer-weighted features
(BigCodec_SSL/speaker_verification/models/ecapa_tdnn.py:258-273: WavLM /
HuBERT / wav2vec2 / UniSpeech-SAT upstreams; all share this wav2vec2-style
architecture, WavLM adding the gated relative position bias).

Pure-functional JAX port of the published architecture (behavioral spec:
transformers' modeling_wavlm.py, verified by golden parity against the
actual torch module at random init in tests/test_wavlm.py):

  raw wav (B, T)
  -> conv feature encoder (7 conv1d stages, stride 320 total; group-norm
     first layer in 'group' mode, per-layer LayerNorm in 'layer' mode —
     base vs large checkpoints)
  -> feature projection (LayerNorm + Linear)
  -> conv positional embedding (k=128 grouped weight-normed conv, GELU,
     even-kernel trailing trim) added to the stream
  -> N transformer layers with GATED RELATIVE POSITION BIAS: a bucketed
     relative-position bias table (num_buckets=320, max_distance=800,
     T5-style log-spaced buckets) embedded per head in layer 0 and shared
     down the stack; every layer gates it per (head, query) with
     sigmoid projections of its own hidden states
  -> hidden_states list (input of each layer + final), the s3prl surface
     consumed by ssl_weighted_features (models/ecapa_tdnn.py:83-90).

Both norm modes are implemented: post-LN ('group'/base,
do_stable_layer_norm=False) and pre-LN ('layer'/large, stable layer norm
with the trailing encoder LayerNorm).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class WavLMConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = False  # True for wavlm-large
    layer_norm_eps: float = 1e-5


def _layer_norm(x, p, eps):
    from ..ops.transformer import layer_norm

    return layer_norm(x, p["g"], p["b"], eps=eps)


def _conv1d(x, w, b=None, *, stride=1, padding=0, groups=1):
    from ..ops.conv import conv1d

    return conv1d(x, w, b, stride=stride, padding=padding, groups=groups)


def feature_encoder(params, cfg: WavLMConfig, wav):
    """wav (B, T) -> (B, C, T/320). Group-norm mode: channel-wise GroupNorm
    (num_groups == channels) after conv 0 only; layer mode: LayerNorm after
    every conv (channels-last)."""
    x = wav[:, None, :]
    for i, layer in enumerate(params["conv_layers"]):
        x = _conv1d(x, layer["conv"]["w"], layer["conv"].get("b"),
                    stride=cfg.conv_stride[i])
        if "gn" in layer:  # GroupNorm(groups=C): per-channel stats over T
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            x = x * layer["gn"]["g"][None, :, None] + layer["gn"]["b"][None, :, None]
        elif "ln" in layer:
            x = jnp.swapaxes(_layer_norm(jnp.swapaxes(x, 1, 2), layer["ln"],
                                         1e-5), 1, 2)
        x = jax.nn.gelu(x, approximate=False)
    return x


def _pos_conv_embed(params, cfg: WavLMConfig, h):
    """h (B, T, C) -> positional embedding (B, T, C): grouped k=128 conv
    (weight pre-folded from its dim=2 weight norm), pad k//2, trailing
    column trimmed for even kernels, GELU."""
    k = cfg.num_conv_pos_embeddings
    x = jnp.swapaxes(h, 1, 2)
    x = _conv1d(x, params["w"], params.get("b"), padding=k // 2,
                groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        x = x[:, :, :-1]
    return jnp.swapaxes(jax.nn.gelu(x, approximate=False), 1, 2)


def _relative_buckets(rel_pos, *, num_buckets: int, max_distance: int):
    """T5-style signed log-spaced buckets (modeling_wavlm.py:253-275)."""
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(np.int64) * nb
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (max_exact
             + (np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
                / math.log(max_distance / max_exact) * (nb - max_exact))
             ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)


def _position_bias(rel_embed, T, cfg: WavLMConfig):
    """(num_buckets, H) embedding -> (H, T, T) shared bias table."""
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    buckets = _relative_buckets(mem - ctx, num_buckets=cfg.num_buckets,
                                max_distance=cfg.max_bucket_distance)
    values = jnp.take(rel_embed, jnp.asarray(buckets), axis=0)  # (T, T, H)
    return jnp.transpose(values, (2, 0, 1))


def _attention(p, x, pos_bias, cfg: WavLMConfig):
    """Gated-relative-bias attention (modeling_wavlm.py:147-233).

    x: (B, T, C); pos_bias: (H, T, T) ungated shared table.
    """
    from ..ops.conv import linear

    B, T, C = x.shape
    H = cfg.num_attention_heads
    D = C // H
    # per-layer gate from the layer's own hidden states
    gh = jnp.transpose(x.reshape(B, T, H, D), (0, 2, 1, 3))  # (B, H, T, D)
    proj = linear(gh, p["gru_rel_pos_linear"])  # (B, H, T, 8)
    proj = proj.reshape(B, H, T, 2, 4).sum(-1)
    gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # (B,H,T,1)
    gate = gate_a * (gate_b * p["gru_rel_pos_const"].reshape(1, H, 1, 1) - 1.0) + 2.0
    gated_bias = gate * pos_bias[None]  # (B, H, T, T)

    scale = D ** -0.5
    q = linear(x, p["q"]) * scale
    k = linear(x, p["k"])
    v = linear(x, p["v"])
    q = jnp.transpose(q.reshape(B, T, H, D), (0, 2, 1, 3))
    k = jnp.transpose(k.reshape(B, T, H, D), (0, 2, 1, 3))
    v = jnp.transpose(v.reshape(B, T, H, D), (0, 2, 1, 3))
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) + gated_bias
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, C)
    return linear(out, p["out"])


def _feed_forward(p, x):
    from ..ops.conv import linear

    return linear(jax.nn.gelu(linear(x, p["in"]), approximate=False), p["out"])


def wavlm_apply(params, cfg: WavLMConfig, wav, *, output_layer=None):
    """wav (B, T) -> list of hidden states [(B, T', C)] * (L + 1) — the
    s3prl layer-weighted-features surface. output_layer: return just that
    hidden state instead (0 = encoder input)."""
    eps = cfg.layer_norm_eps
    x = feature_encoder(params, cfg, wav)
    x = jnp.swapaxes(x, 1, 2)  # (B, T', C_conv)
    x = _layer_norm(x, params["feat_proj_ln"], eps)
    from ..ops.conv import linear

    h = linear(x, params["feat_proj"])
    h = h + _pos_conv_embed(params["pos_conv"], cfg, h)
    if not cfg.do_stable_layer_norm:
        h = _layer_norm(h, params["encoder_ln"], eps)
    T = h.shape[1]
    pos_bias = _position_bias(params["rel_attn_embed"], T, cfg)
    hiddens = [h]
    for lp in params["layers"]:
        if cfg.do_stable_layer_norm:  # pre-LN (large)
            a = _attention(lp["attn"], _layer_norm(h, lp["ln1"], eps),
                           pos_bias, cfg)
            h = h + a
            h = h + _feed_forward(lp["ffn"], _layer_norm(h, lp["ln2"], eps))
        else:  # post-LN (base)
            h = _layer_norm(h + _attention(lp["attn"], h, pos_bias, cfg),
                            lp["ln1"], eps)
            h = _layer_norm(h + _feed_forward(lp["ffn"], h), lp["ln2"], eps)
        hiddens.append(h)
    if cfg.do_stable_layer_norm:
        hiddens[-1] = _layer_norm(hiddens[-1], params["encoder_ln"], eps)
    if output_layer is not None:
        return hiddens[output_layer]
    return hiddens


def make_ssl_fn(params, cfg: WavLMConfig):
    """ssl_fn for models/ecapa_tdnn.extract_features(feat_type='ssl')."""
    def fn(wav):
        return wavlm_apply(params, cfg, wav)

    return fn


# ---------------------------------------------------------------------------
# torch state-dict conversion (WavLMModel layout)
# ---------------------------------------------------------------------------

def convert_wavlm(sd, cfg: WavLMConfig, *, _family: str = "wavlm"):
    """transformers WavLMModel.state_dict() (numpy values) -> param tree.

    _family="wav2vec2" converts the bias-free layout shared by
    Wav2Vec2Model / HubertModel / UniSpeechSatModel (models/wav2vec2.py):
    identical keys minus the gated-relative-position ones."""
    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"g": jnp.asarray(sd[prefix + ".weight"]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": {"w": jnp.asarray(sd[f"{pre}.conv.weight"])}}
        if f"{pre}.conv.bias" in sd:
            layer["conv"]["b"] = jnp.asarray(sd[f"{pre}.conv.bias"])
        if f"{pre}.layer_norm.weight" in sd:
            key = "gn" if (cfg.feat_extract_norm == "group" and i == 0) else "ln"
            layer[key] = {"g": jnp.asarray(sd[f"{pre}.layer_norm.weight"]),
                          "b": jnp.asarray(sd[f"{pre}.layer_norm.bias"])}
        conv_layers.append(layer)

    # pos conv: fold the dim=2 weight norm (g over the kernel axis)
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{pc}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{pc}.parametrizations.weight.original1"])
    else:
        g = np.asarray(sd[f"{pc}.weight_g"])
        v = np.asarray(sd[f"{pc}.weight_v"])
    norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
    pos_w = jnp.asarray(g * v / np.maximum(norm, 1e-12))
    pos_conv = {"w": pos_w, "b": jnp.asarray(sd[f"{pc}.bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        attn = {
            "q": lin(f"{pre}.attention.q_proj"),
            "k": lin(f"{pre}.attention.k_proj"),
            "v": lin(f"{pre}.attention.v_proj"),
            "out": lin(f"{pre}.attention.out_proj"),
        }
        if _family == "wavlm":
            attn["gru_rel_pos_linear"] = lin(
                f"{pre}.attention.gru_rel_pos_linear")
            attn["gru_rel_pos_const"] = jnp.asarray(
                sd[f"{pre}.attention.gru_rel_pos_const"]).reshape(-1)
        layers.append({
            "attn": attn,
            "ffn": {"in": lin(f"{pre}.feed_forward.intermediate_dense"),
                    "out": lin(f"{pre}.feed_forward.output_dense")},
            "ln1": ln(f"{pre}.layer_norm"),
            "ln2": ln(f"{pre}.final_layer_norm"),
        })

    tree = {
        "conv_layers": conv_layers,
        "feat_proj_ln": ln("feature_projection.layer_norm"),
        "feat_proj": lin("feature_projection.projection"),
        "pos_conv": pos_conv,
        "encoder_ln": ln("encoder.layer_norm"),
        "layers": layers,
    }
    if _family == "wavlm":
        tree["rel_attn_embed"] = jnp.asarray(
            sd["encoder.layers.0.attention.rel_attn_embed.weight"])
    return tree
