"""Native wav2vec 2.0 / HuBERT / UniSpeech-SAT SSL upstreams.

Completes the s3prl upstream family the reference's speaker-verification
suite taps for layer-weighted features
(BigCodec_SSL/speaker_verification/models/ecapa_tdnn.py:258-273: the
WavLM / HuBERT / wav2vec2 / UniSpeech-SAT feature extractors). All three
families here share one architecture — the wav2vec2 encoder — which is
exactly WavLM (models/wavlm.py) minus the gated relative position bias:

  raw wav (B, T)
  -> conv feature encoder (group-norm first layer in 'group' mode,
     per-layer LayerNorm in 'layer' mode)           [shared with wavlm]
  -> feature projection (LayerNorm + Linear)
  -> conv positional embedding added to the stream  [shared with wavlm]
  -> N transformer layers with PLAIN softmax attention (no position
     bias); post-LN ('group'/base) or stable pre-LN ('layer'/large)
  -> hidden_states list [(B, T', C)] * (L + 1), the s3prl surface
     consumed by ssl_weighted_features.

Behavioral spec: transformers' modeling_wav2vec2.py / modeling_hubert.py /
modeling_unispeech_sat.py — the three torch modules share this encoder and
a common state-dict layout, verified by golden parity against each actual
torch module at random init in tests/test_wav2vec2.py.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .wavlm import _conv1d  # noqa: F401  (re-export surface parity)
from .wavlm import _feed_forward, _layer_norm, _pos_conv_embed, feature_encoder


@dataclasses.dataclass
class Wav2Vec2Config:
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
    do_stable_layer_norm: bool = False  # True for the -large checkpoints
    layer_norm_eps: float = 1e-5


def _attention(p, x, cfg: Wav2Vec2Config):
    """Plain multi-head softmax attention (modeling_wav2vec2.py, the
    Wav2Vec2Attention used unchanged by Hubert/UniSpeechSat)."""
    from ..ops.conv import linear

    B, T, C = x.shape
    H = cfg.num_attention_heads
    D = C // H
    scale = D ** -0.5
    q = linear(x, p["q"]) * scale
    k = linear(x, p["k"])
    v = linear(x, p["v"])
    q = jnp.transpose(q.reshape(B, T, H, D), (0, 2, 1, 3))
    k = jnp.transpose(k.reshape(B, T, H, D), (0, 2, 1, 3))
    v = jnp.transpose(v.reshape(B, T, H, D), (0, 2, 1, 3))
    w = jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", q, k), axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, v)
    return linear(jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, C), p["out"])


def wav2vec2_apply(params, cfg: Wav2Vec2Config, wav, *, output_layer=None):
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
    hiddens = [h]
    for lp in params["layers"]:
        if cfg.do_stable_layer_norm:  # pre-LN (large)
            h = h + _attention(lp["attn"], _layer_norm(h, lp["ln1"], eps), cfg)
            h = h + _feed_forward(lp["ffn"], _layer_norm(h, lp["ln2"], eps))
        else:  # post-LN (base)
            h = _layer_norm(h + _attention(lp["attn"], h, cfg), lp["ln1"], eps)
            h = _layer_norm(h + _feed_forward(lp["ffn"], h), lp["ln2"], eps)
        hiddens.append(h)
    if cfg.do_stable_layer_norm:
        hiddens[-1] = _layer_norm(hiddens[-1], params["encoder_ln"], eps)
    if output_layer is not None:
        return hiddens[output_layer]
    return hiddens


def make_ssl_fn(params, cfg: Wav2Vec2Config):
    """ssl_fn for models/ecapa_tdnn.extract_features(feat_type='ssl')."""
    def fn(wav):
        return wav2vec2_apply(params, cfg, wav)

    return fn


# ---------------------------------------------------------------------------
# torch state-dict conversion (Wav2Vec2Model / HubertModel /
# UniSpeechSatModel share this layout; wavlm adds only the rel-pos keys)
# ---------------------------------------------------------------------------

def convert_wav2vec2(sd, cfg: Wav2Vec2Config):
    """transformers {Wav2Vec2,Hubert,UniSpeechSat}Model.state_dict()
    (numpy values) -> param tree. Extra pretraining-only keys in the state
    dict (masked_spec_embed, quantizer/project heads) are ignored — they
    are not part of the s3prl hidden-state surface."""
    from .wavlm import convert_wavlm

    tree = convert_wavlm(sd, cfg, _family="wav2vec2")
    return tree


_CANONICAL_STRIDE = {7: (5, 2, 2, 2, 2, 2, 2)}


def infer_config_from_sd(sd, family: str, *, num_attention_heads=None,
                         conv_stride=None):
    """Infer the model config from a transformers state dict so the CLI can
    load any published checkpoint of the family without a config file.

    Shape-derivable fields (conv dims/kernels, hidden/intermediate size,
    layer count, norm layout, conv bias, wavlm bucket count) are read from
    the weights. Non-derivable ones follow the published-checkpoint
    conventions: head dim 64, the canonical 7-stage stride (5,2,2,2,2,2,2),
    max_bucket_distance 800, and stable pre-LN iff feat_extract_norm is
    'layer' (true for every base/large release of these families). Pass
    num_attention_heads / conv_stride to override for nonstandard models.
    """
    import numpy as np

    def shape(k):
        return tuple(np.asarray(sd[k]).shape)

    n_conv = 1 + max(int(k.split(".")[2]) for k in sd
                     if k.startswith("feature_extractor.conv_layers."))
    conv_dim = tuple(shape(f"feature_extractor.conv_layers.{i}.conv.weight")[0]
                     for i in range(n_conv))
    conv_kernel = tuple(
        shape(f"feature_extractor.conv_layers.{i}.conv.weight")[2]
        for i in range(n_conv))
    if conv_stride is None:
        if n_conv not in _CANONICAL_STRIDE:
            raise ValueError(
                f"cannot infer conv_stride for a {n_conv}-stage feature "
                "extractor; pass conv_stride explicitly")
        conv_stride = _CANONICAL_STRIDE[n_conv]
    hidden = shape("feature_projection.projection.weight")[0]
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.layers."))
    inter = shape("encoder.layers.0.feed_forward.intermediate_dense.weight")[0]
    norm = ("layer" if "feature_extractor.conv_layers.1.layer_norm.weight"
            in sd else "group")
    # pos-conv kernel + groups from the (folded or normed) weight shape
    # (C_out, C_in/groups, k)
    pc = "encoder.pos_conv_embed.conv"
    for key in (f"{pc}.parametrizations.weight.original1",
                f"{pc}.weight_v", f"{pc}.weight"):
        if key in sd:
            pos_shape = shape(key)
            break
    else:
        raise ValueError(
            "cannot locate the pos_conv weight in the state dict (looked "
            f"for {pc}.{{parametrizations.weight.original1,weight_v,weight}})"
            " — is this a transformers-layout checkpoint?")
    if num_attention_heads is None and family == "wavlm":
        # exactly derivable: rel_attn_embed is Embedding(num_buckets, heads)
        num_attention_heads = shape(
            "encoder.layers.0.attention.rel_attn_embed.weight")[1]
    kw = dict(
        num_conv_pos_embeddings=pos_shape[2],
        num_conv_pos_embedding_groups=hidden // pos_shape[1],
        hidden_size=hidden, num_hidden_layers=n_layers,
        num_attention_heads=num_attention_heads or max(1, hidden // 64),
        intermediate_size=inter, conv_dim=conv_dim, conv_kernel=conv_kernel,
        conv_stride=tuple(conv_stride), feat_extract_norm=norm,
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in sd,
        do_stable_layer_norm=(norm == "layer"))
    if family == "wavlm":
        from .wavlm import WavLMConfig

        return WavLMConfig(
            **kw,
            num_buckets=shape(
                "encoder.layers.0.attention.rel_attn_embed.weight")[0])
    return Wav2Vec2Config(**kw)


def load_ssl_upstream(sd, family: str, **infer_kw):
    """(state dict, family) -> (ssl_fn, cfg): one entry point for every
    s3prl upstream family of the reference SV suite
    (speaker_verification/models/ecapa_tdnn.py:258-273)."""
    cfg = infer_config_from_sd(sd, family, **infer_kw)
    if family == "wavlm":
        from .wavlm import convert_wavlm, make_ssl_fn as mk

        return mk(convert_wavlm(sd, cfg), cfg), cfg
    if family in ("wav2vec2", "hubert", "unispeech_sat"):
        return make_ssl_fn(convert_wav2vec2(sd, cfg), cfg), cfg
    raise ValueError(f"unknown SSL family {family!r}")
