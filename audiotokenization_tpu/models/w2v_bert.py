"""Native JAX Wav2Vec2-BERT 2.0 encoder (the SSL semantic teacher).

The reference runs the frozen HF `Wav2Vec2BertModel("facebook/w2v-bert-2.0")`
inside every training step and distills hidden layer 16
(BigCodec_SSL/lightning_module.py:192-239). This is a faithful JAX
implementation of that architecture (w2v-bert-2.0 / SeamlessM4T conformer
encoder, position_embeddings_type='relative_key'):

  feature_projection: LayerNorm(160) -> Linear(->hidden)
  24x conformer layers: half-step FFN1 -> self-attn with clamped relative-key
  distance embeddings (left 64 / right 8) -> causal GLU conv module (k=31,
  LEFT-padded) -> half-step FFN2 -> final LayerNorm

With `convert_w2v_bert` the HF checkpoint's state dict maps onto this tree,
so the teacher runs natively on TPU inside the jitted train step (the
`semantic_target` precompute path remains available for the offline option).
Hidden-state indexing matches HF: hidden_states[i] = output of layer i-1,
so layer 16 means the output of encoder layer 15.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, linear


@dataclass
class W2vBertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    feature_projection_input_dim: int = 160
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    conv_depthwise_kernel_size: int = 31
    layer_norm_eps: float = 1e-5


def _layer_norm(x, p, eps):
    from ..ops.transformer import layer_norm

    return layer_norm(x, p["w"], p["b"], eps=eps)


def _ffn(x, p, eps):
    """LayerNorm -> intermediate -> swish -> output (half-step applied by caller)."""
    h = _layer_norm(x, p["norm"], eps)
    h = jax.nn.silu(linear(h, p["inter"]))
    return linear(h, p["out"])


def _rel_key_scores(q, distance_embedding, *, left_max: int, right_max: int):
    """Transformer-XL-lite 'relative_key' bias: clamp(distances) embeddings.

    q: (B, H, T, D); distance_embedding: (left+right+1, D).
    Returns (B, H, T, T) bias (already includes 1/sqrt(D) scaling by caller).
    """
    T = q.shape[2]
    pos_l = np.arange(T)[:, None]
    pos_r = np.arange(T)[None, :]
    distance = np.clip(pos_r - pos_l, -left_max, right_max) + left_max
    pos_emb = jnp.take(distance_embedding, jnp.asarray(distance), axis=0)  # (T, T, D)
    return jnp.einsum("bhld,lrd->bhlr", q, pos_emb)


def _attention(x, p, cfg: W2vBertConfig, valid_frames=None):
    B, T, C = x.shape
    H = cfg.num_attention_heads
    D = C // H
    h = _layer_norm(x, p["norm"], cfg.layer_norm_eps)
    q = linear(h, p["q"]).reshape(B, T, H, D).transpose(0, 2, 1, 3)
    k = linear(h, p["k"]).reshape(B, T, H, D).transpose(0, 2, 1, 3)
    v = linear(h, p["v"]).reshape(B, T, H, D).transpose(0, 2, 1, 3)
    scale = 1.0 / float(np.sqrt(D))  # python scalar: no bf16->fp32 promotion
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k) * scale
    scores = scores + _rel_key_scores(
        q, p["distance_embedding"], left_max=cfg.left_max_position_embeddings,
        right_max=cfg.right_max_position_embeddings) * scale
    if valid_frames is not None:
        # key-side padding mask (HF attention_mask): with it, hidden states
        # at positions < valid_frames[b] equal the per-utterance forward
        # exactly — attention is the only cross-position op here that reads
        # the tail (the conv module is causally LEFT-padded, norms/FFNs are
        # per-position), so masking keys makes zero-padded batches exact
        key_ok = (jnp.arange(T)[None, :] < valid_frames[:, None])  # (B, T)
        scores = jnp.where(key_ok[:, None, None, :], scores, -jnp.inf)
    # fp32 softmax island (torch autocast computes softmax in fp32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return x + linear(out, p["out"])


def _conv_module(x, p, cfg: W2vBertConfig):
    """LayerNorm -> pw1+GLU -> causal depthwise k31 -> LN -> swish -> pw2."""
    h = _layer_norm(x, p["norm"], cfg.layer_norm_eps)
    h = jnp.swapaxes(h, 1, 2)  # (B, C, T)
    h = conv1d(h, p["pw1"]["w"][:, :, None])
    a, b = jnp.split(h, 2, axis=1)
    h = a * jax.nn.sigmoid(b)
    k = cfg.conv_depthwise_kernel_size
    h = jnp.pad(h, ((0, 0), (0, 0), (k - 1, 0)))  # causal left pad
    h = conv1d(h, p["dw"]["w"], groups=h.shape[1])
    h = jnp.swapaxes(h, 1, 2)
    h = _layer_norm(h, p["dw_norm"], cfg.layer_norm_eps)
    h = jax.nn.silu(h)
    h = linear(h, p["pw2"])
    return x + h


def _encoder_layer(x, p, cfg: W2vBertConfig, valid_frames=None):
    x = 0.5 * _ffn(x, p["ffn1"], cfg.layer_norm_eps) + x
    x = _attention(x, p["attn"], cfg, valid_frames)
    x = _conv_module(x, p["conv"], cfg)
    x = 0.5 * _ffn(x, p["ffn2"], cfg.layer_norm_eps) + x
    return _layer_norm(x, p["final_norm"], cfg.layer_norm_eps)


def w2v_bert_apply(params, cfg: W2vBertConfig, features,
                   *, output_layer: int | None = None,
                   valid_frames=None) -> List[jnp.ndarray]:
    """features: (B, T, 160) stacked fbank -> list of hidden states (HF indexing).

    output_layer=k returns only hidden_states[k] (k=0 is the projected input,
    k=i is the output of encoder layer i-1).

    valid_frames: optional (B,) per-row count of real (non-padded) feature
    frames. When set, attention keys at padded positions are masked out, so
    hidden states over the valid region match running each utterance alone
    (the HF attention_mask path) — the ragged full-length eval's requirement.
    """
    h, _ = w2v_bert_project(params, cfg, features)
    hiddens = [h]
    for lp in params["layers"]:
        h = _encoder_layer(h, lp, cfg, valid_frames)
        hiddens.append(h)
        if output_layer is not None and len(hiddens) > output_layer:
            return hiddens[output_layer]
    if output_layer is not None:
        return hiddens[output_layer]
    return hiddens


def w2v_bert_project(params, cfg: W2vBertConfig, features):
    norm = _layer_norm(features, params["feat_norm"], cfg.layer_norm_eps)
    return linear(norm, params["feat_proj"]), norm


def init_w2v_bert(key, cfg: W2vBertConfig | None = None) -> Dict[str, Any]:
    """Random-init teacher params (smoke runs / tests; real distillation
    loads the HF snapshot via load_w2v_bert_teacher)."""
    cfg = cfg or W2vBertConfig()
    h, inter = cfg.hidden_size, cfg.intermediate_size
    hd = h // cfg.num_attention_heads
    n_dist = cfg.left_max_position_embeddings + cfg.right_max_position_embeddings + 1
    keys = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 4))

    def lin(n_out, n_in, bias=True):
        p = {"w": jax.random.normal(next(keys), (n_out, n_in)) * 0.02}
        if bias:
            p["b"] = jnp.zeros((n_out,))
        return p

    def ln(n):
        return {"w": jnp.ones((n,)), "b": jnp.zeros((n,))}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "ffn1": {"norm": ln(h), "inter": lin(inter, h), "out": lin(h, inter)},
            "attn": {"norm": ln(h), "q": lin(h, h), "k": lin(h, h),
                     "v": lin(h, h), "out": lin(h, h),
                     "distance_embedding":
                         jax.random.normal(next(keys), (n_dist, hd)) * 0.02},
            "conv": {"norm": ln(h), "pw1": lin(2 * h, h, bias=False),
                     "dw": {"w": jax.random.normal(
                         next(keys), (h, 1, cfg.conv_depthwise_kernel_size)) * 0.02},
                     "dw_norm": ln(h), "pw2": lin(h, h, bias=False)},
            "ffn2": {"norm": ln(h), "inter": lin(inter, h), "out": lin(h, inter)},
            "final_norm": ln(h),
        })
    return {
        "feat_norm": ln(cfg.feature_projection_input_dim),
        "feat_proj": lin(h, cfg.feature_projection_input_dim),
        "layers": layers,
    }


def load_w2v_bert_teacher(model_path: str, cfg: W2vBertConfig | None = None):
    """Load teacher params from a local HF snapshot (safetensors or torch .bin).

    No network access: `model_path` must be a directory containing
    model.safetensors or pytorch_model.bin (e.g. a pre-downloaded
    facebook/w2v-bert-2.0 snapshot).
    """
    from pathlib import Path

    cfg = cfg or W2vBertConfig()
    p = Path(model_path)
    st = p / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = load_file(st)
    else:
        import torch

        raw = torch.load(p / "pytorch_model.bin", map_location="cpu")
        sd = {k: v.numpy() for k, v in raw.items()}
    return convert_w2v_bert(sd, cfg)


# ---------------------------------------------------------------------------
# HF state-dict conversion
# ---------------------------------------------------------------------------

def convert_w2v_bert(sd: Mapping[str, Any], cfg: W2vBertConfig) -> Dict[str, Any]:
    """HF Wav2Vec2BertModel state dict (numpy values) -> param tree."""
    def j(k):
        return jnp.asarray(np.asarray(sd[k]))

    def lin(prefix):
        p = {"w": j(prefix + ".weight")}
        if prefix + ".bias" in sd:
            p["b"] = j(prefix + ".bias")
        return p

    def ln(prefix):
        return {"w": j(prefix + ".weight"), "b": j(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layers.append({
            "ffn1": {"norm": ln(f"{pre}.ffn1_layer_norm"),
                     "inter": lin(f"{pre}.ffn1.intermediate_dense"),
                     "out": lin(f"{pre}.ffn1.output_dense")},
            "attn": {"norm": ln(f"{pre}.self_attn_layer_norm"),
                     "q": lin(f"{pre}.self_attn.linear_q"),
                     "k": lin(f"{pre}.self_attn.linear_k"),
                     "v": lin(f"{pre}.self_attn.linear_v"),
                     "out": lin(f"{pre}.self_attn.linear_out"),
                     "distance_embedding": j(f"{pre}.self_attn.distance_embedding.weight")},
            "conv": {"norm": ln(f"{pre}.conv_module.layer_norm"),
                     "pw1": {"w": j(f"{pre}.conv_module.pointwise_conv1.weight")[:, :, 0]},
                     "dw": {"w": j(f"{pre}.conv_module.depthwise_conv.weight")},
                     "dw_norm": ln(f"{pre}.conv_module.depthwise_layer_norm"),
                     "pw2": {"w": j(f"{pre}.conv_module.pointwise_conv2.weight")[:, :, 0]}},
            "ffn2": {"norm": ln(f"{pre}.ffn2_layer_norm"),
                     "inter": lin(f"{pre}.ffn2.intermediate_dense"),
                     "out": lin(f"{pre}.ffn2.output_dense")},
            "final_norm": ln(f"{pre}.final_layer_norm"),
        })
    return {
        "feat_norm": ln("feature_projection.layer_norm"),
        "feat_proj": lin("feature_projection.projection"),
        "layers": layers,
    }
