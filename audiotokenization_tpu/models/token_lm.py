"""Stage-2 token language model (CodecLLM equivalent).

Reference: BigCodec_SSL/lightning_module.py:527-612 — a small
LlamaForCausalLM (vocab = codebook_size + 2 with BOS=V / EOS=V+1, hidden 256,
intermediate 1024, 4 layers, 4 heads, max_pos 1024) trained with next-token
CE over token streams produced by the FROZEN codec encoder + quantizer:
inputs = [BOS, idx...], targets = [idx..., EOS].

Implemented natively as a Llama-architecture decoder-only transformer
(pre-RMSNorm, RoPE, causal attention, SwiGLU gate/up/down MLP, untied LM
head) over this framework's transformer ops; the codec tokenizer runs under
stop_gradient inside the same jitted step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.conv import init_linear, linear
from ..ops.transformer import precompute_rope, apply_rope, rms_norm


class TokenLMConfig(NamedTuple):
    vocab_size: int          # codebook_size + 2
    hidden_size: int = 256
    intermediate_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    max_position_embeddings: int = 1024
    rope_theta: float = 10000.0

    @property
    def bos_token_id(self):
        return self.vocab_size - 2

    @property
    def eos_token_id(self):
        return self.vocab_size - 1


def token_lm_apply(params, lm_cfg: TokenLMConfig, tokens):
    """tokens: (B, T) int32 -> logits (B, T, vocab)."""
    B, T = tokens.shape
    if T > lm_cfg.max_position_embeddings:
        raise ValueError(
            f"sequence length {T} exceeds max_position_embeddings "
            f"{lm_cfg.max_position_embeddings} (the reference caps the LM at "
            f"1024 positions, lightning_module.py:551); shorten crop_seconds "
            f"or raise TokenLMConfig.max_position_embeddings")
    h = jnp.take(params["embed"], tokens, axis=0)  # (B, T, H)
    head_dim = lm_cfg.hidden_size // lm_cfg.num_heads
    cos, sin = precompute_rope(head_dim, lm_cfg.max_position_embeddings,
                               lm_cfg.rope_theta)
    cos, sin = cos[:T], sin[:T]
    for layer in params["layers"]:
        x = rms_norm(h, layer["attn_norm"])
        q = linear(x, layer["q"]).reshape(B, T, lm_cfg.num_heads, head_dim)
        k = linear(x, layer["k"]).reshape(B, T, lm_cfg.num_heads, head_dim)
        v = linear(x, layer["v"]).reshape(B, T, lm_cfg.num_heads, head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        att = jax.nn.dot_product_attention(q, k, v, is_causal=True)
        h = h + linear(att.reshape(B, T, -1), layer["o"])
        x = rms_norm(h, layer["mlp_norm"])
        h = h + linear(jax.nn.silu(linear(x, layer["gate"])) * linear(x, layer["up"]),
                       layer["down"])
    h = rms_norm(h, params["norm"])
    return linear(h, params["lm_head"])


def token_lm_loss(params, lm_cfg: TokenLMConfig, indices):
    """Next-token CE over [BOS, idx] -> [idx, EOS] (lightning_module.py:563-596)."""
    B, T = indices.shape
    bos = jnp.full((B, 1), lm_cfg.bos_token_id, indices.dtype)
    eos = jnp.full((B, 1), lm_cfg.eos_token_id, indices.dtype)
    inputs = jnp.concatenate([bos, indices], axis=1)
    targets = jnp.concatenate([indices, eos], axis=1)
    logits = token_lm_apply(params, lm_cfg, inputs)
    loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, targets))
    return loss


@functools.partial(jax.jit, static_argnames=("lm_cfg", "batch_size", "length",
                                              "temperature"))
def token_lm_generate(params, lm_cfg: TokenLMConfig, *, batch_size: int,
                      length: int, key, temperature: float = 1.0):
    """Autoregressive sampling from BOS for `length` tokens (greedy at temp=0).

    One jitted fixed-shape program: a (B, length+1) buffer is filled by a
    fori_loop whose body runs the causal forward over the whole buffer and
    writes position t+1 (positions beyond t are BOS filler the causal mask
    ignores). The earlier grow-the-sequence loop dispatched the transformer
    EAGERLY with a new shape per token — hundreds of tiny compiles per step,
    minutes on CPU and pathological through a remote-device tunnel.
    """
    buf = jnp.full((batch_size, length + 1), lm_cfg.bos_token_id, jnp.int32)

    def body(t, carry):
        buf, key = carry
        logits = token_lm_apply(params, lm_cfg, buf)  # (B, L+1, V)
        logit_t = jax.lax.dynamic_index_in_dim(logits, t, axis=1,
                                               keepdims=False)
        key, sub = jax.random.split(key)
        if temperature == 0.0:
            nxt = jnp.argmax(logit_t, axis=-1)
        else:
            nxt = jax.random.categorical(sub, logit_t / temperature, axis=-1)
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, nxt.astype(jnp.int32), t + 1, axis=1)
        return buf, key

    buf, _ = jax.lax.fori_loop(0, length, body, (buf, key))
    return buf[:, 1:]


def _rope_at(x, cos, sin, pos):
    """Rotate (B, H, D) vectors by the tables' row `pos` (interleaved pairs)."""
    c = jnp.take(cos, pos, axis=0)[None, None, :]
    s = jnp.take(sin, pos, axis=0)[None, None, :]
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    out = jnp.stack([xe * c - xo * s, xe * s + xo * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("lm_cfg", "batch_size", "length",
                                              "temperature"))
def token_lm_generate_kv(params, lm_cfg: TokenLMConfig, *, batch_size: int,
                         length: int, key, temperature: float = 1.0):
    """KV-cached autoregressive sampling — same distribution as
    token_lm_generate but O(L) attention per emitted token instead of a full
    O(L^2) re-forward (the TPU-idiomatic decode loop: fixed-shape caches
    carried through lax.fori_loop, one MXU-friendly step per token).
    Greedy decode (temperature=0) matches token_lm_generate token-for-token
    (tests/test_token_lm_hf_parity.py)."""
    B = batch_size
    H, nh = lm_cfg.hidden_size, lm_cfg.num_heads
    D = H // nh
    L = length + 1
    if L > lm_cfg.max_position_embeddings:
        raise ValueError(
            f"generation length {length} (+BOS) exceeds "
            f"max_position_embeddings {lm_cfg.max_position_embeddings}; "
            f"jnp.take would silently clamp RoPE rows past the table end — "
            f"shorten the request or raise TokenLMConfig.max_position_embeddings")
    cos, sin = precompute_rope(D, lm_cfg.max_position_embeddings,
                               lm_cfg.rope_theta)
    nl = len(params["layers"])
    k_cache = jnp.zeros((nl, B, nh, L, D))
    v_cache = jnp.zeros((nl, B, nh, L, D))
    buf = jnp.full((B, L), lm_cfg.bos_token_id, jnp.int32)
    scale = 1.0 / float(np.sqrt(D))

    def step(t, carry):
        buf, k_cache, v_cache, key = carry
        tok = jax.lax.dynamic_index_in_dim(buf, t, axis=1, keepdims=False)
        h = jnp.take(params["embed"], tok, axis=0)  # (B, H)
        for li, layer in enumerate(params["layers"]):
            x = rms_norm(h, layer["attn_norm"])
            q = linear(x, layer["q"]).reshape(B, nh, D)
            k = linear(x, layer["k"]).reshape(B, nh, D)
            v = linear(x, layer["v"]).reshape(B, nh, D)
            q = _rope_at(q, cos, sin, t)
            k = _rope_at(k, cos, sin, t)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k[None, :, :, None, :], (li, 0, 0, t, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v[None, :, :, None, :], (li, 0, 0, t, 0))
            scores = jnp.einsum("bhd,bhtd->bht", q, k_cache[li]) * scale
            mask = jnp.arange(L)[None, None, :] <= t
            scores = jnp.where(mask, scores, -jnp.inf)
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bht,bhtd->bhd", att, v_cache[li])
            h = h + linear(out.reshape(B, H), layer["o"])
            x = rms_norm(h, layer["mlp_norm"])
            h = h + linear(jax.nn.silu(linear(x, layer["gate"]))
                           * linear(x, layer["up"]), layer["down"])
        logits = linear(rms_norm(h, params["norm"]), params["lm_head"])
        key, sub = jax.random.split(key)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, nxt.astype(jnp.int32), t + 1, axis=1)
        return buf, k_cache, v_cache, key

    buf, _, _, _ = jax.lax.fori_loop(0, length, step,
                                     (buf, k_cache, v_cache, key))
    return buf[:, 1:]


def init_token_lm(key, lm_cfg: TokenLMConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 3 + lm_cfg.num_layers)
    h, inter = lm_cfg.hidden_size, lm_cfg.intermediate_size
    std = 0.02

    def normal(k, shape):
        return std * jax.random.normal(k, shape)

    layers = []
    for i in range(lm_cfg.num_layers):
        lk = jax.random.split(keys[3 + i], 7)
        layers.append({
            "attn_norm": jnp.ones((h,)),
            "q": {"w": normal(lk[0], (h, h))},
            "k": {"w": normal(lk[1], (h, h))},
            "v": {"w": normal(lk[2], (h, h))},
            "o": {"w": normal(lk[3], (h, h))},
            "mlp_norm": jnp.ones((h,)),
            "gate": {"w": normal(lk[4], (inter, h))},
            "up": {"w": normal(lk[5], (inter, h))},
            "down": {"w": normal(lk[6], (h, inter))},
        })
    return {
        "embed": normal(keys[0], (lm_cfg.vocab_size, h)),
        "layers": layers,
        "norm": jnp.ones((h,)),
        "lm_head": {"w": normal(keys[1], (lm_cfg.vocab_size, h))},
    }


def convert_token_lm_from_hf(sd, lm_cfg: TokenLMConfig) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict (numpy values) -> token-LM param tree.

    The reference's stage-2 LM IS an HF LlamaForCausalLM
    (lightning_module.py:543-555); this converter makes its checkpoints (or
    any same-shape Llama) load into the native implementation. HF's rotary
    embedding uses the rotate_half layout (pairs (i, i + D/2)); this
    implementation rotates interleaved pairs (2i, 2i+1), so q/k projection
    output rows are permuted per head (the GPT-NeoX <-> Llama permutation) —
    scores and outputs are then bit-identical in exact arithmetic.
    """
    import numpy as np

    H, nh = lm_cfg.hidden_size, lm_cfg.num_heads
    D = H // nh
    base = np.empty(D, np.int64)
    base[0::2] = np.arange(D // 2)
    base[1::2] = np.arange(D // 2) + D // 2
    perm = (np.arange(nh)[:, None] * D + base[None, :]).reshape(-1)

    def j(k):
        return jnp.asarray(np.asarray(sd[k]))

    layers = []
    for i in range(lm_cfg.num_layers):
        pre = f"model.layers.{i}"
        layers.append({
            "attn_norm": j(f"{pre}.input_layernorm.weight"),
            "q": {"w": j(f"{pre}.self_attn.q_proj.weight")[perm]},
            "k": {"w": j(f"{pre}.self_attn.k_proj.weight")[perm]},
            "v": {"w": j(f"{pre}.self_attn.v_proj.weight")},
            "o": {"w": j(f"{pre}.self_attn.o_proj.weight")},
            "mlp_norm": j(f"{pre}.post_attention_layernorm.weight"),
            "gate": {"w": j(f"{pre}.mlp.gate_proj.weight")},
            "up": {"w": j(f"{pre}.mlp.up_proj.weight")},
            "down": {"w": j(f"{pre}.mlp.down_proj.weight")},
        })
    lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    return {
        "embed": j("model.embed_tokens.weight"),
        "layers": layers,
        "norm": j("model.norm.weight"),
        "lm_head": {"w": jnp.asarray(np.asarray(lm_head))},
    }


def make_token_lm_train_step(cfg: Config, lm_cfg: TokenLMConfig, codec_params,
                             tx):
    """Jitted step: wav -> frozen tokenize -> LM CE update. Returns (state, logs)."""
    from . import codec as C

    frozen = jax.lax.stop_gradient(codec_params)

    def step(lm_params, opt_state, batch):
        indices = C.tokenize(frozen, cfg, batch["wav"])  # (Nq, B, T)
        indices = jax.lax.stop_gradient(indices[0]).astype(jnp.int32)

        def loss_fn(p):
            return token_lm_loss(p, lm_cfg, indices)

        loss, grads = jax.value_and_grad(loss_fn)(lm_params)
        updates, opt_state = tx.update(grads, opt_state, lm_params)
        lm_params = optax.apply_updates(lm_params, updates)
        return lm_params, opt_state, {"loss": loss, "ppl": jnp.exp(loss)}

    return jax.jit(step)
