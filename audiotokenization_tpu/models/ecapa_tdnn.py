"""ECAPA-TDNN speaker embedding model (speaker-verification suite).

Exact-architecture port of the reference's
BigCodec_SSL/speaker_verification/models/ecapa_tdnn.py (UniSpeech tooling),
so user-supplied torch SV checkpoints load via `convert_ecapa_from_torch`:

  features (fbank/MFCC/SSL-weighted) -> InstanceNorm1d ->
  layer1: Conv1d(k5, pad2) -> ReLU -> BN                      (:225)
  layer2-4: SE_Res2Block(k3, d=2/3/4, scale 8)                (:226-228)
     = 1x1 Conv-ReLU-BN -> Res2(conv_i -> ReLU -> BN, last chunk passthrough
       appended LAST, :34-49) -> 1x1 Conv-ReLU-BN -> SE -> + residual
  cat(out2, out3, out4) -> ReLU(Conv1d 1536)                  (:231-232,283)
  AttentiveStatsPool (no global context by default, tanh/softmax, std
    clamp 1e-9, :132-160) -> BatchNorm1d -> Linear(emb)       (:233-235)

NOTE the reference's op order is conv -> ReLU -> BN (:64), NOT the usual
conv -> BN -> ReLU; and Res2 appends the UNPROCESSED last chunk after the
processed ones (:45-46). Both are required for checkpoint compatibility.

Used by cli/verification.py / spk_sim to score cosine similarity between
original and reconstructed speech (the codec's speaker-preservation metric).
Golden parity vs the actual torch module: tests/test_ecapa_parity.py.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, init_conv1d, init_linear, linear
from ..ops.stft import mel_filterbank, stft


def instance_norm(x, *, eps: float = 1e-5):
    """nn.InstanceNorm1d (affine=False): per-sample per-channel over time
    (ecapa_tdnn.py:221, applied to every frontend's features). x: (B, C, T)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def log_mel_fbank(wav, *, sample_rate: int = 16000, n_mels: int = 80,
                  n_fft: int = 512):
    """torchaudio MelSpectrogram(sr, n_fft 512, win 0.025*sr, hop 0.01*sr,
    f_min 0, f_max sr//2, htk mels, power 2) + 1e-6, log
    (ecapa_tdnn.py:180-182, get_feat :252-256). wav: (B, T) -> (B, n_mels, F)."""
    win = int(sample_rate * 0.025)
    hop = int(sample_rate * 0.01)
    s = stft(wav, n_fft=n_fft, hop_length=hop, win_length=win, center=True,
             pad_mode="reflect")
    power = s.real ** 2 + s.imag ** 2
    fb = mel_filterbank(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                        fmin=0.0, fmax=sample_rate // 2, htk=True, norm=None)
    mel = jnp.einsum("mf,bft->bmt", fb, power)
    return jnp.log(mel + 1e-6)


def mfcc(wav, *, sample_rate: int = 16000, n_mfcc: int = 40, n_mels: int = 128,
         n_fft: int = 512):
    """torchaudio MFCC(log_mels=False, melkwargs as :185-192): power mel
    spectrogram (htk, unnormalized, f_min 0) -> power-dB (10*log10,
    amin 1e-10, top_db 80) -> orthonormal DCT-II, then get_feat's +1e-6.
    wav: (B, T) -> (B, n_mfcc, F)."""
    win = int(sample_rate * 0.025)
    hop = int(sample_rate * 0.01)
    s = stft(wav, n_fft=n_fft, hop_length=hop, win_length=win, center=True,
             pad_mode="reflect")
    power = s.real ** 2 + s.imag ** 2
    fb = mel_filterbank(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                        fmin=0.0, fmax=sample_rate / 2.0, htk=True, norm=None)
    mel = jnp.einsum("mf,bft->bmt", fb, power)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True) - 80.0)
    n = jnp.arange(n_mels)
    k = jnp.arange(n_mfcc)[:, None]
    dct = jnp.cos(jnp.pi * (n[None] + 0.5) * k / n_mels) * jnp.sqrt(2.0 / n_mels)
    dct = dct.at[0].mul(1.0 / jnp.sqrt(2.0))
    return jnp.einsum("km,bmt->bkt", dct, db) + 1e-6


def ssl_weighted_features(hidden_states, feature_weight):
    """s3prl-style SSL frontend: softmax layer-weighted sum of hidden states
    (ecapa_tdnn.py:260-269). hidden_states: list of (B, T, D);
    feature_weight: (L,). Returns (B, D, T) for the ECAPA stem."""
    hs = jnp.stack(list(hidden_states), axis=0)  # (L, B, T, D)
    w = jax.nn.softmax(feature_weight)[:, None, None, None]
    x = jnp.sum(w * hs, axis=0)
    return jnp.swapaxes(x, 1, 2) + 1e-6


def _bn(p, x, *, eps: float = 1e-5):
    """BatchNorm1d in inference form: running stats. x: (B, C, T) or (B, C)."""
    shape = (1, -1, 1) if x.ndim == 3 else (1, -1)
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"].reshape(shape)) * (inv * p["gamma"]).reshape(shape) \
        + p["beta"].reshape(shape)


def _conv_relu_bn(p, x, *, dilation=1, padding=None):
    """Conv1dReluBn (ecapa_tdnn.py:57-64): conv -> ReLU -> BN."""
    w = p["conv"]["w"]
    if padding is None:
        padding = (w.shape[-1] - 1) // 2 * dilation
    x = conv1d(x, w, p["conv"].get("b"), padding=padding, dilation=dilation)
    return _bn(p["bn"], jax.nn.relu(x))


def _res2_convs(p, x, *, scale: int = 8, dilation: int = 1):
    """Res2Conv1dReluBn (ecapa_tdnn.py:14-49): cascade over the first
    scale-1 chunks, the LAST chunk appended unprocessed."""
    chunks = jnp.split(x, scale, axis=1)
    outs = []
    sp = None
    for i in range(scale - 1):
        sp = chunks[i] if sp is None else sp + chunks[i]
        sp = _conv_relu_bn(p["convs"][i], sp, dilation=dilation)
        outs.append(sp)
    outs.append(chunks[scale - 1])
    return jnp.concatenate(outs, axis=1)


def _se_block(p, x):
    """SE_Connect (ecapa_tdnn.py:71-84)."""
    s = jnp.mean(x, axis=-1)  # (B, C)
    s = jax.nn.relu(linear(s, p["fc1"]))
    s = jax.nn.sigmoid(linear(s, p["fc2"]))
    return x * s[:, :, None]


def _se_res2_block(p, x, *, scale: int = 8, dilation: int = 1):
    """SE_Res2Block (ecapa_tdnn.py:100-125): residual added AFTER SE;
    optional 1x1 shortcut when channels change."""
    residual = x
    if "shortcut" in p:
        residual = conv1d(x, p["shortcut"]["w"], p["shortcut"].get("b"))
    out = _conv_relu_bn(p["conv1"], x)
    out = _res2_convs(p["res2"], out, scale=scale, dilation=dilation)
    out = _conv_relu_bn(p["conv2"], out)
    out = _se_block(p["se"], out)
    return out + residual


def _attentive_stats_pool(p, x, *, global_context_att: bool = False):
    """AttentiveStatsPool (ecapa_tdnn.py:132-160): tanh -> softmax attention,
    weighted mean + std (clamp 1e-9). Context concat only when
    global_context_att. x: (B, C, T) -> (B, 2C)."""
    if global_context_att:
        mean = jnp.broadcast_to(jnp.mean(x, -1, keepdims=True), x.shape)
        # torch.var defaults to unbiased (ddof=1) — keep checkpoint parity
        std = jnp.broadcast_to(
            jnp.sqrt(jnp.var(x, -1, keepdims=True, ddof=1) + 1e-10), x.shape)
        x_in = jnp.concatenate([x, mean, std], axis=1)
    else:
        x_in = x
    att = jnp.tanh(conv1d(x_in, p["att1"]["w"], p["att1"].get("b")))
    att = jax.nn.softmax(conv1d(att, p["att2"]["w"], p["att2"].get("b")),
                         axis=-1)
    mu = jnp.sum(x * att, axis=-1)
    sg = jnp.sqrt(jnp.maximum(jnp.sum(x * x * att, axis=-1) - mu * mu, 1e-9))
    return jnp.concatenate([mu, sg], axis=1)


def ecapa_tdnn_embed(params, feats, *, scale: int = 8,
                     global_context_att: bool = False,
                     normalize_input: bool = True):
    """feats: (B, n_mels, T) raw frontend features -> embedding (B, emb_dim).

    Mirrors forward (ecapa_tdnn.py:274-288): instance_norm is applied here
    (get_feat :270) unless the caller already normalized.
    """
    x = instance_norm(feats) if normalize_input else feats
    out1 = _conv_relu_bn(params["stem"], x, padding=2)
    out2 = _se_res2_block(params["layer1"], out1, scale=scale, dilation=2)
    out3 = _se_res2_block(params["layer2"], out2, scale=scale, dilation=3)
    out4 = _se_res2_block(params["layer3"], out3, scale=scale, dilation=4)
    cat = jnp.concatenate([out2, out3, out4], axis=1)
    x = jax.nn.relu(conv1d(cat, params["agg"]["w"], params["agg"].get("b")))
    pooled = _attentive_stats_pool(params["pool"], x,
                                   global_context_att=global_context_att)
    pooled = _bn(params["pool_bn"], pooled)
    return linear(pooled, params["fc"])


def extract_features(wav, *, feat_type: str = "fbank", sample_rate: int = 16000,
                     ssl_fn=None, feature_weight=None):
    """Frontend dispatch mirroring get_feat (ecapa_tdnn.py:247-271):
    'fbank' | 'mfcc' | 'ssl' (ssl_fn: wav (B,T) -> list of (B,T,D) hiddens).
    Returns raw features; ecapa_tdnn_embed applies the instance norm."""
    if feat_type == "fbank":
        return log_mel_fbank(wav, sample_rate=sample_rate)
    if feat_type == "mfcc":
        return mfcc(wav, sample_rate=sample_rate)
    if feat_type == "ssl":
        if ssl_fn is None or feature_weight is None:
            raise ValueError("feat_type='ssl' needs ssl_fn and feature_weight")
        return ssl_weighted_features(ssl_fn(wav), feature_weight)
    raise ValueError(f"unknown feat_type {feat_type!r}")


def speaker_similarity(params, wav_a, wav_b, *, sample_rate: int = 16000,
                       feat_type: str = "fbank", ssl_fn=None,
                       feature_weight=None):
    """Cosine similarity of speaker embeddings (verification.py behavior)."""
    kw = dict(feat_type=feat_type, sample_rate=sample_rate, ssl_fn=ssl_fn,
              feature_weight=feature_weight)
    ea = ecapa_tdnn_embed(params, extract_features(wav_a, **kw))
    eb = ecapa_tdnn_embed(params, extract_features(wav_b, **kw))
    ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
    eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
    return jnp.sum(ea * eb, axis=-1)


# ---------------------------------------------------------------------------
# init + torch checkpoint conversion
# ---------------------------------------------------------------------------

def _init_bn(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_ecapa_tdnn(key, *, n_mels: int = 80, channels: int = 512,
                    emb_dim: int = 192, scale: int = 8,
                    attention_channels: int = 128,
                    global_context_att: bool = False):
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    def conv_bn(cin, cout, k):
        return {"conv": init_conv1d(next(ki), cin, cout, k, torch_default=True),
                "bn": _init_bn(cout)}

    def res2_block(c, k=3):
        width = c // scale
        return {
            "conv1": conv_bn(c, c, 1),
            "res2": {"convs": [conv_bn(width, width, k)
                               for _ in range(scale - 1)]},
            "conv2": conv_bn(c, c, 1),
            "se": {"fc1": init_linear(next(ki), c, 128),
                   "fc2": init_linear(next(ki), 128, c)},
        }

    att_in = 1536 * 3 if global_context_att else 1536
    return {
        "stem": conv_bn(n_mels, channels, 5),
        "layer1": res2_block(channels),
        "layer2": res2_block(channels),
        "layer3": res2_block(channels),
        "agg": init_conv1d(next(ki), channels * 3, 1536, 1, torch_default=True),
        "pool": {"att1": init_conv1d(next(ki), att_in, attention_channels, 1,
                                     torch_default=True),
                 "att2": init_conv1d(next(ki), attention_channels, 1536, 1,
                                     torch_default=True)},
        "pool_bn": _init_bn(1536 * 2),
        "fc": init_linear(next(ki), 1536 * 2, emb_dim),
    }


def convert_ecapa_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ECAPA_TDNN state dict (numpy/torch values) -> param tree.

    Accepts checkpoints of speaker_verification/models/ecapa_tdnn.py (e.g.
    the UniSpeech SV releases); SSL-frontend checkpoints' feature_weight is
    surfaced under key "feature_weight" when present. feature_extract.*
    (frozen torch frontend weights) are ignored — the SSL teacher runs
    natively (models/w2v_bert.py or any ssl_fn).
    """
    def j(k):
        v = sd[k]
        return jnp.asarray(np.asarray(v.detach() if hasattr(v, "detach") else v))

    def convp(prefix):
        p = {"w": j(prefix + ".weight")}
        if prefix + ".bias" in sd:
            p["b"] = j(prefix + ".bias")
        return p

    def bn(prefix):
        return {"gamma": j(prefix + ".weight"), "beta": j(prefix + ".bias"),
                "mean": j(prefix + ".running_mean"),
                "var": j(prefix + ".running_var")}

    def crb(prefix):
        return {"conv": convp(prefix + ".conv"), "bn": bn(prefix + ".bn")}

    def se_res2(prefix):
        n = 0
        while f"{prefix}.Res2Conv1dReluBn.convs.{n}.weight" in sd:
            n += 1
        block = {
            "conv1": crb(prefix + ".Conv1dReluBn1"),
            "res2": {"convs": [
                {"conv": convp(f"{prefix}.Res2Conv1dReluBn.convs.{i}"),
                 "bn": bn(f"{prefix}.Res2Conv1dReluBn.bns.{i}")}
                for i in range(n)]},
            "conv2": crb(prefix + ".Conv1dReluBn2"),
            "se": {"fc1": convp(prefix + ".SE_Connect.linear1"),
                   "fc2": convp(prefix + ".SE_Connect.linear2")},
        }
        if prefix + ".shortcut.weight" in sd:
            block["shortcut"] = convp(prefix + ".shortcut")
        return block

    params = {
        "stem": {"conv": convp("layer1.conv"), "bn": bn("layer1.bn")},
        "layer1": se_res2("layer2"),
        "layer2": se_res2("layer3"),
        "layer3": se_res2("layer4"),
        "agg": convp("conv"),
        "pool": {"att1": convp("pooling.linear1"),
                 "att2": convp("pooling.linear2")},
        "pool_bn": bn("bn"),
        "fc": convp("linear"),
    }
    if "feature_weight" in sd:
        params["feature_weight"] = j("feature_weight")
    return params
