"""ECAPA-TDNN speaker embedding model (speaker-verification suite).

Reference capability: BigCodec_SSL/speaker_verification/models/ecapa_tdnn.py
(third-party UniSpeech tooling) — an ECAPA-TDNN over fbank (or SSL) features:
stem conv -> 3 SE-Res2Net blocks (dilations 2/3/4) -> 1536-ch aggregation
conv -> attentive statistics pooling (context-aware mean+std attention) ->
linear embedding. Used by verification.py / spk_sim.py to score cosine
similarity between original and reconstructed speech (the codec's
speaker-preservation metric).

This is a native JAX implementation of the ECAPA-TDNN architecture family
(the reference's exact variant differs in block-internal op order and
depends on torchaudio + s3prl, neither present in this image; its pretrained
checkpoint is also listed as a missing blob upstream). Without trained
weights, `speaker_similarity` only supports smoke tests — the CLI refuses
to report absolute numbers unless a checkpoint is supplied.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, init_conv1d, init_linear, linear
from ..ops.stft import mel_filterbank, stft


def log_mel_fbank(wav, *, sample_rate: int = 16000, n_mels: int = 80,
                  n_fft: int = 512, hop: int = 160, win: int = 400):
    """Kaldi-style log-mel filterbank features. wav: (B, T) -> (B, n_mels, F)."""
    s = stft(wav, n_fft=n_fft, hop_length=hop, win_length=win, center=True,
             pad_mode="reflect")
    power = s.real ** 2 + s.imag ** 2
    fb = mel_filterbank(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                        fmin=20.0)
    mel = jnp.einsum("mf,bft->bmt", fb, power)
    feats = jnp.log(jnp.maximum(mel, 1e-6))
    return feats - jnp.mean(feats, axis=-1, keepdims=True)  # CMN


def mfcc(wav, *, sample_rate: int = 16000, n_mfcc: int = 40, n_mels: int = 128,
         n_fft: int = 512, hop: int = 160, win: int = 400):
    """MFCC features matching the reference's torchaudio MFCC construction
    (speaker_verification/models/ecapa_tdnn.py:183-193): power mel spectrogram
    over an HTK-scale unnormalized filterbank (f_min 0, f_max sr/2, the
    torchaudio melkwargs), power-dB (10*log10, amin 1e-10, top_db 80 per
    sample — log_mels=False), then orthonormal DCT-II. Cepstral-mean
    normalized at the end (our stand-in for the reference's InstanceNorm1d,
    same as the fbank path). wav: (B, T) -> (B, n_mfcc, F).
    """
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
    feats = jnp.einsum("km,bmt->bkt", dct, db)
    return feats - jnp.mean(feats, axis=-1, keepdims=True)  # CMN


def ssl_weighted_features(hidden_states, feature_weight):
    """s3prl-style SSL frontend: softmax layer-weighted sum of hidden states
    (speaker_verification/models/ecapa_tdnn.py:260-269).

    hidden_states: list/stack of (B, T, D); feature_weight: (L,) learnable.
    Returns (B, D, T) cepstral-mean-normalized features for the ECAPA stem
    (init the model with n_mels=D). Any SSL teacher works — the in-repo
    native w2v-bert (models/w2v_bert.py, output_layer=None) is the natural
    choice in this framework.
    """
    hs = jnp.stack(list(hidden_states), axis=0)  # (L, B, T, D)
    w = jax.nn.softmax(feature_weight)[:, None, None, None]
    x = jnp.sum(w * hs, axis=0)
    x = jnp.swapaxes(x, 1, 2) + 1e-6  # (B, D, T)
    return x - jnp.mean(x, axis=-1, keepdims=True)  # CMN


def _bn(p, x):
    """BatchNorm1d in inference form: scale/shift with running stats. x: (B,C,T)."""
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"][None, :, None]) * (inv * p["gamma"])[None, :, None] \
        + p["beta"][None, :, None]


def _conv_bn_relu(p, x, *, dilation=1):
    w = p["conv"]["w"]
    pad = (w.shape[-1] - 1) // 2 * dilation
    x = conv1d(x, w, p["conv"].get("b"), padding=pad, dilation=dilation)
    return jax.nn.relu(_bn(p["bn"], x))


def _se_block(p, x):
    s = jnp.mean(x, axis=-1)  # (B, C)
    s = jax.nn.relu(linear(s, p["fc1"]))
    s = jax.nn.sigmoid(linear(s, p["fc2"]))
    return x * s[:, :, None]


def _res2net_block(p, x, *, scale: int = 8, dilation: int = 1):
    """SE-Res2Net block: 1x1 -> split-scale k3 convs with cascade -> 1x1 -> SE."""
    residual = x
    out = _conv_bn_relu(p["conv1"], x)
    chunks = jnp.split(out, scale, axis=1)
    outs = [chunks[0]]
    sp = None
    for i in range(1, scale):
        sp = chunks[i] if sp is None else sp + chunks[i]
        sp = _conv_bn_relu(p["convs"][i - 1], sp, dilation=dilation)
        outs.append(sp)
    out = jnp.concatenate(outs, axis=1)
    out = _conv_bn_relu(p["conv3"], out)
    out = _se_block(p["se"], out)
    return out + residual


def _attentive_stats_pool(p, x):
    """Context-aware attentive mean+std pooling. x: (B, C, T) -> (B, 2C)."""
    B, C, T = x.shape
    mean = jnp.broadcast_to(jnp.mean(x, -1, keepdims=True), x.shape)
    std = jnp.broadcast_to(jnp.sqrt(jnp.var(x, -1, keepdims=True) + 1e-7), x.shape)
    ctx = jnp.concatenate([x, mean, std], axis=1)
    att = conv1d(ctx, p["att1"]["w"], p["att1"].get("b"))
    att = jnp.tanh(att)
    att = conv1d(att, p["att2"]["w"], p["att2"].get("b"))
    att = jax.nn.softmax(att, axis=-1)
    mu = jnp.sum(x * att, axis=-1)
    sg = jnp.sqrt(jnp.maximum(jnp.sum(x * x * att, axis=-1) - mu * mu, 1e-7))
    return jnp.concatenate([mu, sg], axis=1)


def ecapa_tdnn_embed(params, feats):
    """feats: (B, n_mels, T) -> speaker embedding (B, emb_dim)."""
    x = _conv_bn_relu(params["stem"], feats)
    x1 = _res2net_block(params["layer1"], x, dilation=2)
    x2 = _res2net_block(params["layer2"], x1, dilation=3)
    x3 = _res2net_block(params["layer3"], x2, dilation=4)
    cat = jnp.concatenate([x1, x2, x3], axis=1)
    x = jax.nn.relu(conv1d(cat, params["agg"]["w"], params["agg"].get("b")))
    pooled = _attentive_stats_pool(params["pool"], x)
    pooled = (pooled - params["pool_bn"]["mean"]) * (
        jax.lax.rsqrt(params["pool_bn"]["var"] + 1e-5) * params["pool_bn"]["gamma"]) \
        + params["pool_bn"]["beta"]
    return linear(pooled, params["fc"])


def extract_features(wav, *, feat_type: str = "fbank", sample_rate: int = 16000,
                     ssl_fn=None, feature_weight=None):
    """Frontend dispatch mirroring get_feat (ecapa_tdnn.py:247-271):
    'fbank' | 'mfcc' | 'ssl' (ssl_fn: wav (B,T) -> list of (B,T,D) hiddens)."""
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


def _init_bn(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_ecapa_tdnn(key, *, n_mels: int = 80, channels: int = 512,
                    emb_dim: int = 192, scale: int = 8):
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    def conv_bn(cin, cout, k):
        return {"conv": init_conv1d(next(ki), cin, cout, k, torch_default=True),
                "bn": _init_bn(cout)}

    def res2(c, k=3):
        width = c // scale
        return {
            "conv1": conv_bn(c, c, 1),
            "convs": [conv_bn(width, width, k) for _ in range(scale - 1)],
            "conv3": conv_bn(c, c, 1),
            "se": {"fc1": init_linear(next(ki), c, c // 8),
                   "fc2": init_linear(next(ki), c // 8, c)},
        }

    cat = channels * 3
    return {
        "stem": conv_bn(n_mels, channels, 5),
        "layer1": res2(channels),
        "layer2": res2(channels),
        "layer3": res2(channels),
        "agg": init_conv1d(next(ki), cat, 1536, 1, torch_default=True),
        "pool": {"att1": init_conv1d(next(ki), 1536 * 3, 128, 1, torch_default=True),
                 "att2": init_conv1d(next(ki), 128, 1536, 1, torch_default=True)},
        "pool_bn": _init_bn(1536 * 2),
        "fc": init_linear(next(ki), 1536 * 2, emb_dim),
    }
