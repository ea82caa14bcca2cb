"""Chunked (blockwise) tokenization for long audio.

The reference handles long files only by full-length batch-1 eval
(SURVEY.md §5.7 — no sequence parallelism; data policy instead). On TPU,
arbitrary-length jit shapes force recompiles, so this module provides the
idiomatic extension: fixed-size chunked encoding with overlap.

For CAUSAL encoder configs, chunking with left context is exact (the
streaming-causality property is tested in test_parity_variants.py). For
non-causal configs, each chunk is padded with `context` seconds of real
audio on both sides and the context frames are dropped after quantization;
with context >= the encoder's receptive field the interior tokens match the
full-sequence tokens exactly, and edge effects are confined to the first and
last chunk boundaries.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def receptive_field_samples(cfg) -> int:
    """Conservative receptive-field bound of the BigCodec encoder in samples.

    With antialias on, every Activation1d adds its resampling-filter reach
    (2x up + 2x down windowed-sinc pair, ±8 positions at its scale — see
    parallel/sp._AA_REACH): 2 per residual unit + 1 per block + the final
    snake_out, each counted at double reach for margin.
    """
    e = cfg.model.codec_encoder
    if e.type != "bigcodec":
        return 4 * e.n_fft
    aa = 16 if e.antialias else 0  # 2 x _AA_REACH per Activation1d
    rf = 7  # input conv
    stride_prod = 1
    for s in e.up_ratios:
        # 3 residual units (k7, dilations up to 9) + down conv k=2s
        rf += stride_prod * (sum((7 - 1) * d for d in e.dilations) + 2 * s
                             + aa * (2 * len(e.dilations) + 1))
        stride_prod *= s
    rf += stride_prod * (3 + aa)  # final conv k3 + snake_out Activation1d
    return rf


def make_chunked_tokenizer(params, cfg, *, chunk_seconds: float = 10.0,
                           context_seconds: float | None = None):
    """Build a reusable chunked tokenizer: wav (T,) -> (Nq, n_frames).

    The jitted window function is created ONCE here, so repeated calls over a
    corpus share one compile per (chunk, context) geometry — build the
    tokenizer outside the per-file loop.
    """
    from ..models import codec as C

    sr = cfg.dataset.sample_rate
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios)) \
        if cfg.model.codec_encoder.type == "bigcodec" else cfg.model.codec_encoder.hop_length
    chunk = int(chunk_seconds * sr) // hop * hop
    if context_seconds is None:
        ctx = -(-receptive_field_samples(cfg) // hop) * hop
    else:
        ctx = int(context_seconds * sr) // hop * hop

    @jax.jit
    def tok(params, w):
        return C.tokenize(params, cfg, w[None])[:, 0]  # (Nq, frames)

    def run(wav):
        T = len(wav)
        total = -(-T // chunk) * chunk
        padded = np.pad(np.asarray(wav), (ctx, ctx + total - T))
        pieces = []
        for start in range(0, total, chunk):
            window = jnp.asarray(padded[start:start + chunk + 2 * ctx])
            codes = tok(params, window)  # (Nq, (chunk + 2*ctx)/hop)
            c = ctx // hop
            pieces.append(np.asarray(codes[:, c:c + chunk // hop]))
        out = np.concatenate(pieces, axis=1)
        return out[:, :T // hop]

    return run


def tokenize_chunked(params, cfg, wav, *, chunk_seconds: float = 10.0,
                     context_seconds: float | None = None):
    """One-shot convenience wrapper; for corpora use make_chunked_tokenizer."""
    return make_chunked_tokenizer(params, cfg, chunk_seconds=chunk_seconds,
                                  context_seconds=context_seconds)(wav)
