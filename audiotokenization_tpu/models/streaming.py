"""Real-time streaming tokenization for causal codec configs.

The reference exposes `causal` flags (streaming-style convs,
BigCodec_SSL/vq/module.py:11-57) but ships no streaming runtime — clips are
always processed whole. This module provides the TPU-idiomatic streaming
API the causal variants exist for: a fixed-shape, jittable `step` that
consumes audio chunks and emits their token ids with EXACTLY the same values
as offline tokenization of the whole stream.

State carried between steps:
- `sample_tail`: the last RF_front input samples (re-fed so the causal conv
  stack's left zero-padding never clips a live receptive field; the window
  start stays hop-aligned so stride phases match the full stream);
- per-layer LSTM (h, c) — the ResLSTM is unidirectional with unbounded
  memory, so its state must be carried, not replayed;
- `frame_tail`: the last 2 post-LSTM frames feeding the causal k=3 output
  conv.

Exactness is proven by test_streaming.py: chunked emission equals offline
`codec.tokenize` token-for-token.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from .bigcodec import _AA, _wn_conv, encoder_block
from ..ops.lstm import res_lstm_streaming
from ..ops import snake as SN


class StreamState(NamedTuple):
    sample_tail: jnp.ndarray          # (B, 1, RF_front)
    lstm_state: Any                   # list of (h, c) per layer (or None-like zeros)
    frame_tail: jnp.ndarray           # (B, enc_dim, 2)


def _front_receptive_field(cfg: Config) -> int:
    """Receptive field (samples) of conv_in + encoder blocks (causal)."""
    e = cfg.model.codec_encoder
    rf = 7
    stride_prod = 1
    for s in e.up_ratios:
        rf += stride_prod * (sum((7 - 1) * d for d in e.dilations) + 2 * s)
        stride_prod *= s
    return rf


class StreamingTokenizer:
    """Stateful chunk-by-chunk tokenizer for `causal: true` BigCodec configs."""

    def __init__(self, params, cfg: Config, *, chunk_samples: int):
        e = cfg.model.codec_encoder
        if e.type != "bigcodec" or not e.causal or e.rnn_bidirectional:
            raise ValueError("streaming requires a causal unidirectional "
                             "bigcodec encoder config")
        self.params = params
        self.cfg = cfg
        self.hop = int(np.prod(e.up_ratios))
        if chunk_samples % self.hop != 0:
            raise ValueError(f"chunk_samples must be a multiple of hop {self.hop}")
        self.chunk = chunk_samples
        rf = _front_receptive_field(cfg)
        self.tail = -(-rf // self.hop) * self.hop  # hop-aligned RF cover
        self._step = jax.jit(self._step_impl)

    def init_state(self, batch_size: int = 1) -> StreamState:
        e = self.cfg.model.codec_encoder
        enc_dim = e.ngf * (2 ** len(e.up_ratios))
        hid = enc_dim
        lstm_state = [(jnp.zeros((batch_size, hid), jnp.float32),
                       jnp.zeros((batch_size, hid), jnp.float32))
                      for _ in range(e.rnn_num_layers)]
        return StreamState(
            sample_tail=jnp.zeros((batch_size, 1, self.tail), jnp.float32),
            lstm_state=lstm_state,
            frame_tail=jnp.zeros((batch_size, enc_dim, 2), jnp.float32),
        )

    def _step_impl(self, params, state: StreamState, chunk):
        """chunk: (B, chunk_samples) -> (tokens (Nq, B, chunk/hop), new state)."""
        cfg = self.cfg
        e = cfg.model.codec_encoder
        enc = params["encoder"]
        aa = _AA(e.antialias)
        with jax.default_matmul_precision("float32"):
            window = jnp.concatenate([state.sample_tail, chunk[:, None, :]], axis=2)
            x = _wn_conv(window, enc["conv_in"], causal=True)
            for i, stride in enumerate(e.up_ratios):
                x = encoder_block(x, enc["blocks"][i], stride=stride,
                                  dilations=tuple(e.dilations), causal=True, aa=aa)
            n_frames = self.chunk // self.hop
            x = x[:, :, -n_frames:]  # exact frames: RF fully inside the window
            x, lstm_state = res_lstm_streaming(x, enc["lstm"], state.lstm_state,
                                               num_layers=e.rnn_num_layers) \
                if e.use_rnn else (x, state.lstm_state)
            y = jnp.concatenate([state.frame_tail, x], axis=2)
            y = aa(y, enc["snake_out"])
            y = _wn_conv(y, enc["conv_out"], causal=True)
            lat = y[:, :, -n_frames:]
            from . import codec as C

            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        new_state = StreamState(
            sample_tail=window[:, :, -self.tail:],
            lstm_state=lstm_state,
            frame_tail=x[:, :, -2:],
        )
        return codes, new_state

    def step(self, state: StreamState, chunk):
        return self._step(self.params, state, chunk)
