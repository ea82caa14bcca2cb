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
        if e.antialias:
            raise NotImplementedError("antialias configs: Activation1d's "
                                      "replicate-pad filters break streaming "
                                      "window exactness")
        if cfg.train.use_semantic and cfg.train.concat_semantic:
            raise NotImplementedError("concat_semantic tokenization needs "
                                      "the teacher target per frame; no "
                                      "streaming path for it")
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

            lat = C.semantic_vq_in(params, cfg, lat)
            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        new_state = StreamState(
            sample_tail=window[:, :, -self.tail:],
            lstm_state=lstm_state,
            frame_tail=x[:, :, -2:],
        )
        return codes, new_state

    def step(self, state: StreamState, chunk):
        return self._step(self.params, state, chunk)


class SynthState(NamedTuple):
    latent_tail: jnp.ndarray   # (B, C_in, 6) — decoder conv_in k7 lookback
    lstm_state: Any            # list of (h, c) per layer
    post_tail: jnp.ndarray     # (B, D, P) post-LSTM frames (P = stack lookback)
    pos: jnp.ndarray           # frames decoded so far (for startup edge masks)


def _zero_before_start(x, start):
    """Zero positions whose global index is negative (start = global index of
    x[..., 0], traced). Offline causal convs zero-pad at EVERY layer; the
    replay window's pre-stream region must match, and transpose-conv biases
    make it nonzero otherwise (weight-norm conv biases are zeroed by the
    reference init, ConvTranspose biases are not — vq/codec_decoder init)."""
    g = start + jnp.arange(x.shape[-1])
    return x * (g >= 0).astype(x.dtype)


class StreamingSynthesizer:
    """Stateful chunk-by-chunk decoder for `causal: true` BigCodec configs.

    The reverse of StreamingTokenizer: consumes token chunks, emits their
    waveform samples with the same values as offline decoding of the whole
    stream (to fp32 rounding — conv summation order varies with window
    shape). Causality means every emitted sample depends only on already-seen
    frames; the state is (a) the conv_in lookback latents, (b) the ResLSTM
    (h, c), and (c) the last P post-LSTM frames, where P covers the
    upsampling stack's total left receptive field — values closer to the
    window start than each causal conv's own zero padding would corrupt are
    never emitted (the recursion below accumulates that reach per block).
    """

    def __init__(self, params, cfg: Config, *, chunk_frames: int):
        d = cfg.model.codec_decoder
        if d.type != "bigcodec" or not d.causal or d.rnn_bidirectional:
            raise ValueError("streaming synthesis requires a causal "
                             "unidirectional bigcodec decoder config")
        if d.antialias:
            raise NotImplementedError("antialias configs: Activation1d's "
                                      "replicate-pad filters break the "
                                      "startup edge masking")
        self.params = params
        self.cfg = cfg
        self.chunk_frames = chunk_frames
        self.hop = int(np.prod(d.up_ratios))
        # lookback of [blocks + tail conv] in post-LSTM frames: walk the
        # stack backwards; each block maps an output-scale reach r to
        # ceil((r + units_reach)/stride) + tconv's 2-frame reach
        units = sum(6 * dd for dd in d.dilations)  # causal k7: (k-1)*d each
        r = 6  # conv_out k7 causal
        for s in reversed(tuple(d.up_ratios)):
            r = -(-(r + units) // s) + 2
        self.post = r
        self._step = jax.jit(self._step_impl)

    def init_state(self, batch_size: int = 1) -> SynthState:
        d = self.cfg.model.codec_decoder
        ch = d.upsample_initial_channel
        lstm_state = [(jnp.zeros((batch_size, ch), jnp.float32),
                       jnp.zeros((batch_size, ch), jnp.float32))
                      for _ in range(d.rnn_num_layers)]
        return SynthState(
            latent_tail=jnp.zeros((batch_size, d.in_channels, 6), jnp.float32),
            lstm_state=lstm_state,
            post_tail=jnp.zeros((batch_size, ch, self.post), jnp.float32),
            pos=jnp.int32(0),
        )

    def _step_impl(self, params, state: SynthState, codes):
        """codes: (Nq, B, chunk_frames) -> (wav (B, chunk_frames*hop), state)."""
        from . import codec as C

        cfg = self.cfg
        d = cfg.model.codec_decoder
        dec = params["decoder"]
        aa = _AA(d.antialias)
        F = self.chunk_frames
        with jax.default_matmul_precision("float32"):
            emb = C.codes_to_emb(params, cfg, jnp.moveaxis(codes, 0, -1))
            window = jnp.concatenate([state.latent_tail, emb], axis=2)
            x = _wn_conv(window, dec["conv_in"], causal=True)[:, :, -F:]
            if d.use_rnn:
                x, lstm_state = res_lstm_streaming(x, dec["lstm"],
                                                   state.lstm_state,
                                                   num_layers=d.rnn_num_layers)
            else:
                lstm_state = state.lstm_state
            y = jnp.concatenate([state.post_tail, x], axis=2)
            w0 = state.pos - self.post  # global frame index of y[..., 0]
            scale = 1
            from .bigcodec import residual_unit

            for i, stride in enumerate(tuple(d.up_ratios)):
                p = dec["blocks"][i]
                y = aa(y, p["snake"])
                if stride != 1:
                    from ..ops.conv import causal_conv_transpose1d, get_weight

                    y = causal_conv_transpose1d(y, get_weight(p["up"]),
                                                p["up"].get("b"), stride=stride)
                else:
                    from .bigcodec import _wn_tconv

                    y = _wn_tconv(y, p["up"])
                scale *= stride
                y = _zero_before_start(y, w0 * scale)
                for j, dd in enumerate(tuple(d.dilations)):
                    y = residual_unit(y, p["units"][j], dilation=dd,
                                      causal=True, aa=aa)
                    y = _zero_before_start(y, w0 * scale)
            y = aa(y, dec["snake_out"])
            y = _wn_conv(y, dec["conv_out"], causal=True)
            wav = jnp.tanh(y[:, :, -F * self.hop:])
        new_state = SynthState(
            latent_tail=window[:, :, -6:],
            lstm_state=lstm_state,
            post_tail=jnp.concatenate([state.post_tail, x],
                                      axis=2)[:, :, -self.post:],
            pos=state.pos + F,
        )
        return wav[:, 0], new_state

    def step(self, state: SynthState, codes):
        return self._step(self.params, state, codes)
