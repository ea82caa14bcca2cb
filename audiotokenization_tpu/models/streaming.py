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
- `frame_tail`: the last post-LSTM frames feeding the causal k=3 output
  conv (and, with antialias, the snake_out Activation1d's past taps).

Antialias configs (vq/alias_free_torch): the Activation1d resampling filters
are SYMMETRIC, so a "causal" antialias model is only causal up to the filter
reach — every emitted frame depends on a bounded window of FUTURE samples.
Streaming therefore runs with a fixed LATENCY of `delay_frames` frames: each
`step` emits the token span that ended `delay_frames` earlier (the leading
`delay_frames` tokens of the stream are warm-up garbage to discard), and
`flush` drains the final `delay_frames` tokens with the true stream end
(where the filters replicate-pad, matching offline). True-edge semantics
inside the rolling window reuse parallel/sp._SPAA. Stream length is capped
at 2**28 samples (the mid-stream "no right edge yet" sentinel bound).

Exactness is proven by test_streaming.py: chunked emission equals offline
`codec.tokenize` token-for-token, for plain AND antialias causal configs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from .bigcodec import _AA, _wn_conv, encoder_block
from ..ops.lstm import res_lstm_streaming

_NO_END = 2 ** 28  # mid-stream sentinel bound: "the right edge is not here yet"


class StreamState(NamedTuple):
    sample_tail: jnp.ndarray          # (B, 1, RF_front [+ delay])
    lstm_state: Any                   # list of (h, c) per layer (or None-like zeros)
    frame_tail: jnp.ndarray           # (B, enc_dim, 2 [+ aa reach])
    pos: Any = 0                      # samples consumed so far (int32 scalar)


def _front_receptive_field(cfg: Config) -> int:
    """Receptive field (samples) of conv_in + encoder blocks (causal); with
    antialias, includes the Activation1d filter reach at every scale (see
    utils/chunked.receptive_field_samples)."""
    e = cfg.model.codec_encoder
    aa = 16 if e.antialias else 0
    rf = 7
    stride_prod = 1
    for s in e.up_ratios:
        rf += stride_prod * (sum((7 - 1) * d for d in e.dilations) + 2 * s
                             + aa * (2 * len(e.dilations) + 1))
        stride_prod *= s
    return rf


def _front_future_reach(cfg: Config) -> int:
    """One-sided FUTURE reach (samples) of the conv front's Activation1d
    filters — zero without antialias (causal convs look left only)."""
    e = cfg.model.codec_encoder
    if not e.antialias:
        return 0
    from ..parallel.sp import _AA_REACH

    ff = 0
    stride_prod = 1
    for _s in e.up_ratios:
        ff += stride_prod * _AA_REACH * (2 * len(e.dilations) + 1)
        stride_prod = stride_prod * _s
    return ff


class StreamingTokenizer:
    """Stateful chunk-by-chunk tokenizer for `causal: true` BigCodec configs."""

    def __init__(self, params, cfg: Config, *, chunk_samples: int):
        e = cfg.model.codec_encoder
        if e.type != "bigcodec" or not e.causal or e.rnn_bidirectional:
            raise ValueError("streaming requires a causal unidirectional "
                             "bigcodec encoder config")
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
        self.antialias = e.antialias
        if e.antialias:
            from ..parallel.sp import _AA_REACH

            self._m = _AA_REACH  # snake_out Activation1d frame-scale reach
            # latency: the conv front's future filter taps + the frame-scale
            # tail Activation1d + 1 frame of window-edge guard
            self.delay_frames = (self._m + 1
                                 + -(-_front_future_reach(self.cfg) // self.hop))
        else:
            self._m = 0
            self.delay_frames = 0
        rf = _front_receptive_field(cfg)
        self.tail = (-(-rf // self.hop) * self.hop
                     + self.delay_frames * self.hop)  # hop-aligned history
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
            frame_tail=jnp.zeros((batch_size, enc_dim, 2 + self._m), jnp.float32),
            pos=jnp.int32(0),
        )

    def _step_impl(self, params, state: StreamState, chunk, end=_NO_END):
        """chunk: (B, chunk_samples) -> (tokens (Nq, B, chunk/hop), new state).

        Without antialias the emitted tokens cover exactly this chunk's
        frames. With antialias they cover the span `delay_frames` earlier
        (fixed latency); `end` is the true stream length in samples once
        known (flush), else the _NO_END sentinel.
        """
        cfg = self.cfg
        e = cfg.model.codec_encoder
        enc = params["encoder"]
        n_frames = self.chunk // self.hop
        with jax.default_matmul_precision("float32"):
            window = jnp.concatenate([state.sample_tail, chunk[:, None, :]], axis=2)
            if not self.antialias:
                aa = _AA(False)
                x = _wn_conv(window, enc["conv_in"], causal=True)
                for i, stride in enumerate(e.up_ratios):
                    x = encoder_block(x, enc["blocks"][i], stride=stride,
                                      dilations=tuple(e.dilations),
                                      causal=True, aa=aa)
                x = x[:, :, -n_frames:]  # exact: RF fully inside the window
                x, lstm_state = res_lstm_streaming(
                    x, enc["lstm"], state.lstm_state,
                    num_layers=e.rnn_num_layers) \
                    if e.use_rnn else (x, state.lstm_state)
                y = jnp.concatenate([state.frame_tail, x], axis=2)
                y = aa(y, enc["snake_out"])
                y = _wn_conv(y, enc["conv_out"], causal=True)
                lat = y[:, :, -n_frames:]
                keepA = x
            else:
                from ..parallel.sp import _SPAA

                m, D = self._m, self.delay_frames
                end_s = jnp.int32(end)
                pos0 = state.pos - self.tail  # global sample idx of window[0]
                x = _wn_conv(window, enc["conv_in"], causal=True)
                S = 1
                for i, stride in enumerate(e.up_ratios):
                    aa_i = _SPAA(True, pos0 // S, end_s // S)
                    x = encoder_block(x, enc["blocks"][i], stride=stride,
                                      dilations=tuple(e.dilations),
                                      causal=True, aa=aa_i)
                    S *= stride
                # window frames; emit span starts at E = pos//hop - D, which
                # sits at the STATIC window offset tail//hop - D
                a = self.tail // self.hop - D
                latA = x[:, :, a:a + n_frames]          # frames [E, E+nf)
                latB = x[:, :, a + n_frames:a + n_frames + m]  # lookahead
                E = state.pos // self.hop - D
                if e.use_rnn:
                    # warm-up: frames with global index < 0 never existed —
                    # they must not advance the LSTM state (offline starts
                    # its scan at frame 0 from the zero state)
                    latA, lstm_state = res_lstm_streaming(
                        latA, enc["lstm"], state.lstm_state,
                        num_layers=e.rnn_num_layers,
                        valid=E + jnp.arange(n_frames) >= 0)
                    latB, _ = res_lstm_streaming(
                        latB, enc["lstm"], lstm_state,
                        num_layers=e.rnn_num_layers,
                        valid=E + n_frames + jnp.arange(m) >= 0)
                else:
                    lstm_state = state.lstm_state
                keepA = latA
                post = jnp.concatenate([state.frame_tail, latA, latB], axis=2)
                gf0 = E - (2 + m)
                aa_t = _SPAA(True, gf0, end_s // self.hop)
                y = aa_t(post, enc["snake_out"])
                from ..ops.conv import conv1d, get_weight

                y = conv1d(y, get_weight(enc["conv_out"]),
                           enc["conv_out"].get("b"), padding=0)
                lat = y[:, :, m:m + n_frames]
            from . import codec as C

            lat = C.semantic_vq_in(params, cfg, lat)
            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        new_state = StreamState(
            sample_tail=window[:, :, -self.tail:],
            lstm_state=lstm_state,
            frame_tail=jnp.concatenate([state.frame_tail, keepA],
                                       axis=2)[:, :, -(2 + self._m):],
            pos=state.pos + self.chunk,
        )
        return codes, new_state

    def step(self, state: StreamState, chunk):
        return self._step(self.params, state, chunk)

    def flush(self, state: StreamState):
        """Drain the `delay_frames` tokens still inside the latency window,
        now that the stream has ended at state.pos samples (the Activation1d
        filters replicate-pad there, matching the offline computation).
        Returns (codes (Nq, B, delay_frames), new_state). No-op (0 frames)
        without antialias."""
        nf = self.chunk // self.hop
        B = state.sample_tail.shape[0]
        if self.delay_frames == 0:
            # empty result, but shaped consistently with step()'s (Nq, B, T)
            # so generic concatenate-all-pieces callers never shape-crash
            d = self.cfg.model.codec_decoder
            q = "fsq" if d.fsq else d.quantizer
            nq = d.vq_num_quantizers if q == "fvq" else 1
            return jnp.zeros((nq, B, 0), jnp.int32), state
        end = state.pos  # true stream length, fixed across the flush steps
        zeros = jnp.zeros((B, self.chunk), jnp.float32)
        outs = []
        got = 0
        while got < self.delay_frames:
            codes, state = self._step(self.params, state, zeros, end)
            outs.append(codes)
            got += nf
        return jnp.concatenate(outs, axis=2)[:, :, :self.delay_frames], state


_NO_END_F = 2 ** 20  # mid-stream sentinel in FRAMES (bound*hop*2 must fit int32)


class SynthState(NamedTuple):
    latent_tail: jnp.ndarray   # (B, C_in, 6) — decoder conv_in k7 lookback
    lstm_state: Any            # list of (h, c) per layer
    post_tail: jnp.ndarray     # (B, D, P) post-LSTM frames (P = stack lookback)
    pos: jnp.ndarray           # frames decoded so far (for startup edge masks)
    front_tail: Any = None     # (B, D, delay) pre-LSTM frames (antialias only)


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
        self.params = params
        self.cfg = cfg
        self.chunk_frames = chunk_frames
        self.hop = int(np.prod(d.up_ratios))
        self.antialias = d.antialias
        if d.antialias:
            from ..parallel.sp import _AA_REACH

            m = _AA_REACH
        else:
            m = 0
        self._m = m
        # lookback of [blocks + tail conv] in post-LSTM frames: walk the
        # stack backwards; each block maps an output-scale reach r to
        # ceil((r + units_reach)/stride) + tconv's 2-frame reach (+ the block
        # Activation1d's filter reach under antialias)
        units = sum(6 * dd + 2 * m for dd in d.dilations)  # causal k7 + AA
        r = 6 + m  # conv_out k7 causal + snake_out Activation1d
        for s in reversed(tuple(d.up_ratios)):
            r = -(-(r + units) // s) + 2 + m
        self.post = r
        if d.antialias:
            # latency: FUTURE reach of the symmetric Activation1d filters
            # through the upsampling stack, in post-LSTM frames (+1 guard)
            units_f = 2 * m * len(d.dilations)
            rf = m  # snake_out
            for s in reversed(tuple(d.up_ratios)):
                rf = -(-(rf + units_f) // s) + m
            self.delay_frames = rf + 1
        else:
            self.delay_frames = 0
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
            front_tail=jnp.zeros((batch_size, ch, self.delay_frames),
                                 jnp.float32),
        )

    def _step_impl(self, params, state: SynthState, codes, end=_NO_END_F):
        """codes: (Nq, B, chunk_frames) -> (wav (B, chunk_frames*hop), state).

        Without antialias the emitted samples cover exactly these frames.
        With antialias they cover the span `delay_frames` frames earlier
        (fixed latency); `end` is the true stream length in FRAMES once
        known (flush), else the _NO_END_F sentinel.
        """
        from . import codec as C

        cfg = self.cfg
        d = cfg.model.codec_decoder
        dec = params["decoder"]
        F = self.chunk_frames
        m, D = self._m, self.delay_frames
        with jax.default_matmul_precision("float32"):
            emb = C.codes_to_emb(params, cfg, jnp.moveaxis(codes, 0, -1))
            emb = C.apply_fc_post_a(params, cfg, emb)  # per-frame linear
            window = jnp.concatenate([state.latent_tail, emb], axis=2)
            x_new = _wn_conv(window, dec["conv_in"], causal=True)[:, :, -F:]
            if not self.antialias:
                if d.use_rnn:
                    x, lstm_state = res_lstm_streaming(
                        x_new, dec["lstm"], state.lstm_state,
                        num_layers=d.rnn_num_layers)
                else:
                    x, lstm_state = x_new, state.lstm_state
                y = jnp.concatenate([state.post_tail, x], axis=2)
                w0 = state.pos - self.post
                front_tail = state.front_tail
                emit_slice = -F * self.hop
            else:
                from ..parallel.sp import _SPAA

                E = state.pos - D
                concatF = jnp.concatenate([state.front_tail, x_new], axis=2)
                segA_in = concatF[:, :, :F]   # frames [E, E+F)
                segB_in = concatF[:, :, F:]   # frames [E+F, E+F+D)
                if d.use_rnn:
                    segA, lstm_state = res_lstm_streaming(
                        segA_in, dec["lstm"], state.lstm_state,
                        num_layers=d.rnn_num_layers,
                        valid=E + jnp.arange(F) >= 0)
                    segB, _ = res_lstm_streaming(
                        segB_in, dec["lstm"], lstm_state,
                        num_layers=d.rnn_num_layers,
                        valid=E + F + jnp.arange(D) >= 0)
                else:
                    segA, segB, lstm_state = segA_in, segB_in, state.lstm_state
                x = segA
                y = jnp.concatenate([state.post_tail, segA, segB], axis=2)
                w0 = E - self.post
                front_tail = concatF[:, :, F:]
                emit_slice = None  # sliced explicitly below
            scale = 1
            end_f = jnp.int32(end)
            from .bigcodec import residual_unit

            for i, stride in enumerate(tuple(d.up_ratios)):
                p = dec["blocks"][i]
                if self.antialias:
                    from ..parallel.sp import _SPAA

                    aa_i = _SPAA(True, w0 * scale, end_f * scale)
                else:
                    aa_i = _AA(False)
                y = aa_i(y, p["snake"])
                if stride != 1:
                    from ..ops.conv import causal_conv_transpose1d, get_weight

                    y = causal_conv_transpose1d(y, get_weight(p["up"]),
                                                p["up"].get("b"), stride=stride)
                else:
                    from .bigcodec import _wn_tconv

                    y = _wn_tconv(y, p["up"])
                scale *= stride
                y = _zero_before_start(y, w0 * scale)
                if self.antialias:
                    aa_u = _SPAA(True, w0 * scale, end_f * scale)
                else:
                    aa_u = aa_i
                for j, dd in enumerate(tuple(d.dilations)):
                    y = residual_unit(y, p["units"][j], dilation=dd,
                                      causal=True, aa=aa_u)
                    y = _zero_before_start(y, w0 * scale)
            if self.antialias:
                from ..parallel.sp import _SPAA

                aa_t = _SPAA(True, w0 * self.hop, end_f * self.hop)
            else:
                aa_t = _AA(False)
            y = aa_t(y, dec["snake_out"])
            y = _wn_conv(y, dec["conv_out"], causal=True)
            if emit_slice is not None:
                wav = jnp.tanh(y[:, :, emit_slice:])
            else:
                p0 = self.post * self.hop
                wav = jnp.tanh(y[:, :, p0:p0 + F * self.hop])
        new_state = SynthState(
            latent_tail=window[:, :, -6:],
            lstm_state=lstm_state,
            post_tail=jnp.concatenate([state.post_tail, x],
                                      axis=2)[:, :, -self.post:],
            pos=state.pos + F,
            front_tail=front_tail,
        )
        return wav[:, 0], new_state

    def step(self, state: SynthState, codes):
        return self._step(self.params, state, codes)

    def flush(self, state: SynthState):
        """Drain the `delay_frames * hop` samples still inside the latency
        window, now that the code stream has ended at state.pos frames.
        Returns (wav (B, delay_frames*hop), new_state); empty without
        antialias."""
        B = state.latent_tail.shape[0]
        if self.delay_frames == 0:
            return jnp.zeros((B, 0), jnp.float32), state
        end = state.pos  # true stream length in frames
        d = self.cfg.model.codec_decoder
        q = "fsq" if d.fsq else d.quantizer
        nq = d.vq_num_quantizers if q == "fvq" else 1
        zeros = jnp.zeros((nq, B, self.chunk_frames), jnp.int32)
        outs = []
        got = 0
        while got < self.delay_frames:
            wav, state = self._step(self.params, state, zeros, end)
            outs.append(wav)
            got += self.chunk_frames
        return (jnp.concatenate(outs, axis=1)
                [:, :self.delay_frames * self.hop], state)


# ===========================================================================
# Streaming causal CONFORMER tokenizer (VERDICT r3 next #4) and
# synthesizer (VERDICT r4 next #2)
# ===========================================================================

def _conformer_layer_step(p, x, kv, carry, *, n_head, L_max, min_row,
                          pos_row, cos, sin, vmask, conv_first):
    """One causal conformer layer over a frame chunk, incremental.

    x: (B, dim, n); kv: per-layer {"k","v"} caches of L_max rows; carry:
    (B, dim, k_dw-1) depthwise-conv ring; pos_row: cache row of the chunk's
    first frame; min_row: rows below this hold no real frame (the
    tokenizer's latency offset; 0 for the synthesizer); vmask: (B, n) False
    on warm-up garbage frames (zeroed so the conv ring sees the offline
    zero padding); conv_first selects the encoder (conv,ffn1,attn,ffn2) vs
    decoder (attn,ffn1,conv,ffn2) ordering (vq/module.py:496-526).
    Returns (x, kv, carry).
    """
    from ..ops.conv import conv1d, get_weight, linear
    from ..ops.transformer import rms_norm, apply_rope

    B, C, n = x.shape

    def norm_t(x, w):
        return jnp.swapaxes(rms_norm(jnp.swapaxes(x, 1, 2), w), 1, 2)

    def conv(x, carry):
        y = norm_t(x, p["conv_norm"])
        out = conv1d(y, get_weight(p["conv"]["pw1"]), p["conv"]["pw1"].get("b"))
        a, b = jnp.split(out, 2, axis=1)
        out = a * jax.nn.sigmoid(b)
        # zero garbage frames: the depthwise causal conv must read the
        # offline left zero padding, not warm-up junk
        out = out * vmask[:, None, :].astype(out.dtype)
        dw = get_weight(p["conv"]["dw"])
        k = dw.shape[-1]
        window = jnp.concatenate([carry, out], axis=2)
        new_carry = window[:, :, -(k - 1):]
        o = conv1d(window, dw, p["conv"]["dw"].get("b"), padding=0,
                   groups=dw.shape[0])  # (B, C, n) — causal via carry
        o = norm_t(o, p["conv"]["norm"])
        o = jax.nn.silu(o)
        o = conv1d(o, get_weight(p["conv"]["pw2"]), p["conv"]["pw2"].get("b"))
        return x + o, new_carry

    def attn(x, kv):
        y = jnp.swapaxes(norm_t(x, p["attn_norm"]), 1, 2)  # (B, n, C)
        qkv = linear(y, p["attn"]["qkv"]).reshape(B, n, 3, n_head, C // n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rms_norm(q)
        k = rms_norm(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kv = {"k": jax.lax.dynamic_update_slice(kv["k"], k, (0, pos_row, 0, 0)),
              "v": jax.lax.dynamic_update_slice(kv["v"], v, (0, pos_row, 0, 0))}
        # causal prefix mask in cache-row space: row r holds frame
        # r - min_row; query j attends rows [min_row, pos_row + j] —
        # leading masked rows contribute exact zeros, so the softmax
        # matches offline key order bit for bit
        rows = jnp.arange(L_max)
        qpos_row = pos_row + jnp.arange(n)
        mask = ((rows[None, :] >= min_row)
                & (rows[None, :] <= qpos_row[:, None]))  # (n, L)
        out = jax.nn.dot_product_attention(
            q, kv["k"], kv["v"], mask=mask[None, None])  # (B, n, H, D)
        out = linear(out.reshape(B, n, C), p["attn"]["out"])
        return x + jnp.swapaxes(out, 1, 2), kv

    def ffn(x, fp, w):
        y = rms_norm(jnp.swapaxes(x, 1, 2), w)
        from ..ops.transformer import feed_forward

        return x + jnp.swapaxes(feed_forward(y, fp), 1, 2)

    if conv_first:
        x, carry = conv(x, carry)
        x = ffn(x, p["ffn1"], p["ffn1_norm"])
        x, kv = attn(x, kv)
    else:
        x, kv = attn(x, kv)
        x = ffn(x, p["ffn1"], p["ffn1_norm"])
        x, carry = conv(x, carry)
    x = ffn(x, p["ffn2"], p["ffn2_norm"])
    return x, kv, carry

class ConformerStreamState(NamedTuple):
    sample_tail: jnp.ndarray   # (B, T_keep) raw samples before the next chunk
    kv_cache: Any              # per layer {"k": (B, L, H, D), "v": (B, L, H, D)}
    conv_carry: Any            # per layer (B, dim, k_dw - 1) GLU-output history
    pos: Any = 0               # samples consumed so far (int32 scalar)


class StreamingConformerTokenizer:
    """Chunk-by-chunk tokenizer for `causal: true` conformer_stft configs.

    The causal conformer is incremental by construction everywhere except
    two places, both carried as state:
      - causal self-attention: per-layer KV caches (the token-LM's KV-decode
        machinery generalized to multi-frame chunks; RoPE/qk-rmsnorm applied
        at absolute positions, keys masked to the causal prefix);
      - the conv module's depthwise k-wide causal conv: a (k-1)-frame ring
        of GLU outputs per layer.

    The STFT front is NOT causal: frame t's analysis window spans samples
    [t*hop - P, t*hop - P + win), P = (win-hop)/2 (codec_encoder.py:92-122
    pads P constant zeros both sides) — an intrinsic lookahead of win-P-hop
    samples. Streaming therefore emits with a fixed latency of
    `delay_frames = ceil((win-P-hop)/hop)` frames: each step emits the
    chunk's frame span shifted `delay_frames` earlier (the leading
    delay_frames tokens of the stream are warm-up garbage to discard), and
    `flush()` drains the final delay_frames with the true end-of-stream
    zero padding. Token-for-token equal to offline codec.tokenize
    (test_streaming_conformer.py).

    Stream length is capped at `max_seq_len` frames (the offline RoPE table
    bound, config1/model/base.yaml:17).
    """

    def __init__(self, params, cfg: Config, *, chunk_samples: int):
        e = cfg.model.codec_encoder
        if e.type != "conformer_stft" or not e.causal:
            raise ValueError("streaming conformer requires a causal "
                             "conformer_stft encoder config")
        if cfg.train.use_semantic and cfg.train.concat_semantic:
            raise NotImplementedError("concat_semantic tokenization needs "
                                      "the teacher target per frame; no "
                                      "streaming path for it")
        if getattr(e, "ffn_type", "dense") == "moe":
            raise NotImplementedError(
                "streaming conformer covers dense-FFN configs; MoE capacity "
                "routing is batch/chunk-global (ops/moe.py)")
        self.params = params
        self.cfg = cfg
        self.hop = e.hop_length
        self.win = e.window_size
        if e.n_fft != e.window_size:
            raise NotImplementedError("streaming assumes n_fft == window_size "
                                      "(every reference conformer config)")
        if chunk_samples % self.hop != 0:
            raise ValueError(f"chunk_samples must be a multiple of hop {self.hop}")
        self.chunk = chunk_samples
        self.n_frames = chunk_samples // self.hop
        self.P = (self.win - self.hop) // 2
        self.delay_frames = max(0, -(-(self.win - self.P - self.hop) // self.hop))
        # history: enough raw samples that the oldest emitted frame's window
        # starts inside the buffer
        self.tail = self.delay_frames * self.hop + self.P
        self.L_max = e.max_seq_len + self.delay_frames  # cache rows (row = frame + delay)
        # host-side stream-length guard: past max_seq_len frames the KV
        # write would clamp (silent token corruption) and the RoPE table has
        # no rows; count frames fed through this instance (linear-stream
        # usage; forked states share the conservative bound)
        self._frames_fed = 0
        self._step = jax.jit(self._step_impl)
        self._flush_step = jax.jit(self._step_impl)  # distinct chunk shape

    def init_state(self, batch_size: int = 1) -> ConformerStreamState:
        e = self.cfg.model.codec_encoder
        H, D = e.n_head, e.dim // e.n_head
        kv = [{"k": jnp.zeros((batch_size, self.L_max, H, D), jnp.float32),
               "v": jnp.zeros((batch_size, self.L_max, H, D), jnp.float32)}
              for _ in range(e.n_layers)]
        carry = [jnp.zeros((batch_size, e.dim, e.conv_kernel_size - 1),
                           jnp.float32) for _ in range(e.n_layers)]
        return ConformerStreamState(
            sample_tail=jnp.zeros((batch_size, self.tail), jnp.float32),
            kv_cache=kv, conv_carry=carry, pos=jnp.int32(0))

    # -- one conformer layer, incremental ----------------------------------
    def _layer_step(self, p, x, kv, carry, *, pos_row, f0, cos, sin, vmask):
        """x: (B, dim, n) frames [f0, f0+n); pos_row: cache row of frame f0;
        vmask: (B, n) False on warm-up garbage frames (zeroed so the conv
        ring sees the offline zero padding). Returns (x, kv, carry)."""
        return _conformer_layer_step(
            p, x, kv, carry, n_head=self.cfg.model.codec_encoder.n_head,
            L_max=self.L_max, min_row=self.delay_frames, pos_row=pos_row,
            cos=cos, sin=sin, vmask=vmask, conv_first=True)

    def _step_impl(self, params, state: ConformerStreamState, chunk):
        """chunk: (B, S) -> (tokens (Nq, B, S//hop), new state); the tokens
        cover the frame span `delay_frames` earlier (fixed latency)."""
        from ..models import codec as C
        from ..ops.conv import conv1d, get_weight
        from ..ops.stft import hann_window
        from ..ops.transformer import precompute_rope, rms_norm

        cfg = self.cfg
        e = cfg.model.codec_encoder
        enc = params["encoder"]
        B, S = chunk.shape
        n = S // self.hop
        with jax.default_matmul_precision("float32"):
            buf = jnp.concatenate([state.sample_tail, chunk], axis=1)
            # frames [f0, f0+n), f0 = pos//hop - delay; frame f0+j's window
            # begins at buffer offset j*hop (tail = delay*hop + P)
            idx = (self.hop * jnp.arange(n)[:, None]
                   + jnp.arange(self.win)[None, :])  # (n, win)
            frames = buf[:, idx]  # (B, n, win)
            win_fn = hann_window(self.win)
            spec = jnp.fft.rfft(frames * win_fn[None, None, :], n=e.n_fft,
                                axis=-1)  # (B, n, F)
            feats = jnp.concatenate([spec.real, spec.imag], axis=-1)  # (B, n, 2F)
            feats = jnp.swapaxes(feats, 1, 2).astype(jnp.float32)
            h = conv1d(feats, get_weight(enc["input_proj"]),
                       enc["input_proj"].get("b"))
            h = jnp.swapaxes(
                rms_norm(jnp.swapaxes(h, 1, 2), enc["input_norm"]), 1, 2)

            f0 = state.pos // self.hop - self.delay_frames
            pos_row = state.pos // self.hop  # = f0 + delay
            vmask = (f0 + jnp.arange(n))[None, :] >= 0  # (1, n) warm-up guard
            vmask = jnp.broadcast_to(vmask, (B, n))
            cos_t, sin_t = precompute_rope(e.dim // e.n_head,
                                           self.L_max, e.rope_theta)
            # RoPE rows at absolute FRAME positions (clamped during warm-up;
            # those frames are masked garbage either way)
            fpos = jnp.clip(f0 + jnp.arange(n), 0, e.max_seq_len - 1)
            cos_c, sin_c = cos_t[fpos], sin_t[fpos]

            kv_new, carry_new = [], []
            for li in range(e.n_layers):
                h, kv_l, c_l = self._layer_step(
                    enc["backbone"]["layers"][li], h, state.kv_cache[li],
                    state.conv_carry[li], pos_row=pos_row, f0=f0,
                    cos=cos_c, sin=sin_c, vmask=vmask)
                kv_new.append(kv_l)
                carry_new.append(c_l)
            h = jnp.swapaxes(
                rms_norm(jnp.swapaxes(h, 1, 2), enc["norm"]), 1, 2)
            if "output_proj" in enc:
                h = conv1d(h, get_weight(enc["output_proj"]),
                           enc["output_proj"].get("b"))
            lat = C.semantic_vq_in(params, cfg, h)
            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        new_state = ConformerStreamState(
            sample_tail=buf[:, -self.tail:],
            kv_cache=kv_new, conv_carry=carry_new,
            pos=state.pos + S)
        return codes, new_state

    def step(self, state: ConformerStreamState, chunk):
        self._frames_fed += chunk.shape[-1] // self.hop
        if self._frames_fed > self.cfg.model.codec_encoder.max_seq_len:
            raise ValueError(
                f"stream exceeds max_seq_len="
                f"{self.cfg.model.codec_encoder.max_seq_len} frames (the "
                "offline RoPE/attention bound); restart with init_state or "
                "raise codec_encoder.max_seq_len")
        return self._step(self.params, state, chunk)

    def flush(self, state: ConformerStreamState):
        """Drain the last `delay_frames` tokens: the stream has ended, so
        the remaining frames' windows read the offline right zero padding.
        Returns (tokens (Nq, B, delay_frames), new_state)."""
        B = state.sample_tail.shape[0]
        if self.delay_frames == 0:
            d = self.cfg.model.codec_decoder
            nq = d.vq_num_quantizers if (not d.fsq and d.quantizer == "fvq") else 1
            return jnp.zeros((nq, B, 0), jnp.int32), state
        zeros = jnp.zeros((B, self.delay_frames * self.hop), jnp.float32)
        return self._flush_step(self.params, state, zeros)


class ConformerSynthState(NamedTuple):
    kv_cache: Any              # per layer {"k","v"} (B, L_max, H, D)
    conv_carry: Any            # per layer (B, dim, k_dw - 1)
    ola_tail: jnp.ndarray      # (B, win - hop) overlap-add numerator carry
    env_tail: jnp.ndarray      # (win - hop,) NOLA window-envelope carry
    pos: Any = 0               # frames consumed so far (int32 scalar)


class StreamingConformerSynthesizer:
    """Chunk-by-chunk decoder for `causal: true` conformer_istft configs
    (VERDICT r4 next #2 — the decode-side mirror of
    StreamingConformerTokenizer).

    The causal decoder backbone (attn, ffn1, conv, ffn2 ordering,
    vq/codec_decoder.py:385-528) is incremental via the same per-layer KV
    caches and depthwise-conv rings as the tokenizer; frames map 1:1 to
    tokens with NO backbone latency. The only lookahead is the ISTFTHead's
    "same"-padding NOLA overlap-add (codec_decoder.py:145-274): sample s
    needs every frame whose window covers s + P, P = (win - hop)/2, so the
    stream runs with a fixed latency of `delay_samples = P` SAMPLES. Each
    step emits chunk_frames*hop samples covering the span P samples
    earlier (the leading P emitted samples are warm-up garbage to
    discard — they correspond to the region offline trims), and `flush()`
    drains the final P samples with the true end-of-stream envelope.

    Exactness: the step carries BOTH the overlap-add numerator and the
    window-envelope denominator, so stream start/end envelopes (fewer
    window^2 contributions) match offline `codec.decode` bit for bit; the
    division happens only once all contributing frames have been added.
    Chunked waveform == offline decode to fp32 rounding
    (test_streaming_conformer.py).

    When chaining from StreamingConformerTokenizer, DROP its leading
    `delay_frames` warm-up tokens before feeding them here: this decoder
    is causal, so garbage frames would pollute the KV caches and conv
    rings for every later frame (see examples/streaming_demo.py).
    """

    def __init__(self, params, cfg: Config, *, chunk_frames: int):
        d = cfg.model.codec_decoder
        if d.type != "conformer_istft" or not d.causal:
            raise ValueError("streaming conformer synthesis requires a "
                             "causal conformer_istft decoder config")
        if getattr(d, "ffn_type", "dense") == "moe":
            raise NotImplementedError(
                "streaming conformer covers dense-FFN configs; MoE capacity "
                "routing is batch/chunk-global (ops/moe.py)")
        if d.n_fft != d.window_size:
            raise NotImplementedError("streaming assumes n_fft == window_size "
                                      "(every reference conformer config)")
        self.params = params
        self.cfg = cfg
        self.hop = d.hop_length
        self.win = d.window_size
        self.chunk_frames = chunk_frames
        self.P = (self.win - self.hop) // 2
        self.delay_samples = self.P
        self.L_max = d.max_seq_len
        self._frames_fed = 0
        self._step = jax.jit(self._step_impl)

    def init_state(self, batch_size: int = 1) -> ConformerSynthState:
        d = self.cfg.model.codec_decoder
        H, Dh = d.n_head, d.dim // d.n_head
        kv = [{"k": jnp.zeros((batch_size, self.L_max, H, Dh), jnp.float32),
               "v": jnp.zeros((batch_size, self.L_max, H, Dh), jnp.float32)}
              for _ in range(d.n_layers)]
        carry = [jnp.zeros((batch_size, d.dim, d.conv_kernel_size - 1),
                           jnp.float32) for _ in range(d.n_layers)]
        return ConformerSynthState(
            kv_cache=kv, conv_carry=carry,
            ola_tail=jnp.zeros((batch_size, self.win - self.hop), jnp.float32),
            env_tail=jnp.zeros((self.win - self.hop,), jnp.float32),
            pos=jnp.int32(0))

    def _step_impl(self, params, state: ConformerSynthState, codes):
        """codes: (Nq, B, n) -> (wav (B, n*hop), new state); the samples
        cover the span `delay_samples` earlier (fixed latency)."""
        from ..models import codec as C
        from ..ops.conv import conv1d, get_weight, linear
        from ..ops.stft import hann_window
        from ..ops.transformer import precompute_rope, rms_norm

        cfg = self.cfg
        d = cfg.model.codec_decoder
        dec = params["decoder"]
        n = codes.shape[-1]
        B = codes.shape[1]
        hop, win = self.hop, self.win
        with jax.default_matmul_precision("float32"):
            emb = C.codes_to_emb(params, cfg, jnp.moveaxis(codes, 0, -1))
            h = C.apply_fc_post_a(params, cfg, emb)  # (B, C_in, n)
            if "input_proj" in dec:
                h = conv1d(h, get_weight(dec["input_proj"]),
                           dec["input_proj"].get("b"))
            f0 = state.pos  # absolute frame index of the chunk's first frame
            cos_t, sin_t = precompute_rope(d.dim // d.n_head,
                                           self.L_max, d.rope_theta)
            fpos = f0 + jnp.arange(n)
            cos_c, sin_c = cos_t[fpos], sin_t[fpos]
            vmask = jnp.ones((B, n), bool)  # no warm-up frames decode-side
            kv_new, carry_new = [], []
            for li in range(d.n_layers):
                h, kv_l, c_l = _conformer_layer_step(
                    dec["backbone"]["layers"][li], h, state.kv_cache[li],
                    state.conv_carry[li], n_head=d.n_head, L_max=self.L_max,
                    min_row=0, pos_row=f0, cos=cos_c, sin=sin_c,
                    vmask=vmask, conv_first=False)
                kv_new.append(kv_l)
                carry_new.append(c_l)
            y = rms_norm(jnp.swapaxes(h, 1, 2), dec["norm"])  # (B, n, dim)
            # ISTFTHead (codec_decoder.py:229-274), streaming overlap-add
            pred = linear(y, dec["head_out"])  # (B, n, n_fft + 2)
            mag, phase = jnp.split(pred, 2, axis=2)
            mag = jnp.minimum(jnp.exp(mag), 1e2)
            spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))  # (B, n, F)
            window_fn = hann_window(win)
            frames = jnp.fft.irfft(spec, n=win, axis=2) * window_fn[None, None, :]
            from ..ops.stft import _overlap_add

            L = n * hop + (win - hop)
            buf = _overlap_add(frames.astype(jnp.float32), hop, L)  # (B, L)
            buf = buf.at[:, :win - hop].add(state.ola_tail)
            w2 = window_fn * window_fn
            envb = _overlap_add(jnp.broadcast_to(w2[None, :], (n, win))[None],
                                hop, L)[0]  # (L,)
            envb = envb.at[:win - hop].add(state.env_tail)
            # positions [0, n*hop) now have every contributing frame
            wav = buf[:, :n * hop] / jnp.maximum(envb[:n * hop],
                                                 jnp.finfo(jnp.float32).tiny)
        new_state = ConformerSynthState(
            kv_cache=kv_new, conv_carry=carry_new,
            ola_tail=buf[:, n * hop:], env_tail=envb[n * hop:],
            pos=state.pos + n)
        return wav, new_state

    def step(self, state: ConformerSynthState, codes):
        self._frames_fed += codes.shape[-1]
        if self._frames_fed > self.L_max:
            raise ValueError(
                f"stream exceeds max_seq_len={self.L_max} frames (the "
                "offline RoPE/attention bound); restart with init_state or "
                "raise codec_decoder.max_seq_len")
        return self._step(self.params, state, codes)

    def flush(self, state: ConformerSynthState):
        """Drain the `delay_samples` samples still inside the latency
        window: the stream has ended at state.pos frames, so the carried
        envelope is final (it is exactly the offline end-of-signal NOLA
        envelope). Returns (wav (B, delay_samples), new_state)."""
        wav = (state.ola_tail[:, :self.P]
               / jnp.maximum(state.env_tail[None, :self.P],
                             jnp.finfo(jnp.float32).tiny))
        return wav, state


def stream_decode(params, cfg: Config, codes, *, chunk_frames: int):
    """Decode a whole token stream chunk-by-chunk through the streaming
    synthesizer of the config's family (`causal: true` required); returns
    (B, T_frames * hop) waveform equal to offline decode (fp32 rounding).

    The streaming runtime's offline driver: the warm-up/latency/flush
    bookkeeping (leading `delay` samples discarded, tail drained at stream
    end) is handled here, and a trailing partial chunk gets its own
    synthesizer instance (states are chunk-size-independent, so they flow
    across). This is what `cli/synthesize.py --streaming` runs; it is also
    the template for a live serving loop (feed chunks as they arrive
    instead of slicing a stored stream).
    """
    import numpy as np

    d = cfg.model.codec_decoder
    conformer = d.type == "conformer_istft"
    mk = (lambda n: (StreamingConformerSynthesizer(params, cfg, chunk_frames=n)
                     if conformer else
                     StreamingSynthesizer(params, cfg, chunk_frames=n)))
    syn = mk(chunk_frames)
    T = int(codes.shape[-1])
    B = int(codes.shape[1])
    hop = syn.hop
    state = syn.init_state(batch_size=B)
    pieces = []
    t = 0
    while t + chunk_frames <= T:
        wav, state = syn.step(state, jnp.asarray(codes[:, :, t:t + chunk_frames]))
        pieces.append(np.asarray(wav))
        t += chunk_frames
    if t < T:
        rem = mk(T - t)
        rem._frames_fed = t  # the max_seq_len guard counts the WHOLE stream
        wav, state = rem.step(state, jnp.asarray(codes[:, :, t:]))
        pieces.append(np.asarray(wav))
        syn = rem  # flush with the instance that owns the final geometry
    tail, _ = syn.flush(state)
    pieces.append(np.asarray(tail))
    skip = syn.delay_samples if conformer else syn.delay_frames * hop
    out = np.concatenate([p for p in pieces if p.size], axis=1)
    return out[:, skip:skip + T * hop]
