"""Sequence-parallel long-audio tokenization over a device mesh.

The reference has no sequence parallelism — long files are handled by data
policy (1 s training crops, full-length batch-1 eval; SURVEY.md §5.7). On a
TPU slice the idiomatic extension is to shard ONE long utterance across the
mesh: every chip runs the convolutional encoder front on its own time-slice
(the FLOP-dominant ~90% of tokenization, embarrassingly parallel once halos
are exchanged over ICI), and only the cheap 80 Hz recurrent tail is chained.

Two LSTM policies:

- ``lstm="exact"`` (default): the conv front is exactly parallel — each
  device's window is extended with ``ctx`` samples of real neighbor audio
  via `ppermute` (edge devices receive zeros, which is identical to the
  zero padding the full-sequence convs see), so interior latents match the
  single-device computation bit for bit. The unidirectional ResLSTM state
  is then chained device-to-device with an n-phase `ppermute` relay: device
  d's scan starts from device d-1's final (h, c), so the recurrence is the
  SAME sequence of per-frame operations as the full-length scan — tokens
  are exactly equal to `codec.tokenize` on one device (test-asserted).
  Wall-clock for the LSTM segment stays sequential (it is a recurrence),
  but that is ~10% of the profile; the convs scale with the mesh.

- ``lstm="reset"``: fully parallel warm-up approximation — every device
  tokenizes its halo-extended window independently (LSTM state starts at
  zero and converges over the ``ctx`` warm-up), exactly the semantics of
  utils.chunked but as one SPMD program. Works for any encoder type;
  interior tokens agree with the full sequence except for rare argmin
  near-ties downstream of the decayed LSTM transient.

Communication is 3 small `ppermute`s (sample halos, LSTM state relay,
post-LSTM frame halos) — all neighbor-only, riding ICI on a real slice.
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models import bigcodec
from ..models import codec as C
from ..ops.conv import conv1d, conv_transpose1d, get_weight
from ..ops.lstm import res_lstm_streaming
from ..utils.chunked import receptive_field_samples


def _shift_from_left(x, axis_name, n):
    """Every device receives x from its LEFT neighbor (device 0 gets zeros)."""
    return jax.lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])


def _shift_from_right(x, axis_name, n):
    """Every device receives x from its RIGHT neighbor (device n-1 gets zeros)."""
    return jax.lax.ppermute(x, axis_name, [(i + 1, i) for i in range(n - 1)])


# conservative ONE-SIDED reach (in positions at the operating scale) of one
# Activation1d resample pair: 2x upsample taps reach ±3 input positions
# (K=12 windowed sinc, stride 2), the 2x downsample another ±3, +2 margin
_AA_REACH = 8


def _replicate_window(x, g0, bound):
    """Reproduce the full-sequence replicate pad INSIDE a halo window.

    x: (B, C, L) where position j holds global index g0 + j (g0 may be
    negative/traced). Activation1d's resampling filters replicate-pad at the
    TRUE sequence edges (alias_free_torch/filter.py mode='replicate'); in a
    halo-extended window those edges can be interior positions, so values at
    global < 0 copy global 0 and values >= bound copy bound-1 — whenever the
    window contains those source positions (windows lying entirely outside
    [0, bound) produce don't-care values their devices discard).
    """
    L = x.shape[-1]
    g = g0 + jnp.arange(L)
    src = jnp.clip(jnp.clip(g, 0, jnp.maximum(bound, 1) - 1) - g0, 0, L - 1)
    return jnp.take(x, src, axis=2)


class _SPAA:
    """Activation1d with true-edge replicate semantics for SP halo windows
    (the sequence-parallel mirror of utils/ragged._MaskedAA): replicate the
    input at the true edges, 2x upsample -> snake -> replicate the upsampled
    signal at the (2x) true edges -> 2x downsample -> re-zero outside
    [0, bound) so following convs see the full sequence's zero padding.
    Window-edge filter error is confined to the _AA_REACH halo margin, which
    callers must provision. antialias=False degrades to plain snake."""

    def __init__(self, antialias: bool, g0, bound):
        self._aa = bigcodec._AA(antialias)
        self.antialias = antialias
        self.g0 = g0
        self.bound = bound

    def __call__(self, x, snake_params):
        if not self.antialias:
            return self._aa(x, snake_params)
        from ..ops import snake as SN
        from ..ops.alias_free import downsample1d, upsample1d

        x = _replicate_window(x, self.g0, self.bound)
        x = upsample1d(x, self._aa.up, 2)
        x = SN.snake_beta(x, snake_params["alpha"], snake_params["beta"])
        x = _replicate_window(x, 2 * self.g0, 2 * self.bound)
        x = downsample1d(x, self._aa.down, 2)
        g = self.g0 + jnp.arange(x.shape[-1])
        return x * ((g >= 0) & (g < self.bound)).astype(x.dtype)


def _edge_mask(x, start, S, T):
    """Zero positions whose GLOBAL index falls outside [0, T) at stride scale S.

    The full-sequence conv stack zero-pads ITS OWN input at every layer, so
    layer-k values outside the real sequence are exactly zero there. A halo
    window, by contrast, lets earlier layers bleed real audio into the
    out-of-range region (conv_in's receptive field reaches real samples from
    global t < 0). Re-zeroing after each conv reproduces the layer-wise
    padding bit for bit; interior devices' masks are all-ones (no effect).
    start: traced global index (at scale S=1) of the window's first sample.
    T may be a scalar bound or a per-sample (B,) vector (ragged batches).
    """
    g = start // S + jnp.arange(x.shape[-1])
    bound = jnp.asarray(T) // S
    if bound.ndim == 0:
        return x * ((g >= 0) & (g < bound)).astype(x.dtype)
    mask = (g[None, :] >= 0) & (g[None, :] < bound[:, None])  # (B, L)
    return x * mask[:, None, :].astype(x.dtype)


def _conv_front(enc, e, x, start, T, aa_factory=None):
    """BigCodec encoder conv stack only (conv_in + blocks), no LSTM/tail.

    Mirrors bigcodec.bigcodec_encode up to the ResLSTM
    (BigCodec_SSL/vq/codec_encoder.py:33-50), with `_edge_mask` after every
    conv so the window computation equals the full-sequence one at the true
    sequence edges. x: (B, 1, Tw) -> (B, C, Tw/hop).

    aa_factory(S) -> Activation1d callable at stride scale S; the default is
    the plain static `_AA`, which is masking-exact only when antialias is
    off (snake(0) == 0). The ragged path passes a replicate-tail masked AA
    (utils/ragged._MaskedAA) so antialias configs stay exact too.
    """
    aa_factory = aa_factory or (lambda S: bigcodec._AA(e.antialias))
    x = bigcodec._wn_conv(x, enc["conv_in"], padding=0 if e.causal else 3,
                          causal=e.causal)
    S = 1
    x = _edge_mask(x, start, S, T)
    for i, stride in enumerate(e.up_ratios):
        p = enc["blocks"][i]
        aa = aa_factory(S)
        for j, d in enumerate(tuple(e.dilations)):
            x = bigcodec.residual_unit(x, p["units"][j], dilation=d,
                                       causal=e.causal, aa=aa)
            x = _edge_mask(x, start, S, T)
        x = aa(x, p["snake"])
        if stride != 1:
            pad = 0 if e.causal else stride // 2 + stride % 2
            x = bigcodec._wn_conv(x, p["down"], stride=stride, padding=pad,
                                  causal=e.causal)
        else:
            x = bigcodec._wn_conv(x, p["down"])
        S *= stride
        x = _edge_mask(x, start, S, T)
    return x


def _tail(enc, e, x, axis_name, n, *, my=0, ckf=0, tmf=0):
    """Post-LSTM tail (Snake -> WNConv k3) with neighbor frame halos.

    The final conv (vq/codec_encoder.py:50, k=3 pad=1 / causal left-pad 2)
    reaches one frame across the chunk boundary; antialias additionally puts
    an Activation1d (±_AA_REACH frames) in front of it, so the halo grows to
    cover the filter taps and the activation runs through `_SPAA` (true-edge
    replicate + re-zero). Edge devices get ppermute zeros == the zero pad /
    masked tail of the full sequence. my/ckf/tmf: device index, frames per
    chunk, real frame count — needed only when e.antialias.
    """
    lpad, rpad = (2, 0) if e.causal else (1, 1)
    m = _AA_REACH if e.antialias else 0
    hl, hr = lpad + m, rpad + m
    parts = []
    if hl:
        parts.append(_shift_from_left(x[:, :, -hl:], axis_name, n))
    parts.append(x)
    if hr:
        parts.append(_shift_from_right(x[:, :, :hr], axis_name, n))
    xx = jnp.concatenate(parts, axis=2)
    if e.antialias:
        aa = _SPAA(True, my * ckf - hl, tmf)
        xx = aa(xx, enc["snake_out"])
        L = x.shape[-1]
        xx = xx[:, :, m:m + lpad + L + rpad]
    else:
        xx = bigcodec._AA(False)(xx, enc["snake_out"])
    return conv1d(xx, get_weight(enc["conv_out"]), enc["conv_out"].get("b"),
                  padding=0)


def _lstm_relay(enc, e, lat, my, axis_name, n):
    """Chain the unidirectional ResLSTM state across devices (n phases).

    Phase p computes every device's scan, but only device p's input state is
    the true chain state, so only it keeps its output; the final (h, c) is
    ppermuted one hop right each phase. After n phases each device holds the
    output it would have produced inside the full-length scan. Redundant
    compute (n x the LSTM FLOPs) is the price of SPMD; wall time equals the
    inherently sequential full-sequence scan for this ~10%-of-profile stage.
    """
    if e.rnn_bidirectional:
        raise NotImplementedError(
            "exact sequence-parallel LSTM relay is unidirectional; use "
            "lstm='reset' for bidirectional encoder RNNs")
    B, F, _ = lat.shape
    hdim = enc["lstm"][0]["w_hh"].shape[1]
    zero = [(jnp.zeros((B, hdim), lat.dtype), jnp.zeros((B, hdim), lat.dtype))
            for _ in range(e.rnn_num_layers)]

    def phase(p, carry):
        keep, state = carry
        out, fin = res_lstm_streaming(lat, enc["lstm"], state,
                                      num_layers=e.rnn_num_layers)
        keep = jnp.where(my == p, out, keep)
        state = jax.tree.map(lambda t: _shift_from_left(t, axis_name, n), fin)
        return keep, state

    keep, _ = jax.lax.fori_loop(0, n, phase, (jnp.zeros_like(lat), zero))
    return keep


def make_sp_tokenizer(cfg: Config, mesh: Mesh | None = None, *,
                      axis: str = "data", mode: str = "conformant",
                      lstm: str = "exact", context_seconds: float | None = None,
                      chunk_quantum_seconds: float = 1.0):
    """Build a reusable sequence-parallel tokenizer: (params, wav (T,)) -> (Nq, T//hop).

    mode: matmul-precision tier, same meaning as codec.tokenize
    ('conformant' | 'high' | 'fast'). lstm: 'exact' | 'reset' (see module
    docstring). Per-device chunk sizes are bucketed to multiples of
    ``chunk_quantum_seconds`` and the jitted SPMD program is cached per
    bucket, so a whole corpus of varying lengths shares a handful of
    compiles (the real length enters the program as a traced scalar). The
    wav tail is zero-padded up to the bucket; trailing zeros cannot
    influence the kept frames (the edge mask reproduces the full-sequence
    pad; the LSTM runs left-to-right).
    """
    e = cfg.model.codec_encoder
    if mesh is None:
        from .mesh import make_data_mesh
        mesh = make_data_mesh()
    n = mesh.shape[axis]
    if mode not in ("conformant", "high", "fast"):
        raise ValueError(f"unknown sp tokenize mode {mode!r} "
                         "(supported: conformant | high | fast)")
    if lstm == "exact" and e.type != "bigcodec":
        raise NotImplementedError("lstm='exact' requires the bigcodec encoder")

    hop = int(np.prod(e.up_ratios)) if e.type == "bigcodec" else e.hop_length
    if context_seconds is None:
        ctx = -(-receptive_field_samples(cfg) // hop) * hop
    else:
        ctx = int(context_seconds * cfg.dataset.sample_rate) // hop * hop
    quantum = max(int(chunk_quantum_seconds * cfg.dataset.sample_rate) // hop * hop,
                  hop)
    compiled: dict[int, Any] = {}

    def build(chunk: int):
        cf, ckf = ctx // hop, chunk // hop

        def local(params, w, tm):
            my = jax.lax.axis_index(axis)
            left = _shift_from_left(w[-ctx:], axis, n)
            right = _shift_from_right(w[:ctx], axis, n)
            window = jnp.concatenate([left, w, right])
            if lstm == "reset":
                codes = C.tokenize(params, cfg, window[None], mode=mode)
                return codes[:, :, cf:cf + ckf]
            start = my * chunk - ctx

            def run(enc, x):
                lat = _conv_front(
                    enc, e, x, start, tm,
                    aa_factory=lambda S: _SPAA(e.antialias, start // S, tm // S))
                if e.use_rnn:
                    lat = _lstm_relay(enc, e, lat[:, :, cf:cf + ckf], my, axis, n)
                else:
                    lat = lat[:, :, cf:cf + ckf]
                # trailing-pad frames would bleed into the last real frame
                # through the tail conv's right halo; full-seq pads them zero
                lat = _edge_mask(lat, my * ckf, 1, tm // hop)
                return _tail(enc, e, lat, axis, n, my=my, ckf=ckf,
                             tmf=tm // hop)

            enc = params["encoder"]
            if mode == "fast":
                enc16 = C._cast_tree(enc, jnp.bfloat16)
                lat = run(enc16, window[None, None, :].astype(jnp.bfloat16))
                lat = lat.astype(jnp.float32)
            else:
                prec = {"conformant": "float32", "high": "tensorfloat32"}[mode]
                with jax.default_matmul_precision(prec):
                    lat = run(enc, window[None, None, :])
            with jax.default_matmul_precision("float32"):
                lat = C.semantic_vq_in(params, cfg, lat)
                _, codes, _ = C.quantize(params, cfg, lat, training=False)
            return codes

        return jax.jit(shard_map(local, mesh=mesh,
                                 in_specs=(P(), P(axis), P()),
                                 out_specs=P(None, None, axis),
                                 check_vma=False))

    from jax.sharding import NamedSharding
    repl = NamedSharding(mesh, P())
    _params_cache: dict = {}

    def tokenize(params, wav):
        # checkpoint-loaded params may be committed to one device; replicate
        # them over the mesh once. The cache holds the SOURCE object too so
        # the identity can never be a recycled id of a collected tree.
        if _params_cache.get("src") is not params:
            _params_cache["src"] = params
            _params_cache["p"] = jax.device_put(params, repl)
        params = _params_cache["p"]
        T = int(wav.shape[-1])
        # halo exchange is neighbor-only: each chunk must cover the context
        chunk = max(-(-T // (n * quantum)) * quantum, -(-ctx // quantum) * quantum)
        fn = compiled.get(chunk)
        if fn is None:
            fn = compiled[chunk] = build(chunk)
        padded = jnp.zeros((n * chunk,), jnp.float32).at[:T].set(
            jnp.asarray(wav, jnp.float32))
        tm = jnp.int32(-(-T // hop) * hop)
        codes = fn(params, padded, tm)
        return codes[:, 0, :T // hop]

    tokenize.cache = compiled  # introspectable: one jitted program per bucket
    return tokenize


def _halo_extend(x, h_left, h_right, axis_name, n):
    """Extend the time axis of an exact per-device chunk with neighbor halos
    (ppermute zeros at the mesh edges == the absent frames of the full seq)."""
    parts = []
    if h_left:
        parts.append(_shift_from_left(x[..., -h_left:], axis_name, n))
    parts.append(x)
    if h_right:
        parts.append(_shift_from_right(x[..., :h_right], axis_name, n))
    return jnp.concatenate(parts, axis=-1)


def _sp_block_margins(stride, dilations, antialias):
    """(M, h): residual-unit margin at the block OUTPUT scale and the input-
    scale halo that covers it plus the tconv pad and (with antialias) the
    block-level Activation1d's own filter reach."""
    m_aa = _AA_REACH if antialias else 0
    pad_ref = stride // 2 + stride % 2 if stride != 1 else 0
    # per unit: Activation1d (±m_aa) -> conv k7 dil d (±3d) -> Activation1d
    # (±m_aa) -> conv k1
    M = sum(3 * d + 2 * m_aa for d in dilations)
    h = -(-(M + pad_ref) // max(stride, 1)) + 1 + m_aa
    return M, h


def _decoder_block_sp(p, x, *, stride, dilations, antialias, my, axis_name, n,
                      L, S_out, tm):
    """One BigCodec DecoderBlock (snake -> tconv -> 3 residual units,
    vq/module.py:115-141) on an exact per-device chunk, kept exact via halo
    exchange + margin tracking + true-edge masking.

    x: (1, C, L) exact chunk at the block's input scale. The window is halo-
    extended FIRST, the block Activation1d runs through `_SPAA` (true-edge
    replicate; plain snake when antialias is off — pointwise, so extending
    first is value-identical), then the transpose conv runs in VALID form
    and is sliced so that out_local[q] == out_full[my*L*stride - M + q]; the
    residual units then consume the margin M (3*d per unit + the two
    Activation1d reaches when antialias), with `_edge_mask` after every
    spatial op reproducing the full sequence's per-layer zero padding at the
    true sequence edges. Returns the exact (1, C_out, L*stride) chunk.
    S_out: output samples per decoder FRAME (static), tm: real frame count
    (traced) — bound at the output scale is tm*S_out.
    """
    M, h = _sp_block_margins(stride, dilations, antialias)
    pad_ref = stride // 2 + stride % 2 if stride != 1 else 0
    if L < h:
        raise ValueError(f"per-device chunk {L} frames < halo {h}; use a "
                         f"longer input or fewer devices")

    x_ext = _halo_extend(x, h, h, axis_name, n)
    aa_in = _SPAA(antialias, my * L - h, tm * (S_out // stride))
    x_ext = aa_in(x_ext, p["snake"])
    w = get_weight(p["up"])
    if stride != 1:
        y = conv_transpose1d(x_ext, w, p["up"].get("b"), stride=stride,
                             padding=0, output_padding=0)
    else:
        y = conv_transpose1d(x_ext, w, p["up"].get("b"))
    # local->global: y[q] == full[(my*L - h)*stride - pad_ref + q]
    q0 = h * stride + pad_ref - M
    assert q0 >= 0 and q0 + L * stride + 2 * M <= y.shape[-1], (q0, y.shape)
    y = y[..., q0:q0 + L * stride + 2 * M]
    start = my * (L * stride) - M  # global sample index of y[..., 0]
    y = _edge_mask(y, start, 1, tm * S_out)
    aa_out = _SPAA(antialias, start, tm * S_out)
    for j, d in enumerate(dilations):
        y = bigcodec.residual_unit(y, p["units"][j], dilation=d, causal=False,
                                   aa=aa_out)
        y = _edge_mask(y, start, 1, tm * S_out)
        # outer margin samples consumed their own window padding
    return y[..., M:M + L * stride]


def make_sp_synthesizer(cfg: Config, mesh: Mesh | None = None, *,
                        axis: str = "data",
                        chunk_quantum_frames: int = 80):
    """Build a sequence-parallel decoder: (params, codes (Nq, Tf)) -> wav (Tf*hop,).

    The synthesis mirror of make_sp_tokenizer: ONE token stream is sharded
    across the mesh by frames, each chip decodes its slice (conv_in + LSTM
    relay + upsampling blocks + tail) with neighbor halo exchange, and the
    waveform equals single-device codec.decode to fp32 rounding — conv
    summation order varies across shapes; token round trips are discrete
    and therefore exact (tests/test_sp_tokenize.py::test_sp_synthesize_*).
    BigCodec decoder only.
    Compiles are cached per chunk bucket (chunk_quantum_frames granularity);
    the real frame count is a traced scalar.
    """
    d = cfg.model.codec_decoder
    if d.type != "bigcodec":
        raise NotImplementedError("sequence-parallel synthesis requires the "
                                  "bigcodec decoder")
    if d.causal or d.rnn_bidirectional:
        raise NotImplementedError("sp synthesis covers the non-causal, "
                                  "unidirectional-RNN decoder configs")
    if any(s == 1 for s in d.up_ratios):
        # the offline decoder's stride-1 tconv runs padding=0 (length grows by
        # K-1), which the halo/q0 index mapping in _decoder_block_sp does not
        # model — no reference config uses stride-1 up_ratios
        raise NotImplementedError("sp synthesis does not support stride-1 "
                                  "decoder up_ratios")
    if mesh is None:
        from .mesh import make_data_mesh
        mesh = make_data_mesh()
    n = mesh.shape[axis]
    up_ratios = tuple(d.up_ratios)
    dilations = tuple(d.dilations)
    hop = int(np.prod(up_ratios))
    # strictest per-device chunk bound comes from the first block's halo
    _, h_first = _sp_block_margins(up_ratios[0], dilations, d.antialias)
    tail_m = _AA_REACH if d.antialias else 0
    min_chunk = max(h_first, 3 + tail_m)
    compiled: dict[int, Any] = {}

    class _E:  # adapter for _lstm_relay's encoder-config interface
        rnn_bidirectional = False
        rnn_num_layers = d.rnn_num_layers

    def build(L: int):
        def local(params, codes, tf):
            # codes: (Nq, L) exact token chunk; tf: real frame count (traced)
            my = jax.lax.axis_index(axis)
            dec = params["decoder"]
            z = C.codes_to_emb(params, cfg, jnp.swapaxes(codes, 0, 1)[None])
            # semantic checkpoints decode fc_post_a(zq) — per-frame linear,
            # so applying it shard-locally before the edge mask is exact
            z = C.apply_fc_post_a(params, cfg, z)
            z = _edge_mask(z, my * L, 1, tf)  # trailing pad: code-0 emb != 0
            x = _halo_extend(z, 3, 3, axis, n)
            x = conv1d(x, get_weight(dec["conv_in"]), dec["conv_in"].get("b"),
                       padding=0)
            x = _edge_mask(x, my * L, 1, tf)
            if d.use_rnn:
                x = _lstm_relay({"lstm": dec["lstm"]}, _E, x, my, axis, n)
                x = _edge_mask(x, my * L, 1, tf)
            Lc, S_out = L, 1
            for i, stride in enumerate(up_ratios):
                S_out_next = S_out * stride
                x = _decoder_block_sp(dec["blocks"][i], x, stride=stride,
                                      dilations=dilations,
                                      antialias=d.antialias, my=my,
                                      axis_name=axis, n=n, L=Lc,
                                      S_out=S_out_next, tm=tf)
                Lc, S_out = Lc * stride, S_out_next
            # tail: snake_out Activation1d (±_AA_REACH when antialias) + k7
            # conv (pad 3) over neighbor halos; _SPAA degrades to plain snake
            # (pointwise — halo-extending first is value-identical) otherwise
            m = _AA_REACH if d.antialias else 0
            x = _halo_extend(x, 3 + m, 3 + m, axis, n)
            aa_f = _SPAA(d.antialias, my * Lc - (3 + m), tf * hop)
            x = aa_f(x, dec["snake_out"])
            if m:
                x = x[..., m:m + Lc + 6]
            x = conv1d(x, get_weight(dec["conv_out"]), dec["conv_out"].get("b"),
                       padding=0)
            return jnp.tanh(x)

        return jax.jit(shard_map(local, mesh=mesh,
                                 in_specs=(P(), P(None, axis), P()),
                                 out_specs=P(None, None, axis),
                                 check_vma=False))

    from jax.sharding import NamedSharding
    repl = NamedSharding(mesh, P())
    _params_cache: dict = {}

    def synthesize(params, codes):
        if _params_cache.get("src") is not params:
            _params_cache["src"] = params
            _params_cache["p"] = jax.device_put(params, repl)
        params = _params_cache["p"]
        codes = jnp.asarray(codes)
        if codes.ndim == 1:
            codes = codes[None]
        tf = int(codes.shape[-1])
        q = max(chunk_quantum_frames, 1)
        L = max(-(-tf // (n * q)) * q, -(-min_chunk // q) * q)
        padded = jnp.zeros((codes.shape[0], n * L), codes.dtype
                           ).at[:, :tf].set(codes)
        fn = compiled.get(L)
        if fn is None:
            fn = compiled[L] = build(L)
        wav = fn(params, padded, jnp.int32(tf))
        return wav[0, 0, :tf * hop]

    synthesize.cache = compiled
    return synthesize


def tokenize_sequence_parallel(params, cfg: Config, wav, mesh: Mesh | None = None,
                               *, axis: str = "data", mode: str = "conformant",
                               lstm: str = "exact",
                               context_seconds: float | None = None):
    """One-shot convenience wrapper; for corpora use make_sp_tokenizer."""
    tok = make_sp_tokenizer(cfg, mesh, axis=axis, mode=mode, lstm=lstm,
                            context_seconds=context_seconds,
                            chunk_quantum_seconds=1.0 / cfg.dataset.sample_rate)
    return tok(params, wav)
