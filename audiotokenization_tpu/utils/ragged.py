"""Ragged-batch tokenization & reconstruction: variable-length files, one call.

The reference's extract_indices.py forces batch_size=1 (extract_indices.py:397)
and its full-length eval runs batch 1 too (config/dataset/default.yaml:17-21)
— every utterance is processed alone, so corpus jobs never amortize dispatch
or fill the MXU's batch dimension, and on TPU every unique length would be a
fresh XLA compile. The idiomatic fix is to stack files of similar length into
one zero-padded batch. Exactness requires care: outputs must equal the
per-file path, but a longer zero tail changes where the conv stack's
LAYER-WISE padding starts (the same bleed effect as the sequence-parallel
edge case, parallel/sp.py). `_edge_mask` with a per-sample bound vector
re-zeroes each sample's out-of-range region after every conv, which makes
the batched computation identical to processing each (hop-padded) file
alone — tokens byte-exact, waveforms to fp32 rounding — asserted in
tests/test_ragged_batch.py.

Exactness coverage: EVERY config family. Bigcodec encoder/decoder with
any RNN layout — including bidirectional (r5): the ResLSTM takes a
per-sample (B, T) valid mask so each sample's reversed scan starts at its
own last valid frame with the zero init state (ops/lstm.py) — AND the
conformer family (conformer_stft / conformer_istft):
attention gets per-sample key masks, the conv module a pre-depthwise edge
zeroing (ops/transformer.py valid=...), the STFT front is exact unmasked
(its constant pad is zero, same as the batch's zero tail), and the ISTFT
head zeroes pad-frame spectra + accumulates the NOLA envelope per sample
(ops/stft.istft_same valid=...) — so the reference's full-length batch-1
eval policy (config/dataset/default.yaml:17-21, incl. the config1
conformer run) is covered by bucketed batches for every config family.
Antialias configs (cfgs/config11) ARE exact here via `_MaskedAA`: the per-file computation
replicate-pads at the clip edge inside every Activation1d resampling filter
(alias_free_torch/filter.py replicate pad), so plain re-zeroing is wrong at
the tail; instead the tail is REPLICATED from the last valid position before
the 2x upsample and again before the 2x downsample (the upsampled signal past
the valid edge differs from the per-file edge pad), then re-zeroed for the
following conv's zero-padding argument.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..models import bigcodec
from ..models import codec as C
from ..parallel.sp import _conv_front, _edge_mask


def _check_exactness(part, name: str):
    if part.type in ("conformer_stft", "conformer_istft"):
        if getattr(part, "ffn_type", "dense") == "moe":
            # capacity-based MoE routing is batch-composition-dependent by
            # construction (expert capacity = f(batch tokens), cross-sample
            # slot competition — ops/moe.py docstring): a batched result can
            # never equal per-file processing, so the exact-ragged contract
            # excludes it. Use per-file eval (--exact / batch_size 1).
            raise NotImplementedError(
                f"ffn_type: moe {name}: capacity routing is batch-global; "
                "no exact ragged path (evaluate per file)")
        return  # exact masked path: _conformer_encode/decode_masked
    if part.type != "bigcodec":
        raise NotImplementedError(f"no ragged path for {name} type {part.type}")
    # bidirectional RNN configs are exact too (r5): the ResLSTM gets a
    # per-sample (B, T) valid mask, so each sample's reversed scan starts
    # at its own last valid frame with the zero init state (ops/lstm.py
    # _lstm_layer valid=...)


def _replicate_tail(x, bound):
    """Set positions >= bound (per-sample) to the value at bound-1.

    x: (B, C, L); bound: (B,) int. Emulates the per-file replicate-edge
    padding of Activation1d's resampling filters inside a longer zero-padded
    batch array: every position past the sample's true edge holds the edge
    value, exactly what alias_free_torch's `mode='replicate'` pad would
    supply (and the array-edge pad then replicates the same value).
    """
    idx = jnp.minimum(jnp.arange(x.shape[-1])[None, :],
                      jnp.maximum(bound, 1)[:, None] - 1)  # (B, L)
    return jnp.take_along_axis(x, idx[:, None, :], axis=2)


class _MaskedAA:
    """Activation1d with per-sample tail handling for ragged exactness.

    antialias=False: plain snake (snake(0) == 0 keeps the zero tail).
    antialias=True: replicate tail -> 2x upsample -> snake -> replicate the
    upsampled tail (the interpolation past the edge is NOT constant, but the
    per-file downsample replicate-pads with the edge VALUE) -> 2x downsample
    -> re-zero the tail so the next conv sees the per-file zero padding.
    bound: (B,) valid positions at this stride scale.
    """

    def __init__(self, antialias: bool, bound):
        self._aa = bigcodec._AA(antialias)
        self.antialias = antialias
        self.bound = bound

    def __call__(self, x, snake_params):
        if not self.antialias:
            return self._aa(x, snake_params)
        from ..ops import snake as SN
        from ..ops.alias_free import downsample1d, upsample1d

        b = self.bound
        x = _replicate_tail(x, b)
        x = upsample1d(x, self._aa.up, 2)
        x = SN.snake_beta(x, snake_params["alpha"], snake_params["beta"])
        x = _replicate_tail(x, 2 * b)
        x = downsample1d(x, self._aa.down, 2)
        return _edge_mask(x, 0, 1, b)


def _bottleneck_masked(params, x, frames):
    """semantic_bottleneck (models/semantic.py:34-48) with per-sample frame
    bounds: `_edge_mask` after every k=3 conv so each sample's tail sees the
    per-file ZERO padding instead of its bucket neighbors' pad region —
    mirrors what `_decode_masked` does for the decoder stack. x: (B, 1024, L),
    frames: (B,)."""
    from ..models.semantic import semantic_bottleneck  # noqa: F401  (spec ref)
    from ..ops.conv import conv1d, get_weight

    def c(p, y):
        w = get_weight(p)
        return _edge_mask(conv1d(y, w, p.get("b"), padding=(w.shape[-1] - 1) // 2),
                          0, 1, frames)

    h = c(params["initial"], x)
    r = jax.nn.relu(h)
    r = c(params["res1"], r)
    r = jax.nn.relu(r)
    r = c(params["res2"], r)
    return c(params["final"], r + h)


def _semantic_vq_in_masked(params, cfg: Config, lat, frames,
                           semantic_target=None):
    """Ragged-exact `codec.semantic_vq_in`: per-position ops (fc_prior) pass
    through untouched; the concat_semantic bottleneck convs get per-sample
    masking. semantic_target: (B, 1024, L) zero-padded past each sample's
    teacher frames (the reference zero-pads the target to Tf itself,
    lightning_module.py:236-238)."""
    if not cfg.train.use_semantic:
        return lat
    from ..ops.conv import linear

    sem_p = params["semantic"]
    if cfg.train.concat_semantic:
        if semantic_target is None:
            raise ValueError(
                "concat_semantic quantizes concat(teacher, latents); pass "
                "semantic_target (B, 1024, L//hop) — run_test computes it "
                "on the fly from the in-loop teacher")
        t = _edge_mask(semantic_target, 0, 1, frames)
        sem = _bottleneck_masked(sem_p["encoder"],
                                 jax.lax.stop_gradient(t), frames)
        lat = jnp.concatenate([sem, lat], axis=1)
    out = linear(jnp.swapaxes(lat, 1, 2), sem_p["fc_prior"])
    return jnp.swapaxes(out, 1, 2)


def _maybe_pcm16(wavs):
    if wavs.dtype == jnp.int16:
        # PCM16 shipped as-is (half the host->device bytes) and converted on
        # device — int16/32768 is exactly representable in float32, so this
        # equals audio_io.read_audio's host conversion bit for bit
        # (data/audio_io.py:42)
        return wavs.astype(jnp.float32) / 32768.0
    return wavs


def _aa_factory(part, lengths):
    """aa_factory for _conv_front/_decode_masked: masked AA at scale S."""
    return lambda S: _MaskedAA(part.antialias, lengths // S)


def _frame_valid(frames, T):
    """(B,) frame counts -> (B, T) bool mask."""
    return jnp.arange(T)[None, :] < frames[:, None]


def _finish_masked(enc_p, e, lat, lengths, hop):
    """LSTM + encoder tail over conv-front latents, with the tail-frame mask."""
    if e.use_rnn:
        from ..ops.lstm import res_lstm

        lat = res_lstm(lat, enc_p["lstm"], num_layers=e.rnn_num_layers,
                       bidirectional=e.rnn_bidirectional,
                       valid=_frame_valid(lengths // hop, lat.shape[-1]))
    # zero the tail frames the tail conv would otherwise read
    lat = _edge_mask(lat, 0, 1, lengths // hop)
    aa = _MaskedAA(e.antialias, lengths // hop)
    lat = aa(lat, enc_p["snake_out"])
    return bigcodec._wn_conv(lat, enc_p["conv_out"],
                             padding=0 if e.causal else 1, causal=e.causal)


def _encode_masked(enc_p, e, wavs, lengths, hop):
    if e.type == "conformer_stft":
        from ..models.conformer import conformer_encode

        # STFT front is exact for valid frames without masking (constant
        # ZERO pad == the batch's zero tail); the backbone gets per-sample
        # attention-key masks + conv-edge zeroing (ops/transformer.py);
        # latents at pad frames are garbage, masked/trimmed by the caller.
        return conformer_encode(
            enc_p, wavs[:, None, :], hop_length=e.hop_length, n_fft=e.n_fft,
            window_size=e.window_size, n_head=e.n_head,
            rope_theta=e.rope_theta, max_seq_len=e.max_seq_len,
            causal=e.causal, valid=lengths // hop)
    lat = _conv_front(enc_p, e, wavs[:, None, :], 0, lengths,
                      aa_factory=_aa_factory(e, lengths))
    return _finish_masked(enc_p, e, lat, lengths, hop)


def _decode_masked(dec, d, z, frames):
    """Batched decoder with per-sample frame bounds (frames (B,)).

    conformer_istft: masked backbone + per-sample NOLA envelope
    (models/conformer.conformer_decode valid=...); bigcodec: the edge-masked
    conv stack below."""
    if d.type == "conformer_istft":
        from ..models.conformer import conformer_decode

        return conformer_decode(
            dec, z, hop_length=d.hop_length, n_fft=d.n_fft, n_head=d.n_head,
            rope_theta=d.rope_theta, max_seq_len=d.max_seq_len,
            causal=d.causal, valid=frames)
    return _decode_masked_bigcodec(dec, d, z, frames)


def _decode_masked_bigcodec(dec, d, z, frames):
    """Batched bigcodec decoder with per-sample frame bounds (frames (B,)).

    Same structure as bigcodec.bigcodec_decode with `_edge_mask` after every
    spatial op so each sample's computation equals decoding its own exact
    frame count alone (the per-layer zero padding lands at frames[i], not at
    the padded batch width). z: (B, C, L) -> (B, 1, L*hop_dec).
    """
    x = bigcodec._wn_conv(z, dec["conv_in"], padding=0 if d.causal else 3,
                          causal=d.causal)
    x = _edge_mask(x, 0, 1, frames)
    if d.use_rnn:
        from ..ops.lstm import res_lstm

        x = res_lstm(x, dec["lstm"], num_layers=d.rnn_num_layers,
                     bidirectional=d.rnn_bidirectional,
                     valid=_frame_valid(frames, x.shape[-1]))
        x = _edge_mask(x, 0, 1, frames)
    S = 1
    for i, stride in enumerate(tuple(d.up_ratios)):
        p = dec["blocks"][i]
        x = _MaskedAA(d.antialias, frames * S)(x, p["snake"])
        x = bigcodec._wn_tconv(
            x, p["up"], stride=stride,
            padding=0 if d.causal or stride == 1 else stride // 2 + stride % 2,
            output_padding=0 if d.causal or stride == 1 else stride % 2,
            causal=d.causal and stride != 1)
        S *= stride
        x = _edge_mask(x, 0, 1, frames * S)
        aa = _MaskedAA(d.antialias, frames * S)
        for j, dd in enumerate(tuple(d.dilations)):
            x = bigcodec.residual_unit(x, p["units"][j], dilation=dd,
                                       causal=d.causal, aa=aa)
            x = _edge_mask(x, 0, 1, frames * S)
    x = _MaskedAA(d.antialias, frames * S)(x, dec["snake_out"])
    x = bigcodec._wn_conv(x, dec["conv_out"], padding=0 if d.causal else 3,
                          causal=d.causal)
    return jnp.tanh(x)


def make_ragged_tokenizer(cfg: Config, *, mode: str = "conformant"):
    """Build (params, wavs (B, L) f32|int16 zero-padded, lengths (B,) samples)
    -> codes (Nq, B, L//hop); frames >= lengths//hop are meaningless
    (trim per sample). One compile per (B, L) shape — bucket lengths.
    """
    e = cfg.model.codec_encoder
    _check_exactness(e, "encoder")
    if mode not in ("conformant", "high", "fast", "balanced"):
        raise ValueError(f"unknown tokenize mode {mode!r}")
    conformer = e.type == "conformer_stft"
    if conformer and mode == "balanced":
        raise ValueError("balanced tokenize mode splits the bigcodec conv "
                         "front from the LSTM/tail; use conformant/high/fast "
                         "for conformer checkpoints")
    hop = e.hop_length if conformer else int(np.prod(e.up_ratios))

    @jax.jit
    def run(params, wavs, lengths, semantic_target=None):
        wavs = _maybe_pcm16(wavs)
        enc = params["encoder"]
        if mode == "fast":
            enc16 = C._cast_tree(enc, jnp.bfloat16)
            lat = _encode_masked(enc16, e, wavs.astype(jnp.bfloat16), lengths,
                                 hop).astype(jnp.float32)
        elif mode == "balanced":
            # bf16 conv front, fp32 LSTM/tail/VQ (codec.tokenize semantics)
            enc16 = C._cast_tree(enc, jnp.bfloat16)
            lat = _conv_front(enc16, e, wavs.astype(jnp.bfloat16)[:, None, :],
                              0, lengths,
                              aa_factory=_aa_factory(e, lengths)
                              ).astype(jnp.float32)
            with jax.default_matmul_precision("float32"):
                lat = _finish_masked(enc, e, lat, lengths, hop)
        else:
            prec = {"conformant": "float32", "high": "tensorfloat32"}[mode]
            with jax.default_matmul_precision(prec):
                lat = _encode_masked(enc, e, wavs, lengths, hop)
        with jax.default_matmul_precision("float32"):
            lat = _semantic_vq_in_masked(params, cfg, lat, lengths // hop,
                                         semantic_target)
            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        return codes

    return run


def make_ragged_codec(cfg: Config):
    """Batched variable-length RECONSTRUCTION: (params, wavs (B, L) f32|int16,
    lengths (B,)) -> (recon (B, L*hop_dec/hop), codes (Nq, B, L//hop)).

    The full encode -> VQ -> decode round trip with per-sample masking on
    both sides: tokens equal the per-file forward exactly, waveforms to fp32
    rounding. Replaces batch-1 full-length eval (reference
    config/dataset/default.yaml:17-21) with bucketed batches. Runs at the
    same precision conventions as codec.forward eval (no forced casts).
    """
    e, d = cfg.model.codec_encoder, cfg.model.codec_decoder
    _check_exactness(e, "encoder")
    _check_exactness(d, "decoder")
    hop = (e.hop_length if e.type == "conformer_stft"
           else int(np.prod(e.up_ratios)))

    @jax.jit
    def run(params, wavs, lengths, semantic_target=None):
        wavs = _maybe_pcm16(wavs)
        frames = lengths // hop
        lat = _encode_masked(params["encoder"], e, wavs, lengths, hop)
        lat = _semantic_vq_in_masked(params, cfg, lat, frames, semantic_target)
        zq, codes, _ = C.quantize(params, cfg, lat, training=False)
        if cfg.train.use_semantic:
            zq = C.apply_fc_post_a(params, cfg, zq)
        zq = _edge_mask(zq, 0, 1, frames)
        recon = _decode_masked(params["decoder"], d, zq, frames)
        return recon[:, 0], codes

    return run
