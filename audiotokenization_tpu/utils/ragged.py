"""Ragged-batch tokenization: many variable-length files in one device call.

The reference's extract_indices.py forces batch_size=1 (extract_indices.py:397)
— every utterance is tokenized alone, so corpus extraction never amortizes
dispatch or fills the MXU's batch dimension. On TPU the idiomatic fix is to
stack files of similar length into one zero-padded batch and tokenize them
together. Exactness requires care: tokens must equal the per-file path
byte for byte, but a longer zero tail changes where the conv stack's
LAYER-WISE padding starts (the same bleed effect as the sequence-parallel
edge case, parallel/sp.py). `_edge_mask` with a per-sample bound vector
re-zeroes each sample's out-of-range region after every conv, which makes
the batched computation identical to tokenizing each (hop-padded) file
alone — asserted exact in tests/test_ragged_batch.py.

Restrictions for exactness: bigcodec encoder, unidirectional (or no) RNN —
trailing zeros then cannot influence earlier frames through the LSTM.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..models import bigcodec
from ..models import codec as C
from ..parallel.sp import _conv_front, _edge_mask


def make_ragged_tokenizer(cfg: Config, *, mode: str = "conformant"):
    """Build (params, wavs (B, L) f32 zero-padded, lengths (B,) samples)
    -> codes (Nq, B, L//hop); frames >= lengths//hop are meaningless
    (trim per sample). One compile per (B, L) shape — bucket lengths.
    """
    e = cfg.model.codec_encoder
    if e.type != "bigcodec":
        raise NotImplementedError("ragged batching requires the bigcodec "
                                  "encoder (conformer attention is global)")
    if e.use_rnn and e.rnn_bidirectional:
        raise NotImplementedError("bidirectional RNN reads the zero tail; "
                                  "ragged batching would not be exact")
    if e.antialias:
        # Activation1d's resampling filters use replicate-edge padding, so
        # re-zeroing out-of-range positions does NOT reproduce the per-file
        # computation (measured: up to 7e-3 latent drift in tail frames)
        raise NotImplementedError("antialias configs break the edge-mask "
                                  "exactness argument; use per-file "
                                  "extraction (--exact)")
    if mode not in ("conformant", "high", "fast", "balanced"):
        raise ValueError(f"unknown tokenize mode {mode!r}")
    hop = int(np.prod(e.up_ratios))

    @jax.jit
    def run(params, wavs, lengths):
        if wavs.dtype == jnp.int16:
            # PCM16 shipped as-is (half the host->device bytes) and converted
            # on device — int16/32768 is exactly representable in float32, so
            # this equals audio_io.read_audio's host-side conversion bit for
            # bit (data/audio_io.py:42)
            wavs = wavs.astype(jnp.float32) / 32768.0
        enc = params["encoder"]

        def finish_masked(enc_p, lat):
            """LSTM + tail over conv-front latents, with the tail-frame mask."""
            if e.use_rnn:
                from ..ops.lstm import res_lstm

                lat = res_lstm(lat, enc_p["lstm"], num_layers=e.rnn_num_layers)
            # zero the tail frames the tail conv would otherwise read
            lat = _edge_mask(lat, 0, 1, lengths // hop)
            aa = bigcodec._AA(e.antialias)
            lat = aa(lat, enc_p["snake_out"])
            return bigcodec._wn_conv(lat, enc_p["conv_out"],
                                     padding=0 if e.causal else 1,
                                     causal=e.causal)

        def encode_masked(enc_p, x):
            lat = _conv_front(enc_p, e, x[:, None, :], 0, lengths)
            return finish_masked(enc_p, lat)

        if mode == "fast":
            enc16 = C._cast_tree(enc, jnp.bfloat16)
            lat = encode_masked(enc16, wavs.astype(jnp.bfloat16)).astype(jnp.float32)
        elif mode == "balanced":
            # bf16 conv front, fp32 LSTM/tail/VQ (codec.tokenize semantics)
            enc16 = C._cast_tree(enc, jnp.bfloat16)
            lat = _conv_front(enc16, e, wavs.astype(jnp.bfloat16)[:, None, :],
                              0, lengths).astype(jnp.float32)
            with jax.default_matmul_precision("float32"):
                lat = finish_masked(enc, lat)
        else:
            prec = {"conformant": "float32", "high": "tensorfloat32"}[mode]
            with jax.default_matmul_precision(prec):
                lat = encode_masked(enc, wavs)
        with jax.default_matmul_precision("float32"):
            lat = C.semantic_vq_in(params, cfg, lat)
            _, codes, _ = C.quantize(params, cfg, lat, training=False)
        return codes

    return run
