"""Conformer STFT encoder / ISTFT decoder codec variant.

Reference: ConformerEncoderSTFT (BigCodec_SSL/vq/codec_encoder.py:124-209)
and ConformerDecoderISTFT (vq/codec_decoder.py:385-528) — the config1 run
(hop 200, n_fft=win 800, dim 256, 6 layers, rope_theta 500).

Encoder: STFT (center=False, constant pad (win-hop)/2) -> cat(real, imag)
-> 1x1 conv proj -> RMSNorm -> ConformerBackbone(conv_first=True) -> RMSNorm
-> weight-normed 1x1 out proj.

Decoder: 1x1 in proj -> ConformerBackbone(conv_first=False) -> RMSNorm ->
ISTFTHead (Linear dim -> n_fft+2, exp-magnitude clipped at 1e2, cos/sin phase,
"same"-padding NOLA ISTFT).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, get_weight, init_conv1d, init_linear, init_wn_conv1d, linear
from ..ops.stft import hann_window, istft_same, stft_same_constant_pad
from ..ops.transformer import (conformer_backbone, init_conformer_backbone,
                               precompute_rope, rms_norm)


def conformer_encode(params, x, *, hop_length=200, n_fft=800, window_size=800,
                     n_head=8, rope_theta=10000.0, max_seq_len=8192,
                     causal=False, remat=False, backbone_fn=None, valid=None,
                     moe_args=(2, 1.25)):
    """x: (B, 1, T) -> (B, out_channels, T/hop) latents.

    backbone_fn: optional replacement for the sequential backbone call —
    the hook parallel/pp.py uses to run the layer stack as a GPipe-style
    pipeline over a 'pipe' mesh axis. Signature (h, backbone_params) -> h.

    valid: optional (B,) per-sample frame counts for ragged zero-padded
    batches (utils/ragged.py). The STFT front is exact for valid frames
    without masking — its constant pad is zero, matching the batch's zero
    tail — so only the backbone needs the mask (attention keys + conv
    edges); latents at pad frames are meaningless and trimmed per sample.
    """
    wav = x[:, 0, :]
    spec = stft_same_constant_pad(wav, n_fft=n_fft, hop_length=hop_length,
                                  win_length=window_size)  # (B, F, Tf) complex
    feats = jnp.concatenate([spec.real, spec.imag], axis=1)  # (B, 2F, Tf)
    w_in = get_weight(params["input_proj"])
    # the FFT runs in fp32/complex64 regardless of input dtype; hand the
    # backbone activations in the PARAM dtype (bf16 under mixed precision —
    # lax.conv requires matching operand dtypes)
    feats = feats.astype(w_in.dtype)
    h = conv1d(feats, w_in, params["input_proj"].get("b"))
    h = jnp.swapaxes(rms_norm(jnp.swapaxes(h, 1, 2), params["input_norm"]), 1, 2)
    if backbone_fn is None and valid is None:
        # stock-loop pipeline parallelism: inside a pp_train_context the
        # backbone runs as a GPipe pipeline over the 'pipe' mesh axis
        # (identity otherwise; ragged `valid` eval stays sequential)
        from ..parallel.pp import maybe_pp_backbone

        backbone_fn = maybe_pp_backbone(
            params["backbone"], dim=h.shape[1], n_head=n_head,
            rope_theta=rope_theta, max_seq_len=max_seq_len,
            conv_first=True, causal=causal, remat=remat)
    if backbone_fn is not None:
        h = backbone_fn(h, params["backbone"])
    else:
        h = conformer_backbone(h, params["backbone"], n_head=n_head,
                               rope_theta=rope_theta, max_seq_len=max_seq_len,
                               conv_first=True, causal=causal, remat=remat,
                               valid=valid, moe_args=moe_args)
    h = jnp.swapaxes(rms_norm(jnp.swapaxes(h, 1, 2), params["norm"]), 1, 2)
    if "output_proj" in params:
        h = conv1d(h, get_weight(params["output_proj"]), params["output_proj"].get("b"))
    return h


def istft_head(params, x, *, n_fft: int, hop_length: int, valid=None):
    """ISTFTHead (codec_decoder.py:229-274). x: (B, T, dim) -> (B, 1, L).

    valid: optional (B,) frame counts — pad-frame spectra are zeroed (they
    then contribute nothing to the overlap-add, exactly like per-file
    processing where those frames don't exist) and the NOLA envelope is
    computed per sample over its own frame count (istft_same)."""
    pred = linear(x, params)  # (B, T, n_fft + 2)
    pred = jnp.swapaxes(pred, 1, 2)  # (B, n_fft+2, T)
    mag, phase = jnp.split(pred, 2, axis=1)
    mag = jnp.minimum(jnp.exp(mag), 1e2)
    spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))
    audio = istft_same(spec, n_fft=n_fft, hop_length=hop_length,
                       win_length=n_fft, valid=valid)
    return audio[:, None, :]


def conformer_decode(params, x, *, hop_length=200, n_fft=800, n_head=8,
                     rope_theta=10000.0, max_seq_len=8192, causal=False,
                     remat=False, backbone_fn=None, valid=None,
                     moe_args=(2, 1.25)):
    """x: (B, in_channels, T_frames) quantized latents -> (B, 1, L) waveform.

    backbone_fn: optional pipeline-parallel backbone hook (parallel/pp.py),
    as in conformer_encode. valid: optional (B,) ragged frame counts
    (masked backbone + per-sample ISTFT envelope).
    """
    if "input_proj" in params:
        x = conv1d(x, get_weight(params["input_proj"]), params["input_proj"].get("b"))
    if backbone_fn is None and valid is None:
        from ..parallel.pp import maybe_pp_backbone

        backbone_fn = maybe_pp_backbone(
            params["backbone"], dim=x.shape[1], n_head=n_head,
            rope_theta=rope_theta, max_seq_len=max_seq_len,
            conv_first=False, causal=causal, remat=remat)
    if backbone_fn is not None:
        x = backbone_fn(x, params["backbone"])
    else:
        x = conformer_backbone(x, params["backbone"], n_head=n_head,
                               rope_theta=rope_theta, max_seq_len=max_seq_len,
                               conv_first=False, causal=causal, remat=remat,
                               valid=valid, moe_args=moe_args)
    x = rms_norm(jnp.swapaxes(x, 1, 2), params["norm"])  # (B, T, dim)
    return istft_head(params["head_out"], x, n_fft=n_fft, hop_length=hop_length,
                      valid=valid)


def init_conformer_encoder(key, *, n_fft=800, dim=256, n_layers=6, n_head=8,
                           ffn_mult=4, conv_kernel_size=31, out_channels=256,
                           ffn_type="dense", moe_experts=4):
    k1, k2, k3 = jax.random.split(key, 3)
    stft_dim = n_fft // 2 + 1
    p = {
        "input_proj": init_conv1d(k1, 2 * stft_dim, dim, 1, torch_default=True),
        "input_norm": jnp.ones((dim,)),
        "backbone": init_conformer_backbone(k2, dim, n_layers, n_head=n_head,
                                            ffn_mult=ffn_mult,
                                            conv_kernel_size=conv_kernel_size,
                                            ffn_type=ffn_type,
                                            moe_experts=moe_experts),
        "norm": jnp.ones((dim,)),
    }
    if out_channels != dim:
        p["output_proj"] = init_wn_conv1d(k3, dim, out_channels, 1, torch_default=True)
    return p


def init_conformer_decoder(key, *, in_channels=256, n_fft=800, dim=256,
                           n_layers=6, n_head=8, ffn_mult=4,
                           conv_kernel_size=31, ffn_type="dense",
                           moe_experts=4):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "backbone": init_conformer_backbone(k1, dim, n_layers, n_head=n_head,
                                            ffn_mult=ffn_mult,
                                            conv_kernel_size=conv_kernel_size,
                                            ffn_type=ffn_type,
                                            moe_experts=moe_experts),
        "norm": jnp.ones((dim,)),
        "head_out": init_linear(k2, dim, n_fft + 2),
    }
    if in_channels != dim:
        p["input_proj"] = init_wn_conv1d(k3, in_channels, dim, 1, torch_default=True)
    return p
