"""BigCodec convolutional encoder / decoder.

Reference: BigCodec_SSL/vq/codec_encoder.py:14-90 (encoder) and
vq/codec_decoder.py:15-142 (decoder + owned quantizer), built from the blocks
in vq/module.py:74-167.

Encoder: WNConv1d(1->ngf, k7, p3) -> 5x EncoderBlock (channels double per
stride in up_ratios=(2,2,2,5,5): 96->192->384->768->1536) -> 2-layer ResLSTM
-> SnakeBeta -> WNConv1d(->out_channels, k3, p1). hop = prod(up_ratios) = 200.

Decoder: owns the quantizer (two-phase forward like the reference:
``vq=True`` quantizes, ``vq=False`` synthesizes): WNConv1d(1024->1536, k7)
-> ResLSTM -> 5x DecoderBlock (transpose conv halving channels per
up_ratios=(5,5,2,2,2)) -> SnakeBeta -> WNConv1d(->1, k7) -> tanh.

Init fidelity note: the reference wraps every conv in weight_norm and then
calls reset_parameters, whose trunc_normal_ lands on the hook-recomputed
`.weight` and is therefore overwritten on first forward — the *effective*
init of weight-normed convs is the torch default (kaiming-uniform v,
g=||v||), with biases zeroed (the constant_(bias, 0) does stick). We
reproduce that effective init.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import snake as SN
from ..ops.alias_free import activation1d, make_resample_filters
from ..ops.conv import (causal_conv1d, causal_conv_transpose1d, conv1d,
                        conv_transpose1d, get_weight, init_wn_conv1d,
                        init_wn_conv_transpose1d)
from ..ops.lstm import init_lstm, res_lstm


def _wn_conv(x, p, *, stride=1, padding=0, dilation=1, causal=False):
    w = get_weight(p)
    if causal:
        return causal_conv1d(x, w, p.get("b"), stride=stride, dilation=dilation)
    return conv1d(x, w, p.get("b"), stride=stride, padding=padding, dilation=dilation)


def _wn_tconv(x, p, *, stride=1, padding=0, output_padding=0, causal=False):
    w = get_weight(p)
    if causal:
        return causal_conv_transpose1d(x, w, p.get("b"), stride=stride)
    return conv_transpose1d(x, w, p.get("b"), stride=stride, padding=padding,
                            output_padding=output_padding)


class _AA:
    """Static anti-aliasing filter pair for Activation1d (ratio 2, k 12)."""

    def __init__(self, antialias: bool):
        self.antialias = antialias
        if antialias:
            self.up = make_resample_filters(2)
            self.down = make_resample_filters(2)
        else:
            self.up = self.down = None

    def __call__(self, x, snake_params):
        return activation1d(
            x, lambda y: SN.snake_beta(y, snake_params["alpha"], snake_params["beta"]),
            antialias=self.antialias, up_filter=self.up, down_filter=self.down)


def residual_unit(x, p, *, dilation: int, causal: bool, aa: _AA):
    """x + [Snake, WNConv k7 dil, Snake, WNConv k1](x) (vq/module.py:74-89)."""
    pad = 0 if causal else ((7 - 1) * dilation) // 2
    y = aa(x, p["snake1"])
    y = _wn_conv(y, p["conv1"], padding=pad, dilation=dilation, causal=causal)
    y = aa(y, p["snake2"])
    y = _wn_conv(y, p["conv2"])
    return x + y


def encoder_block(x, p, *, stride: int, dilations, causal: bool, aa: _AA):
    """3 ResidualUnits -> Snake -> strided down conv (vq/module.py:91-113)."""
    for i, d in enumerate(dilations):
        x = residual_unit(x, p["units"][i], dilation=d, causal=causal, aa=aa)
    x = aa(x, p["snake"])
    if stride != 1:
        pad = 0 if causal else stride // 2 + stride % 2
        x = _wn_conv(x, p["down"], stride=stride, padding=pad, causal=causal)
    else:
        x = _wn_conv(x, p["down"])
    return x


def decoder_block(x, p, *, stride: int, dilations, causal: bool, aa: _AA):
    """Snake -> transpose conv -> 3 ResidualUnits (vq/module.py:115-141)."""
    x = aa(x, p["snake"])
    if stride != 1:
        pad = 0 if causal else stride // 2 + stride % 2
        outpad = 0 if causal else stride % 2
        x = _wn_tconv(x, p["up"], stride=stride, padding=pad, output_padding=outpad,
                      causal=causal)
    else:
        x = _wn_tconv(x, p["up"])
    for i, d in enumerate(dilations):
        x = residual_unit(x, p["units"][i], dilation=d, causal=causal, aa=aa)
    return x


def bigcodec_encode(params, x, *, up_ratios=(2, 2, 2, 5, 5), dilations=(1, 3, 9),
                    use_rnn: bool = True, rnn_num_layers: int = 2,
                    rnn_bidirectional: bool = False, causal: bool = False,
                    antialias: bool = False, remat: bool = False):
    """x: (B, 1, T) waveform -> (B, out_channels, T/hop) latents.

    remat=True wraps each EncoderBlock in jax.checkpoint — activations are
    recomputed in the backward pass instead of stored, trading ~1/3 more
    FLOPs for the memory that lets the full GAN step fit a 16 GB chip at the
    reference batch size (SURVEY.md §7 design note).
    """
    import functools

    aa = _AA(antialias)
    x = _wn_conv(x, params["conv_in"], padding=0 if causal else 3, causal=causal)
    for i, stride in enumerate(up_ratios):
        block_fn = functools.partial(encoder_block, stride=stride,
                                     dilations=dilations, causal=causal, aa=aa)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        x = block_fn(x, params["blocks"][i])
    if use_rnn:
        x = res_lstm(x, params["lstm"], num_layers=rnn_num_layers,
                     bidirectional=rnn_bidirectional)
    x = aa(x, params["snake_out"])
    x = _wn_conv(x, params["conv_out"], padding=0 if causal else 1, causal=causal)
    return x


def bigcodec_decode(params, x, *, up_ratios=(5, 5, 2, 2, 2), dilations=(1, 3, 9),
                    use_rnn: bool = True, rnn_num_layers: int = 2,
                    rnn_bidirectional: bool = False, causal: bool = False,
                    antialias: bool = False, remat: bool = False):
    """x: (B, in_channels, T_frames) quantized latents -> (B, 1, T) waveform."""
    import functools

    aa = _AA(antialias)
    x = _wn_conv(x, params["conv_in"], padding=0 if causal else 3, causal=causal)
    if use_rnn:
        x = res_lstm(x, params["lstm"], num_layers=rnn_num_layers,
                     bidirectional=rnn_bidirectional)
    for i, stride in enumerate(up_ratios):
        block_fn = functools.partial(decoder_block, stride=stride,
                                     dilations=dilations, causal=causal, aa=aa)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        x = block_fn(x, params["blocks"][i])
    x = aa(x, params["snake_out"])
    x = _wn_conv(x, params["conv_out"], padding=0 if causal else 3, causal=causal)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_wn_conv_zb(key, cin, cout, k):
    p = init_wn_conv1d(key, cin, cout, k, torch_default=True)
    p["b"] = jnp.zeros_like(p["b"])  # reference zeroes conv biases via init_weights
    return p


def _init_residual_unit(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": SN.init_snake_beta(dim),
        "conv1": _init_wn_conv_zb(k1, dim, dim, 7),
        "snake2": SN.init_snake_beta(dim),
        "conv2": _init_wn_conv_zb(k2, dim, dim, 1),
    }


def init_bigcodec_encoder(key, *, ngf=48, up_ratios=(2, 2, 2, 5, 5),
                          dilations=(1, 3, 9), out_channels=1024,
                          use_rnn=True, rnn_num_layers=2,
                          rnn_bidirectional=False) -> Dict[str, Any]:
    keys = jax.random.split(key, len(up_ratios) + 4)
    params: Dict[str, Any] = {"conv_in": _init_wn_conv_zb(keys[0], 1, ngf, 7)}
    d = ngf
    blocks = []
    for i, stride in enumerate(up_ratios):
        d *= 2
        bkeys = jax.random.split(keys[1 + i], len(dilations) + 1)
        block = {
            "units": [_init_residual_unit(bkeys[j], d // 2) for j in range(len(dilations))],
            "snake": SN.init_snake_beta(d // 2),
            "down": _init_wn_conv_zb(bkeys[-1], d // 2, d,
                                     2 * stride if stride != 1 else 1),
        }
        blocks.append(block)
    params["blocks"] = blocks
    if use_rnn:
        hid = d if not rnn_bidirectional else d // 2
        params["lstm"] = init_lstm(keys[-3], d, hid, num_layers=rnn_num_layers,
                                   bidirectional=rnn_bidirectional)
    params["snake_out"] = SN.init_snake_beta(d)
    params["conv_out"] = _init_wn_conv_zb(keys[-1], d, out_channels, 3)
    return params


def init_bigcodec_decoder(key, *, in_channels=1024, upsample_initial_channel=1536,
                          up_ratios=(5, 5, 2, 2, 2), dilations=(1, 3, 9),
                          use_rnn=True, rnn_num_layers=2,
                          rnn_bidirectional=False) -> Dict[str, Any]:
    keys = jax.random.split(key, len(up_ratios) + 4)
    ch = upsample_initial_channel
    params: Dict[str, Any] = {"conv_in": _init_wn_conv_zb(keys[0], in_channels, ch, 7)}
    if use_rnn:
        hid = ch if not rnn_bidirectional else ch // 2
        params["lstm"] = init_lstm(keys[-3], ch, hid, num_layers=rnn_num_layers,
                                   bidirectional=rnn_bidirectional)
    blocks = []
    out_dim = ch
    for i, stride in enumerate(up_ratios):
        in_dim = ch // (2 ** i)
        out_dim = ch // (2 ** (i + 1))
        bkeys = jax.random.split(keys[1 + i], len(dilations) + 1)
        block = {
            "snake": SN.init_snake_beta(in_dim),
            "up": init_wn_conv_transpose1d(bkeys[-1], in_dim, out_dim,
                                           2 * stride if stride != 1 else 1),
            "units": [_init_residual_unit(bkeys[j], out_dim) for j in range(len(dilations))],
        }
        blocks.append(block)
    params["blocks"] = blocks
    params["snake_out"] = SN.init_snake_beta(out_dim)
    params["conv_out"] = _init_wn_conv_zb(keys[-1], out_dim, 1, 7)
    return params
