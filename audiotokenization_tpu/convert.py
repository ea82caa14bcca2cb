"""PyTorch checkpoint -> JAX param-tree converter.

Maps the reference's state-dict layout (BigCodec_SSL/lightning_module.py
module tree: `encoder.*` / `decoder.*` with `decoder.quantizer.*`, plus
discriminators) onto this framework's nested param dicts. Weight-normed
tensors keep their (v, g) split so converted checkpoints are usable for both
continued training and (after fold_weight_norm) inference.

Input is a flat {name: numpy array} dict — callers extract it from a torch
checkpoint (`torch.load(...)['state_dict']`, see extract CLI) so this module
itself never imports torch.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _j(a):
    return jnp.asarray(np.asarray(a))


class _View:
    """Prefix view over a flat state dict, tolerant of causal `.conv.` nesting."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name: str) -> "_View":
        return _View(self.sd, f"{self.prefix}{name}.")

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd or (self.prefix + "conv." + name) in self.sd

    def get(self, name: str):
        key = self.prefix + name
        if key in self.sd:
            return _j(self.sd[key])
        key2 = self.prefix + "conv." + name  # CausalConv wraps an inner .conv
        if key2 in self.sd:
            return _j(self.sd[key2])
        raise KeyError(key)


def _conv(v: _View) -> Dict[str, Any]:
    """Weight-normed or plain conv/linear params."""
    if v.has("weight_v"):
        p = {"v": v.get("weight_v"), "g": v.get("weight_g")}
    else:
        p = {"w": v.get("weight")}
    if v.has("bias"):
        p["b"] = v.get("bias")
    return p


def _snake(v: _View) -> Dict[str, Any]:
    return {"alpha": v.get("act.alpha"), "beta": v.get("act.beta")}


def _lstm(v: _View, num_layers: int, bidirectional: bool = False):
    layers = []
    for l in range(num_layers):
        p = {}
        for suffix, tsuf in ([("", "")] if not bidirectional else [("", ""), ("_r", "_reverse")]):
            p["w_ih" + suffix] = v.get(f"lstm.weight_ih_l{l}{tsuf}")
            p["w_hh" + suffix] = v.get(f"lstm.weight_hh_l{l}{tsuf}")
            p["b_ih" + suffix] = v.get(f"lstm.bias_ih_l{l}{tsuf}")
            p["b_hh" + suffix] = v.get(f"lstm.bias_hh_l{l}{tsuf}")
        layers.append(p)
    return layers


def _residual_unit(v: _View) -> Dict[str, Any]:
    return {
        "snake1": _snake(v.sub("block.0")),
        "conv1": _conv(v.sub("block.1")),
        "snake2": _snake(v.sub("block.2")),
        "conv2": _conv(v.sub("block.3")),
    }


def convert_bigcodec_encoder(sd: Mapping[str, Any], *, n_blocks: int = 5,
                             n_units: int = 3, use_rnn: bool = True,
                             rnn_num_layers: int = 2,
                             rnn_bidirectional: bool = False,
                             prefix: str = "") -> Dict[str, Any]:
    """Reference BigCodecEncoder `block` Sequential layout (codec_encoder.py:33-57)."""
    v = _View(sd, prefix)
    params: Dict[str, Any] = {"conv_in": _conv(v.sub("block.0"))}
    blocks = []
    for i in range(n_blocks):
        bv = v.sub(f"block.{1 + i}")
        blocks.append({
            "units": [_residual_unit(bv.sub(f"block.{j}")) for j in range(n_units)],
            "snake": _snake(bv.sub(f"block.{n_units}")),
            "down": _conv(bv.sub(f"block.{n_units + 1}")),
        })
    params["blocks"] = blocks
    idx = 1 + n_blocks
    if use_rnn:
        params["lstm"] = _lstm(v.sub(f"block.{idx}"), rnn_num_layers, rnn_bidirectional)
        idx += 1
    params["snake_out"] = _snake(v.sub(f"block.{idx}"))
    params["conv_out"] = _conv(v.sub(f"block.{idx + 1}"))
    return params


def convert_bigcodec_decoder(sd: Mapping[str, Any], *, n_blocks: int = 5,
                             n_units: int = 3, use_rnn: bool = True,
                             rnn_num_layers: int = 2,
                             rnn_bidirectional: bool = False,
                             prefix: str = "") -> Dict[str, Any]:
    """Reference BigCodecDecoder `model` Sequential layout (codec_decoder.py:59-81)."""
    v = _View(sd, prefix)
    params: Dict[str, Any] = {"conv_in": _conv(v.sub("model.0"))}
    idx = 1
    if use_rnn:
        params["lstm"] = _lstm(v.sub(f"model.{idx}"), rnn_num_layers, rnn_bidirectional)
        idx += 1
    blocks = []
    for i in range(n_blocks):
        bv = v.sub(f"model.{idx + i}")
        blocks.append({
            "snake": _snake(bv.sub("block.0")),
            "up": _conv(bv.sub("block.1")),
            "units": [_residual_unit(bv.sub(f"block.{2 + j}")) for j in range(n_units)],
        })
    params["blocks"] = blocks
    idx += n_blocks
    params["snake_out"] = _snake(v.sub(f"model.{idx}"))
    params["conv_out"] = _conv(v.sub(f"model.{idx + 1}"))
    return params


def convert_residual_vq(sd: Mapping[str, Any], *, num_quantizers: int = 1,
                        prefix: str = "quantizer.") -> Dict[str, Any]:
    """FactorizedVQ stack (factorized_vector_quantize.py:17-23, residual_vq.py:18)."""
    v = _View(sd, prefix)
    layers = []
    for q in range(num_quantizers):
        lv = v.sub(f"layers.{q}")
        layer: Dict[str, Any] = {"codebook": lv.get("_codebook.weight")}
        if lv.has("in_proj.weight_v") or lv.has("in_proj.weight"):
            layer["in_proj"] = _conv(lv.sub("in_proj"))
            layer["out_proj"] = _conv(lv.sub("out_proj"))
        layers.append(layer)
    return {"layers": layers}


def convert_conformer_encoder(sd: Mapping[str, Any], *, n_layers: int,
                              prefix: str = "") -> Dict[str, Any]:
    """ConformerEncoderSTFT layout (codec_encoder.py:124-209)."""
    v = _View(sd, prefix)
    params: Dict[str, Any] = {
        "input_proj": _conv(v.sub("input_proj")),
        "input_norm": v.get("input_norm.weight"),
        "backbone": _convert_backbone(v.sub("conformer_backbone"), n_layers),
        "norm": v.get("norm.weight"),
    }
    if v.has("output_proj.weight_v") or v.has("output_proj.weight"):
        params["output_proj"] = _conv(v.sub("output_proj"))
    return params


def convert_conformer_decoder(sd: Mapping[str, Any], *, n_layers: int,
                              prefix: str = "") -> Dict[str, Any]:
    """ConformerDecoderISTFT layout (codec_decoder.py:385-460)."""
    v = _View(sd, prefix)
    params: Dict[str, Any] = {
        "backbone": _convert_backbone(v.sub("conformer_backbone"), n_layers),
        "norm": v.get("norm.weight"),
        "head_out": _conv(v.sub("head.out")),
    }
    if v.has("input_proj.weight_v") or v.has("input_proj.weight"):
        params["input_proj"] = _conv(v.sub("input_proj"))
    return params


def _convert_backbone(v: _View, n_layers: int) -> Dict[str, Any]:
    layers = []
    for l in range(n_layers):
        lv = v.sub(f"layers.{l}")
        layers.append({
            "ffn1": {"w1": _conv(lv.sub("ffn1.w1")), "w2": _conv(lv.sub("ffn1.w2")),
                     "w3": _conv(lv.sub("ffn1.w3"))},
            "ffn2": {"w1": _conv(lv.sub("ffn2.w1")), "w2": _conv(lv.sub("ffn2.w2")),
                     "w3": _conv(lv.sub("ffn2.w3"))},
            "attn": {"qkv": _conv(lv.sub("self_attn.qkv_proj")),
                     "out": _conv(lv.sub("self_attn.out_proj"))},
            "conv": {"pw1": _conv(lv.sub("conv.pointwise_conv1")),
                     "dw": _conv(lv.sub("conv.depthwise_conv")),
                     "pw2": _conv(lv.sub("conv.pointwise_conv2")),
                     "norm": lv.get("conv.conv_norm.weight")},
            "attn_norm": lv.get("attn_norm_in.weight"),
            "conv_norm": lv.get("conv_norm_in.weight"),
            "ffn1_norm": lv.get("ffn1_norm_in.weight"),
            "ffn2_norm": lv.get("ffn2_norm_in.weight"),
        })
    return {"layers": layers}


def convert_mpd(sd: Mapping[str, Any], *, n_periods: int = 5, n_stages: int = 5,
                prefix: str = "") -> Dict[str, Any]:
    """HiFiGANMultiPeriodDiscriminator layout (module/mpd.py:46-72, 122-126)."""
    v = _View(sd, prefix)
    discs = []
    for i in range(n_periods):
        dv = v.sub(f"discriminators.{i}")
        convs = [_conv(dv.sub(f"convs.{j}.0")) for j in range(n_stages)]
        discs.append({"convs": convs, "out": _conv(dv.sub("output_conv"))})
    return {"discs": discs}


def convert_spec_discriminator(sd: Mapping[str, Any], *, n_resolutions: int = 5,
                               n_downsample: int = 3,
                               prefix: str = "") -> Dict[str, Any]:
    """SpecDiscriminator layout (module/mstft.py:34-43, 97-135)."""
    v = _View(sd, prefix)
    discs = []
    n_layers = n_downsample + 3
    for i in range(n_resolutions):
        dv = v.sub(f"model.disc_{i}")
        layers = []
        for j in range(n_layers):
            if j < n_layers - 1:
                layers.append(_conv(dv.sub(f"model.layer_{j}.0")))
            else:
                layers.append(_conv(dv.sub(f"model.layer_{j}")))
        discs.append({"layers": layers})
    return {"discs": discs}


def split_lightning_state_dict(sd: Mapping[str, Any]):
    """Split a CodecLightningModule state dict into per-module flat dicts.

    Returns dict with keys encoder/decoder/discriminator/spec_discriminator/...
    matching lightning_module.py:87-194's attribute names.
    """
    groups: Dict[str, Dict[str, Any]] = {}
    for k, val in sd.items():
        head, _, rest = k.partition(".")
        groups.setdefault(head, {})[rest] = val
    return groups
