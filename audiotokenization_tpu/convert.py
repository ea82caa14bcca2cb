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


def reference_config_to_config(ref_cfg: Mapping[str, Any]):
    """Map a composed reference Hydra config (dict) onto our typed Config.

    Handles the field layout of BigCodec_SSL/config*/ trees; unknown keys are
    ignored so archive experiment configs load too.
    """
    from .config import Config

    cfg = Config()

    def apply(obj, src: Mapping[str, Any]):
        for k, v in (src or {}).items():
            if not hasattr(obj, k):
                continue
            cur = getattr(obj, k)
            if hasattr(cur, "__dataclass_fields__") and isinstance(v, Mapping):
                apply(cur, v)
            elif isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                setattr(obj, k, tuple(v))
            elif not isinstance(v, Mapping):
                setattr(obj, k, v)

    model = ref_cfg.get("model", {})
    apply(cfg.model.codec_encoder, model.get("codec_encoder", {}))
    apply(cfg.model.codec_decoder, model.get("codec_decoder", {}))
    apply(cfg.model.mpd, model.get("mpd", {}))
    apply(cfg.model.mstft, model.get("mstft", {}))
    sp = model.get("mstft", {}).get("stft_params")
    if sp:
        apply(cfg.model.mstft.stft_params, sp)
    apply(cfg.train, ref_cfg.get("train", {}))
    if "lambdas" in ref_cfg.get("train", {}):
        apply(cfg.train.lambdas, ref_cfg["train"]["lambdas"])
    ds = ref_cfg.get("dataset", {})
    for split in ("train", "val", "test"):
        if split in ds:
            apply(getattr(cfg.dataset, split), ds[split])
    for k in ("sample_rate", "pad_to_multiple_of"):
        if k in ds:
            setattr(cfg.dataset, k, ds[k])
    if "name" in ref_cfg:
        cfg.name = ref_cfg["name"]
    return cfg


def convert_codec_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Full CodecLightningModule state dict -> our codec params tree.

    Accepts the lightning layout (encoder.* / decoder.* with the quantizer
    under decoder.quantizer.*, lightning_module.py:87-194).
    """
    groups = split_lightning_state_dict(sd)
    e, d = cfg.model.codec_encoder, cfg.model.codec_decoder
    enc_sd = groups.get("encoder", {})
    dec_sd = groups.get("decoder", {})
    if e.type == "bigcodec":
        enc = convert_bigcodec_encoder(
            enc_sd, n_blocks=len(e.up_ratios), n_units=len(e.dilations),
            use_rnn=e.use_rnn, rnn_num_layers=e.rnn_num_layers,
            rnn_bidirectional=e.rnn_bidirectional)
    else:
        enc = convert_conformer_encoder(enc_sd, n_layers=e.n_layers)
    if d.type == "bigcodec":
        dec = convert_bigcodec_decoder(
            dec_sd, n_blocks=len(d.up_ratios), n_units=len(d.dilations),
            use_rnn=d.use_rnn, rnn_num_layers=d.rnn_num_layers,
            rnn_bidirectional=d.rnn_bidirectional)
    else:
        dec = convert_conformer_decoder(dec_sd, n_layers=d.n_layers)
    if d.fsq:
        q: Dict[str, Any] = {}
        qv = _View(dec_sd, "quantizer.")
        if qv.has("project_in.weight"):
            q["project_in"] = _conv(qv.sub("project_in"))
            q["project_out"] = _conv(qv.sub("project_out"))
    else:
        q = convert_residual_vq(dec_sd, num_quantizers=d.vq_num_quantizers)
    params = {"encoder": enc, "decoder": dec, "quantizer": q}
    if "fc_prior" in groups:
        params["semantic"] = convert_semantic_heads(groups)
    return params


def convert_semantic_heads(groups: Mapping[str, Mapping[str, Any]]) -> Dict[str, Any]:
    """fc_prior/fc_post_a/fc_post_s + Semantic{En,De}coder (lightning_module.py:185-191)."""
    def lin(g):
        return {"w": _j(g["weight"]), "b": _j(g["bias"])}

    def sem_module(g):
        v = _View(g)
        return {
            "initial": _conv(v.sub("initial_conv")),
            "res1": _conv(v.sub("residual_blocks.1")),
            "res2": _conv(v.sub("residual_blocks.3")),
            "final": _conv(v.sub("final_conv")),
        }

    return {
        "fc_prior": lin(groups["fc_prior"]),
        "fc_post_a": lin(groups["fc_post_a"]),
        "fc_post_s": lin(groups["fc_post_s"]),
        "encoder": sem_module(groups["SemanticEncoder_module"]),
        "decoder": sem_module(groups["SemanticDecoder_module"]),
    }


def load_reference_checkpoint(save_path):
    """Load (cfg, params) from a reference run dir or a .ckpt file.

    Mirrors the checkpoint discovery of extract_indices.py:438-443
    (hydra/config.yaml + pl_log/last.ckpt | checkpoints/last.ckpt | last.ckpt)
    but maps onto the *current* module layout (encoder/decoder), fixing the
    reference CLI's legacy-layout mismatch noted in SURVEY.md §3.2.
    Requires torch (for torch.load) and yaml.
    """
    import pathlib

    import torch
    import yaml

    p = pathlib.Path(save_path)
    if p.is_file():
        ckpt_path = p
        cfg_path = p.parent.parent / "hydra" / "config.yaml"
        if not cfg_path.exists():
            cfg_path = p.parent / "config.yaml"
    else:
        cfg_path = p / "hydra" / "config.yaml"
        ckpt_path = None
        for cand in ("pl_log/last.ckpt", "checkpoints/last.ckpt", "last.ckpt"):
            if (p / cand).exists():
                ckpt_path = p / cand
                break
        if ckpt_path is None:
            raise FileNotFoundError(f"no checkpoint under {p}")
    ref_cfg = yaml.safe_load(cfg_path.read_text())
    cfg = reference_config_to_config(ref_cfg)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return cfg, convert_codec_state_dict(sd, cfg)


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
