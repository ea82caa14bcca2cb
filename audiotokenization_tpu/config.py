"""Typed configuration system.

Replaces the reference's Hydra YAML groups (BigCodec_SSL/config/ — groups
preprocess/dataset/model/train composed by @hydra.main, train.py:19) with
plain dataclasses + a YAML/JSON overlay loader that preserves the same group
structure and field names, so reference config trees translate 1:1.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple


@dataclass
class EncoderConfig:
    """codec_encoder group (config/model/default.yaml:1-11, config1/model/base.yaml)."""
    type: str = "bigcodec"  # bigcodec | conformer_stft
    out_channels: int = 1024
    # bigcodec fields
    ngf: int = 48
    use_rnn: bool = True
    rnn_bidirectional: bool = False
    rnn_num_layers: int = 2
    up_ratios: Tuple[int, ...] = (2, 2, 2, 5, 5)
    dilations: Tuple[int, ...] = (1, 3, 9)
    causal: bool = False
    antialias: bool = False
    # conformer_stft fields
    hop_length: int = 200
    n_fft: int = 800
    window_size: int = 800
    dim: int = 256
    n_layers: int = 6
    n_head: int = 8
    ffn_mult: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    max_seq_len: int = 8192
    rope_theta: float = 10000.0
    # conformer FFN type: "dense" (the reference's SwiGLU, vq/module.py:455)
    # or "moe" — GShard/Switch mixture-of-experts SwiGLU (ops/moe.py), the
    # width-scaling axis; experts shard over the TP mesh's 'model' axis
    # (expert parallelism) under train.tensor_parallel
    ffn_type: str = "dense"
    moe_experts: int = 4
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25


@dataclass
class DecoderConfig:
    """codec_decoder group (config/model/default.yaml:13-32)."""
    type: str = "bigcodec"  # bigcodec | conformer_istft
    in_channels: int = 1024
    upsample_initial_channel: int = 1536
    ngf: int = 48
    use_rnn: bool = True
    rnn_bidirectional: bool = False
    rnn_num_layers: int = 2
    up_ratios: Tuple[int, ...] = (5, 5, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 3, 9)
    causal: bool = False
    antialias: bool = False
    # quantizer
    quantizer: str = "fvq"  # fvq | fsq | lfq | ema_vq | sim_vq | rpq (fvq == reference default)
    fsq: bool = False  # reference-compat switch; True forces quantizer=fsq
    fsq_levels: Tuple[int, ...] = (4, 4, 4, 8)
    vq_num_quantizers: int = 1
    vq_commit_weight: float = 0.25
    vq_weight_init: bool = False
    vq_full_commit_loss: bool = False
    vq_cosine_sim: bool = False  # ema_vq: CosineSimCodebook variant
    codebook_size: int = 8192
    codebook_dim: int = 8
    # conformer_istft fields
    hop_length: int = 200
    n_fft: int = 800
    window_size: int = 800
    dim: int = 256
    n_layers: int = 6
    n_head: int = 8
    ffn_mult: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    max_seq_len: int = 8192
    rope_theta: float = 10000.0
    # conformer FFN type: "dense" (the reference's SwiGLU, vq/module.py:455)
    # or "moe" — GShard/Switch mixture-of-experts SwiGLU (ops/moe.py), the
    # width-scaling axis; experts shard over the TP mesh's 'model' axis
    # (expert parallelism) under train.tensor_parallel
    ffn_type: str = "dense"
    moe_experts: int = 4
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25


@dataclass
class MPDConfig:
    """mpd group (config/model/default.yaml:34-38)."""
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    max_downsample_channels: int = 512
    channels: int = 16
    channel_increasing_factor: int = 4


@dataclass
class STFTParams:
    fft_sizes: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    hop_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    win_lengths: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    window: str = "hann_window"


@dataclass
class MSTFTConfig:
    """mstft group (config/model/default.yaml:40-53)."""
    stft_params: STFTParams = field(default_factory=STFTParams)
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Tuple[int, ...] = (5, 3)
    channels: int = 32
    max_downsample_channels: int = 512
    downsample_scales: Tuple[int, ...] = (2, 2, 2)
    use_weight_norm: bool = True


@dataclass
class ModelConfig:
    codec_encoder: EncoderConfig = field(default_factory=EncoderConfig)
    codec_decoder: DecoderConfig = field(default_factory=DecoderConfig)
    mpd: MPDConfig = field(default_factory=MPDConfig)
    mstft: MSTFTConfig = field(default_factory=MSTFTConfig)


@dataclass
class Lambdas:
    """Loss weights (config/train/default.yaml:14-21)."""
    lambda_disc: float = 1.0
    lambda_feat_match_loss: float = 1.0
    lambda_mel_loss: float = 15.0
    lambda_adv: float = 1.0
    lambda_stft_loss: float = 1.0
    lambda_semantic_loss: float = 5.0
    lambda_perceptual_loss: float = 0.0
    # MoE router aux losses (Switch Transformers defaults), active when a
    # conformer side has ffn_type: moe
    lambda_moe_load_balance: float = 0.01
    lambda_moe_router_z: float = 0.001


@dataclass
class OptimParams:
    lr: float = 1.0  # base lr; the schedule emits absolute LR (common/schedulers.py)
    betas: Tuple[float, float] = (0.8, 0.9)
    weight_decay: float = 0.01  # torch AdamW default
    eps: float = 1e-8


@dataclass
class ScheduleParams:
    """WarmupLR params (config/train/default.yaml:47-56)."""
    warmup_step: int = 1000
    down_step: int = 500000
    min_lr: float = 1.0e-5
    max_lr: float = 1.0e-4


@dataclass
class TrainConfig:
    max_steps: int = 600000
    precision: str = "bf16"  # bf16 | fp32 | fp32_strict (reference: '16-mixed'; fp32 keeps fp32 tensors with fast matmuls, fp32_strict forces fp32 MXU accumulation)
    # jax.checkpoint on codec blocks + discriminators during training.
    # True | False | "auto": auto turns remat OFF when the step fits without
    # it (measured on a 16 GB v5e: bf16 bs32 x 1 s fits remat-free and runs
    # 23% faster — 0.333 vs 0.409 s/step; fp32 at that size OOMs).
    remat: Any = "auto"
    # shard params + optimizer state over the 'data' mesh axis (ZeRO-3/FSDP
    # via GSPMD shardings; parallel/mesh.fsdp_state_shardings). Memory knob
    # for big variants/multi-host runs; numerically equal to replicated DP
    # (test_train_step_fsdp_matches_replicated).
    fsdp: bool = False
    # Megatron-style tensor parallelism for conformer backbones (beyond the
    # reference, which has no TP — SURVEY §2.8): devices reshape to a
    # ('data', 'model') mesh with model as the fast/inner ICI axis;
    # attention/FFN weights shard over 'model' (parallel/tp.py). 1 = off.
    # Requires a conformer encoder/decoder with heads/dims divisible by it;
    # composes with fsdp (non-TP leaves shard over 'data').
    tensor_parallel: int = 1
    # GPipe pipeline parallelism for conformer backbones (beyond the
    # reference — SURVEY §2.8): devices reshape to a ('data', 'pipe') mesh;
    # the layer stack splits into `pipeline_parallel` contiguous stages with
    # activations ppermute-streamed between neighbors (parallel/pp.py), the
    # depth-scaling axis for stacks that exceed one chip's HBM. 1 = off.
    # Requires conformer encoder/decoder layer counts divisible by it.
    pipeline_parallel: int = 1
    # microbatches per GPipe tick (0 = one per stage). More microbatches
    # amortize the P-1 warm-up bubble; must divide the global batch.
    pipeline_microbatches: int = 0
    # non-finite step guard (beyond the reference): when a side's total loss
    # is NaN/inf, keep that side's params/opt-state instead of applying the
    # poisoned update (a jnp.where select inside the step — no host sync).
    # Skipped steps surface as metrics["nonfinite_skipped"].
    guard_nonfinite: bool = False
    seed: int = 1024
    lambdas: Lambdas = field(default_factory=Lambdas)
    use_mel_loss: bool = True
    use_feat_match_loss: bool = True
    use_stft_loss: bool = False
    use_semantic: bool = False
    concat_semantic: bool = True
    # in-loop SSL teacher (w2v-bert-2.0) architecture knobs: defaults match
    # facebook/w2v-bert-2.0 (hidden 1024 is fixed — the fc_prior/fc_post_s
    # dims depend on it); teacher_layer is the tapped hidden state
    # (lightning_module.py:234: hidden_states[16])
    teacher_layer: int = 16
    teacher_layers: int = 24
    teacher_heads: int = 16
    teacher_intermediate: int = 4096
    stft_loss_params: STFTParams = field(default_factory=STFTParams)
    gen_optim_params: OptimParams = field(default_factory=OptimParams)
    disc_optim_params: OptimParams = field(default_factory=OptimParams)
    gen_grad_clip: float = 1.0
    disc_grad_clip: float = 1.0
    gen_schedule_params: ScheduleParams = field(default_factory=ScheduleParams)
    disc_schedule_params: ScheduleParams = field(default_factory=ScheduleParams)
    val_every_n_steps: int = 5000
    checkpoint_every_n_steps: int = 10000
    log_every_n_steps: int = 50
    # validation batches run once at fit start before training (the
    # reference's num_sanity_val_steps: 4, config/train/default.yaml:9) so a
    # broken eval path crashes at step 0, not at step val_every_n_steps;
    # metrics are discarded (a sanity_val_ok marker lands in the JSONL)
    num_sanity_val_steps: int = 4
    # accumulate generator AND discriminator gradients over N micro-batches
    # per optimizer step (reference trainer surface:
    # accumulate_grad_batches, cfgs/config2/train/default.yaml:10). The
    # loader still yields the full effective batch; the step scans it in N
    # slices, so activation memory scales with batch_size // N — the honest
    # path to effective bs64 on a 16 GB chip (BASELINE.md: bs64 remat-off
    # fails to compile). N=1 is the fused single-pass step.
    accumulate_grad_batches: int = 1


@dataclass
class DatasetSplit:
    filelist: str = ""
    batch_size: int = 32
    shuffle: bool = True
    min_audio_length: int = 16000  # -1 = full length
    log_idxs: Tuple[int, ...] = (0, 1, 2, 3)
    # host-side STOI/PESQ are computed on the first N items of each val
    # batch (the reference's torchmetrics update covers the full batch but
    # runs on GPU-adjacent CPU; here the cap keeps the host out of the
    # device's way). Raise to batch_size for full-batch parity.
    quality_metric_items: int = 4


@dataclass
class DatasetConfig:
    train: DatasetSplit = field(default_factory=lambda: DatasetSplit(shuffle=True))
    val: DatasetSplit = field(default_factory=lambda: DatasetSplit(shuffle=False))
    test: DatasetSplit = field(default_factory=lambda: DatasetSplit(
        batch_size=1, shuffle=False, min_audio_length=-1))
    sample_rate: int = 16000
    pad_to_multiple_of: int = 320


@dataclass
class Config:
    name: str = "bigcodec-tpu"
    log_dir: str = "runs"
    debug: bool = False
    resume_ckpt: Optional[str] = None
    ckpt: Optional[str] = None
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)


# ---------------------------------------------------------------------------
# Overlay loading
# ---------------------------------------------------------------------------

def resolve_remat(cfg) -> bool:
    """Resolve cfg.train.remat ("auto" | bool) to a concrete bool.

    "auto" turns rematerialization OFF when the GAN step is known to fit
    HBM without it: calibrated on a 16 GB v5e chip, where bf16 at the
    flagship size (batch 32 x 1 s crops) runs remat-free at 0.333 s/step vs
    0.409 with remat, while fp32 at that size ResourceExhausts. Anything at
    or below that activation footprint (batch x crop samples) goes
    remat-free under bf16; everything else keeps remat on.
    """
    r = cfg.train.remat
    if isinstance(r, bool):
        return r
    if r != "auto":
        raise ValueError(f"train.remat must be bool or 'auto', got {r!r}")
    crop = cfg.dataset.train.min_audio_length
    if crop is None or crop < 0:
        crop = cfg.dataset.sample_rate  # full-length: assume >= 1 s clips
    # grad accumulation scans micro-batches, so live activations scale with
    # the MICRO batch, not the effective batch
    n_acc = max(int(cfg.train.accumulate_grad_batches), 1)
    work = cfg.dataset.train.batch_size * crop // n_acc
    return not (cfg.train.precision == "bf16" and work <= 32 * 16000)


def _merge(obj, overlay: dict):
    """Recursively apply a dict overlay onto a dataclass instance."""
    for k, v in overlay.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key {k!r} for {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge(cur, v)
        else:
            fields = {f.name: f for f in dataclasses.fields(obj)}
            ftype = fields[k].type if k in fields else None
            if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                v = tuple(v)
            setattr(obj, k, v)
    return obj


def load_config(path: str | Path | None = None, overrides: Sequence[str] = ()) -> Config:
    """Build a Config from an optional YAML/JSON file plus dotted overrides.

    Overrides use `a.b.c=value` syntax (values parsed as JSON when possible),
    mirroring Hydra's CLI ergonomics without the framework.
    """
    cfg = Config()
    if path is not None:
        text = Path(path).read_text()
        if str(path).endswith((".yaml", ".yml")):
            import yaml

            data = yaml.safe_load(text)
        else:
            data = json.loads(text)
        if data:
            _merge(cfg, data)
    for ov in overrides:
        key, _, raw = ov.partition("=")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        _merge(obj, {parts[-1]: val})
    return cfg


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg, path: str | Path):
    Path(path).write_text(json.dumps(to_dict(cfg), indent=2))
