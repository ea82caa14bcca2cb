"""Codec model facade: encoder + quantizer + decoder as pure functions.

Mirrors CodecLightningModule.construct_model / forward
(BigCodec_SSL/lightning_module.py:87-194, 225-278) — encoder and decoder
types are config-selected, the quantizer is owned by the decoder side, and
the two-phase decoder semantics (quantize vs synthesize) become explicit
``quantize`` / ``decode`` functions.

Params tree:
  {"encoder": ..., "quantizer": ..., "decoder": ...[, "semantic": ...]}
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import bigcodec, conformer
from .quantizers import factorized_vq as fvq
from .quantizers.fsq import fsq_apply, fsq_codes_to_emb


class CodecOutput(NamedTuple):
    gt_wav: jnp.ndarray        # (B, 1, T)
    gen_wav: jnp.ndarray       # (B, 1, T)
    vq_loss: jnp.ndarray       # (Nq,)
    vq_code: jnp.ndarray       # (Nq, B, T_frames)
    semantic_recon_loss: jnp.ndarray | None = None
    quantizer_state: Any = None  # updated non-gradient quantizer state (EMA path)
    # (3,) [load_balance, router_z, sg(dropped_frac)] means over the MoE
    # layers when a conformer side has ffn_type: moe (ops/moe.py); None for
    # dense models
    moe_aux_loss: jnp.ndarray | None = None


def uses_moe(cfg: Config) -> bool:
    return (getattr(cfg.model.codec_encoder, "ffn_type", "dense") == "moe"
            or getattr(cfg.model.codec_decoder, "ffn_type", "dense") == "moe")


def encode(params, cfg: Config, wav, *, remat: bool = False):
    """wav: (B, T) -> latents (B, C, T_frames)."""
    e = cfg.model.codec_encoder
    x = wav[:, None, :]
    if e.type == "bigcodec":
        return bigcodec.bigcodec_encode(
            params["encoder"], x, up_ratios=tuple(e.up_ratios),
            dilations=tuple(e.dilations), use_rnn=e.use_rnn,
            rnn_num_layers=e.rnn_num_layers,
            rnn_bidirectional=e.rnn_bidirectional, causal=e.causal,
            antialias=e.antialias, remat=remat)
    if e.type == "conformer_stft":
        return conformer.conformer_encode(
            params["encoder"], x, hop_length=e.hop_length, n_fft=e.n_fft,
            window_size=e.window_size, n_head=e.n_head, rope_theta=e.rope_theta,
            max_seq_len=e.max_seq_len, causal=e.causal, remat=remat,
            moe_args=(e.moe_top_k, e.moe_capacity_factor))
    raise ValueError(f"unknown encoder type {e.type}")


def quantize(params, cfg: Config, latents, *, training: bool = False,
             with_state: bool = False, step=None):
    """latents (B, C, Tf) -> (quantized (B, C, Tf), codes (Nq, B, Tf), loss (Nq,))
    [, updated quantizer state when with_state=True].

    Matches decoder.forward(x, vq=True) (codec_decoder.py:85-92): FSQ returns
    zero commit loss; the default path is the factorized ResidualVQ. The
    ema_vq / lfq selections expose the quantizer-zoo members as drop-in codec
    quantizers; EMA codebook statistics are state, returned separately and
    swapped into gen_params by the train step after the optimizer update.

    step: the training step counter (traced scalar), used to salt the EMA
    quantizer's PRNG so kmeans-init / dead-code-expiry sampling is fresh
    every step — the reference's expiry sampling draws fresh randomness per
    call (vector_quantize_pytorch.py:474-484). Falls back to a data-derived
    salt when no step is threaded (non-training callers don't consume rng).
    """
    d = cfg.model.codec_decoder
    q = "fsq" if d.fsq else d.quantizer
    qstate = None
    if q == "fsq":
        zq, codes = fsq_apply(params["quantizer"], latents, levels=tuple(d.fsq_levels))
        out = zq, codes[None], jnp.zeros((1,), latents.dtype)
    elif q == "fvq":
        out = fvq.residual_vq_apply(
            params["quantizer"], latents, num_quantizers=d.vq_num_quantizers,
            commitment=d.vq_commit_weight, training=training)
    elif q == "ema_vq":
        from .quantizers.ema_vq import ema_vq_apply

        if step is not None:
            salt = jnp.asarray(step).astype(jnp.int32).reshape(())
        else:
            salt = jnp.sum((latents[:, 0, 0] * 1e3).astype(jnp.int32) % 7919)
        rng = jax.random.fold_in(jax.random.key(0), salt)
        # kmeans_init=False is STATIC: the codec's init_ema_vq starts with
        # initted=1 (random normal codebook, no kmeans), so the cond's
        # 10-iteration kmeans branch would be dead weight in every hot step
        res = ema_vq_apply(params["quantizer"], latents, training=training,
                           commitment=d.vq_commit_weight, rng=rng,
                           use_cosine_sim=d.vq_cosine_sim, kmeans_init=False)
        out = res.quantized, res.indices[None], jnp.mean(res.loss)[None]
        qstate = res.state
    elif q == "lfq":
        from .quantizers.lfq import lfq_apply

        res = lfq_apply(latents, commit_weight=d.vq_commit_weight,
                        training=training)
        out = (res.quantized, res.indices[None],
               jnp.stack([jnp.mean(res.commit_loss) + res.entropy_aux_loss]))
    else:
        raise ValueError(f"unknown quantizer {q}")
    # quantizer math runs in its fp32 island; hand the decoder back the
    # compute dtype (bf16 under mixed precision) at the boundary
    out = (out[0].astype(latents.dtype),) + out[1:]
    if with_state:
        return out + (qstate,)
    return out


def decode(params, cfg: Config, quantized, *, remat: bool = False):
    """quantized latents (B, C, Tf) -> waveform (B, 1, T)."""
    d = cfg.model.codec_decoder
    if d.type == "bigcodec":
        return bigcodec.bigcodec_decode(
            params["decoder"], quantized, up_ratios=tuple(d.up_ratios),
            dilations=tuple(d.dilations), use_rnn=d.use_rnn,
            rnn_num_layers=d.rnn_num_layers,
            rnn_bidirectional=d.rnn_bidirectional, causal=d.causal,
            antialias=d.antialias, remat=remat)
    if d.type == "conformer_istft":
        return conformer.conformer_decode(
            params["decoder"], quantized, hop_length=d.hop_length, n_fft=d.n_fft,
            n_head=d.n_head, rope_theta=d.rope_theta, max_seq_len=d.max_seq_len,
            causal=d.causal, remat=remat,
            moe_args=(d.moe_top_k, d.moe_capacity_factor))
    raise ValueError(f"unknown decoder type {d.type}")


def codes_to_emb(params, cfg: Config, codes, *, proj: bool = True):
    """codes (B, Tf, Nq) -> decoder-input embeddings (B, C, Tf) (vq2emb path)."""
    d = cfg.model.codec_decoder
    q = "fsq" if d.fsq else d.quantizer
    if q == "fsq":
        emb = fsq_codes_to_emb(codes[..., 0], levels=tuple(d.fsq_levels),
                               params=params["quantizer"])
    elif q == "ema_vq":
        emb = jnp.take(params["quantizer"]["embed"], codes[..., 0], axis=0)
    elif q == "lfq":
        from .quantizers.lfq import lfq_indices_to_codes

        emb = lfq_indices_to_codes(codes[..., 0], codebook_dim=d.in_channels)
    else:
        emb = fvq.residual_vq_codes_to_emb(params["quantizer"], codes, proj=proj)
    return jnp.swapaxes(emb, 1, 2)


def apply_fc_post_a(params, cfg: Config, emb):
    """Semantic checkpoints decode fc_post_a(zq), not zq (semantic.py:91,
    lightning_module.py:263-265). Apply on decoder-input embeddings
    (B, C, Tf); non-semantic params pass through unchanged. Every
    decode-from-codes path (synthesize CLI plain/SP/PP, streaming, ragged
    eval) must route through this so a parallelism flag never changes the
    produced audio."""
    sem_p = params.get("semantic")
    if sem_p is None or "fc_post_a" not in sem_p:
        return emb
    from ..ops.conv import linear

    return jnp.swapaxes(linear(jnp.swapaxes(emb, 1, 2), sem_p["fc_post_a"]), 1, 2)


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree)


def forward(params, cfg: Config, batch: Dict[str, Any], *, training: bool = False,
            step=None):
    """Full forward (lightning_module.py:225-278), without the semantic branch.

    Mixed precision: with cfg.train.precision == 'bf16' (the reference trains
    '16-mixed', config/train/default.yaml:6), the conv/attention stacks run in
    bfloat16 while the quantizer distance/losses stay fp32 (the reference
    forces fp32 inside quantizers/norms too — SURVEY.md §2.8). Params remain
    fp32 master copies; casting happens at trace time, so XLA folds it into
    the first use of each weight.
    """
    if training and cfg.train.precision == "bf16":
        # fp32 island: quantizer params/state stay fp32 (the reference forces
        # fp32 inside quantizers, SURVEY.md §2.8; the EMA variants' codebook
        # statistics are *state* and must not round-trip through bf16)
        quantizer = params.get("quantizer")
        params = _cast_tree(params, jnp.bfloat16)
        if quantizer is not None:
            params = {**params, "quantizer": quantizer}
        batch = _cast_tree(dict(batch), jnp.bfloat16)
    wav = batch["wav"]
    from ..config import resolve_remat
    from ..ops.moe import collect_moe_aux

    remat = training and resolve_remat(cfg)
    with collect_moe_aux() as moe_bucket:
        latents = encode(params, cfg, wav, remat=remat)
        if cfg.train.use_semantic:
            from .semantic import semantic_forward

            out = semantic_forward(params, cfg, batch, latents,
                                   training=training, step=step)
        else:
            zq, codes, vq_loss, qstate = quantize(
                params, cfg, latents, training=training, with_state=True,
                step=step)
            gen = decode(params, cfg, zq, remat=remat)
            out = CodecOutput(gt_wav=wav[:, None, :], gen_wav=gen,
                              vq_loss=vq_loss, vq_code=codes,
                              quantizer_state=qstate)
    if moe_bucket:
        # mean over the MoE layers (Switch convention); dropped_frac is a
        # metric, not a loss — stop its (zero) gradient explicitly
        n = float(len(moe_bucket))
        lb = sum(a["load_balance_loss"] for a in moe_bucket) / n
        z = sum(a["router_z_loss"] for a in moe_bucket) / n
        dropped = jax.lax.stop_gradient(
            sum(a["dropped_frac"] for a in moe_bucket) / n)
        out = out._replace(moe_aux_loss=jnp.stack([lb, z, dropped]))
    return out


def _encode_bigcodec_mixed(params, cfg: Config, wav):
    """Mixed-precision bigcodec encode for tokenize(mode='balanced'):
    conv_in + encoder blocks in bf16, LSTM/snake/conv_out in fp32."""
    from ..ops.lstm import res_lstm

    e = cfg.model.codec_encoder
    if e.type != "bigcodec":
        raise ValueError("balanced tokenize mode requires the bigcodec encoder")
    enc = params["encoder"]
    aa = bigcodec._AA(e.antialias)
    x = wav[:, None, :].astype(jnp.bfloat16)
    head = _cast_tree({"conv_in": enc["conv_in"], "blocks": enc["blocks"]},
                      jnp.bfloat16)
    x = bigcodec._wn_conv(x, head["conv_in"], padding=0 if e.causal else 3,
                          causal=e.causal)
    for i, stride in enumerate(e.up_ratios):
        x = bigcodec.encoder_block(x, head["blocks"][i], stride=stride,
                                   dilations=tuple(e.dilations),
                                   causal=e.causal, aa=aa)
    x = x.astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        if e.use_rnn:
            x = res_lstm(x, enc["lstm"], num_layers=e.rnn_num_layers,
                         bidirectional=e.rnn_bidirectional)
        x = aa(x, enc["snake_out"])
        x = bigcodec._wn_conv(x, enc["conv_out"], padding=0 if e.causal else 1,
                              causal=e.causal)
    return x


def semantic_vq_in(params, cfg: Config, latents, semantic_target=None):
    """The SSL branch's pre-VQ projection (lightning_module.py:240-255):
    with use_semantic, the quantizer consumes fc_prior(latents) — or
    fc_prior(concat(SemanticEncoder(teacher), latents)) when
    concat_semantic — NOT the raw encoder latents. Token extraction for
    semantic checkpoints must apply it or the codes are meaningless.
    concat configs need the teacher target at tokenization time (the
    reference's own extract path predates the semantic layout entirely,
    extract_indices.py:353-363; this is the current-layout behavior)."""
    if not cfg.train.use_semantic:
        return latents
    from ..ops.conv import linear

    sem_p = params["semantic"]
    if cfg.train.concat_semantic:
        if semantic_target is None:
            raise ValueError(
                "concat_semantic checkpoints quantize concat(semantic, "
                "latents); pass semantic_target (B, 1024, Tf) — e.g. "
                "precomputed w2v-bert layer-16 features "
                "(cli/precompute_semantic.py)")
        from .semantic import semantic_bottleneck

        # align the teacher to the encoder's frame count (the encoder's
        # strided convs ceil-round some lengths; semantic_forward pads/trims
        # the same way, lightning_module.py:236-238)
        Tf = latents.shape[-1]
        if semantic_target.shape[-1] < Tf:
            semantic_target = jnp.pad(
                semantic_target,
                ((0, 0), (0, 0), (0, Tf - semantic_target.shape[-1])))
        semantic_target = semantic_target[:, :, :Tf]
        sem = semantic_bottleneck(sem_p["encoder"],
                                  jax.lax.stop_gradient(semantic_target))
        latents = jnp.concatenate([sem, latents], axis=1)
    out = linear(jnp.swapaxes(latents, 1, 2), sem_p["fc_prior"])
    return jnp.swapaxes(out, 1, 2)


def tokenize(params, cfg: Config, wav, *, mode: str = "conformant",
             semantic_target=None):
    """wav (B, T) -> token indices (Nq, B, Tf) — the extract_indices path.

    mode='conformant' (default): full-fp32 matmul accumulation everywhere.
    TPU default matmul precision is bf16, which flips a significant fraction
    of argmin indices vs the fp32 torch reference; forcing 'float32' reduces
    token mismatch vs a CPU fp32 oracle from ~27% to ~0.3% on random weights
    (remaining flips are genuine near-ties, absent with trained codebooks).

    mode='high': encoder matmuls in the bf16_3x ('tensorfloat32') tier —
    near-fp32 accuracy at roughly half the 6-pass HIGHEST cost; VQ stays
    full fp32.

    mode='fast': encoder convs/LSTM run bf16 (params cast at trace time, so
    XLA folds the casts into first use); only the VQ projection + distance
    argmin stay fp32. ~2x faster on the MXU-bound stages; token flip rate vs
    the conformant path is measured by scripts/bench_fast_tokenize.py and
    recorded in docs/ROADMAP.md — use for throughput-critical serving where
    bit-exactness vs the torch reference is not required.
    """
    if mode == "fast":
        enc_params = {**params, "encoder": _cast_tree(params["encoder"], jnp.bfloat16)}
        latents = encode(enc_params, cfg, wav.astype(jnp.bfloat16)).astype(jnp.float32)
        with jax.default_matmul_precision("float32"):
            latents = semantic_vq_in(params, cfg, latents, semantic_target)
            _, codes, _ = quantize(params, cfg, latents, training=False)
        return codes
    if mode == "balanced":
        # bf16 conv blocks (the lane-bound bulk of the time), fp32 LSTM +
        # tail + VQ (the final frames are cheap and closest to the argmin)
        latents = _encode_bigcodec_mixed(params, cfg, wav)
        with jax.default_matmul_precision("float32"):
            latents = semantic_vq_in(params, cfg, latents, semantic_target)
            _, codes, _ = quantize(params, cfg, latents, training=False)
        return codes
    if mode == "high":
        # bf16_3x matmul passes (TPU 'tensorfloat32' tier): ~fp32-grade
        # accumulation at a fraction of HIGHEST's 6-pass cost; params/
        # activations stay fp32 and only the VQ distance/argmin is pinned
        # to full fp32. Flip rate vs conformant is measured by
        # scripts/bench_fast_tokenize.py.
        with jax.default_matmul_precision("tensorfloat32"):
            latents = encode(params, cfg, wav)
        with jax.default_matmul_precision("float32"):
            latents = semantic_vq_in(params, cfg, latents, semantic_target)
            _, codes, _ = quantize(params, cfg, latents, training=False)
        return codes
    if mode != "conformant":
        raise ValueError(f"unknown tokenize mode {mode!r}")
    with jax.default_matmul_precision("float32"):
        latents = encode(params, cfg, wav)
        latents = semantic_vq_in(params, cfg, latents, semantic_target)
        _, codes, _ = quantize(params, cfg, latents, training=False)
        return codes


def init_codec(key, cfg: Config) -> Dict[str, Any]:
    e, d = cfg.model.codec_encoder, cfg.model.codec_decoder
    k_enc, k_dec, k_q, k_sem = jax.random.split(key, 4)
    if e.type == "bigcodec":
        enc = bigcodec.init_bigcodec_encoder(
            k_enc, ngf=e.ngf, up_ratios=tuple(e.up_ratios),
            dilations=tuple(e.dilations), out_channels=e.out_channels,
            use_rnn=e.use_rnn, rnn_num_layers=e.rnn_num_layers,
            rnn_bidirectional=e.rnn_bidirectional)
    elif e.type == "conformer_stft":
        enc = conformer.init_conformer_encoder(
            k_enc, n_fft=e.n_fft, dim=e.dim, n_layers=e.n_layers, n_head=e.n_head,
            ffn_mult=e.ffn_mult, conv_kernel_size=e.conv_kernel_size,
            out_channels=e.out_channels, ffn_type=e.ffn_type,
            moe_experts=e.moe_experts)
    else:
        raise ValueError(e.type)
    if d.type == "bigcodec":
        dec = bigcodec.init_bigcodec_decoder(
            k_dec, in_channels=d.in_channels,
            upsample_initial_channel=d.upsample_initial_channel,
            up_ratios=tuple(d.up_ratios), dilations=tuple(d.dilations),
            use_rnn=d.use_rnn, rnn_num_layers=d.rnn_num_layers,
            rnn_bidirectional=d.rnn_bidirectional)
    elif d.type == "conformer_istft":
        dec = conformer.init_conformer_decoder(
            k_dec, in_channels=d.in_channels, n_fft=d.n_fft, dim=d.dim,
            n_layers=d.n_layers, n_head=d.n_head, ffn_mult=d.ffn_mult,
            conv_kernel_size=d.conv_kernel_size)
    else:
        raise ValueError(d.type)
    if d.fsq or d.quantizer == "fsq":
        from .quantizers.fsq import init_fsq

        q = init_fsq(k_q, dim=d.in_channels, levels=tuple(d.fsq_levels))
    elif d.quantizer == "ema_vq":
        from .quantizers.ema_vq import init_ema_vq

        q = init_ema_vq(k_q, codebook_size=d.codebook_size, dim=d.in_channels,
                        use_cosine_sim=d.vq_cosine_sim)
    elif d.quantizer == "lfq":
        q = {}  # lookup-free: no parameters (codebook_dim = latent dim = bits)
    else:
        q = fvq.init_residual_vq(k_q, num_quantizers=d.vq_num_quantizers,
                                 dim=d.in_channels, codebook_size=d.codebook_size,
                                 codebook_dim=d.codebook_dim)
    params = {"encoder": enc, "decoder": dec, "quantizer": q}
    if cfg.train.use_semantic:
        from .semantic import init_semantic

        params["semantic"] = init_semantic(k_sem, cfg)
    return params
