"""SSL semantic-distillation branch.

Reference: BigCodec_SSL/lightning_module.py:185-194 and 226-265 with the
conv bottleneck modules in vq/module.py:242-354. With use_semantic on, the
frozen Wav2Vec2-BERT 2.0 teacher's hidden layer 16 is regressed from the
quantized latents:

  teacher = w2v_bert(feats).hidden_states[16].T            (B, 1024, Tf)
  sem = SemanticEncoder(teacher)                           (B, 1024, Tf)
  vq_in = fc_prior(concat(sem, enc_latents) or enc_latents)
  zq, codes, vq_loss = quantizer(vq_in)
  sem_recon = SemanticDecoder(fc_post_s(zq))
  loss_sem = mse(sem_recon, teacher)                        (x5 in gen loss)
  wav = decoder(fc_post_a(zq))

TPU design choice (SURVEY.md §7.7): the teacher is frozen, so its features
are precomputed offline (cli/precompute_semantic.py, requires local
transformers weights) and arrive in the batch as ``semantic_target``
(B, 1024, Tf) — no 600M-param teacher inside the train step. When only raw
``feats`` are present and torch+weights are available, the CLI does the same
computation the reference does in-loop.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.conv import conv1d, get_weight, init_conv1d, init_linear, linear


def semantic_bottleneck(params, x):
    """SemanticEncoder/Decoder share this shape (vq/module.py:242-354):
    init conv -> [ReLU, conv, ReLU, conv] residual -> final conv. x: (B, C, T)."""
    def c(p, y):
        w = get_weight(p)
        pad = (w.shape[-1] - 1) // 2
        return conv1d(y, w, p.get("b"), padding=pad)

    h = c(params["initial"], x)
    r = jax.nn.relu(h)
    r = c(params["res1"], r)
    r = jax.nn.relu(r)
    r = c(params["res2"], r)
    h = r + h
    return c(params["final"], h)


def semantic_forward(params, cfg: Config, batch: Dict[str, Any], latents,
                     *, training: bool = False, step=None):
    from .codec import CodecOutput, decode, quantize

    sem_p = params["semantic"]
    if "semantic_target" in batch:
        target = batch["semantic_target"]  # (B, 1024, Tf) precomputed offline
    else:
        # in-loop frozen teacher, like the reference (lightning_module.py:232-238):
        # batch["feats"] are stacked fbank features (B, Tf', 160); the native
        # JAX w2v-bert (models/w2v_bert.py) produces hidden layer
        # cfg.train.teacher_layer (16 = the reference's tap)
        from .w2v_bert import W2vBertConfig, w2v_bert_apply

        feats = batch["feats"]
        if feats.ndim == 4:  # reference collate shape (B, 1, Tf', 160)
            feats = feats[:, 0]
        tc = W2vBertConfig(num_hidden_layers=cfg.train.teacher_layers,
                           num_attention_heads=cfg.train.teacher_heads,
                           intermediate_size=cfg.train.teacher_intermediate)
        hidden = w2v_bert_apply(params["w2v_bert"], tc, feats,
                                output_layer=cfg.train.teacher_layer)
        target = jnp.swapaxes(hidden, 1, 2)  # (B, 1024, Tf')
        Tf = latents.shape[-1]
        if target.shape[-1] < Tf:
            target = jnp.pad(target, ((0, 0), (0, 0), (0, Tf - target.shape[-1])))
        target = target[:, :, :Tf]
    target = jax.lax.stop_gradient(target)
    sem = semantic_bottleneck(sem_p["encoder"], target)
    if cfg.train.concat_semantic:
        vq_in = jnp.concatenate([sem, latents], axis=1)
    else:
        vq_in = latents
    vq_in = jnp.swapaxes(linear(jnp.swapaxes(vq_in, 1, 2), sem_p["fc_prior"]), 1, 2)
    zq, codes, vq_loss, qstate = quantize(params, cfg, vq_in, training=training,
                                          with_state=True, step=step)
    sem_recon = jnp.swapaxes(linear(jnp.swapaxes(zq, 1, 2), sem_p["fc_post_s"]), 1, 2)
    sem_recon = semantic_bottleneck(sem_p["decoder"], sem_recon)
    # fp32 loss reduction (torch autocast computes mse_loss in fp32)
    sem_loss = jnp.mean(jnp.square((sem_recon - target).astype(jnp.float32)))
    audio_in = jnp.swapaxes(linear(jnp.swapaxes(zq, 1, 2), sem_p["fc_post_a"]), 1, 2)
    gen = decode(params, cfg, audio_in)
    wav = batch["wav"]
    return CodecOutput(gt_wav=wav[:, None, :], gen_wav=gen, vq_loss=vq_loss,
                       vq_code=codes, semantic_recon_loss=sem_loss,
                       quantizer_state=qstate)


def init_semantic(key, cfg: Config) -> Dict[str, Any]:
    e, d = cfg.model.codec_encoder, cfg.model.codec_decoder
    keys = jax.random.split(key, 11)
    prior_in = 1024 + e.out_channels if cfg.train.concat_semantic else e.out_channels

    def sem_module(ks):
        return {
            "initial": init_conv1d(ks[0], 1024, 1024, 3, bias=False, torch_default=True),
            "res1": init_conv1d(ks[1], 1024, 1024, 3, torch_default=True),
            "res2": init_conv1d(ks[2], 1024, 1024, 3, torch_default=True),
            "final": init_conv1d(ks[3], 1024, 1024, 3, bias=False, torch_default=True),
        }

    return {
        "fc_prior": init_linear(keys[0], prior_in, d.in_channels),
        "fc_post_a": init_linear(keys[1], d.in_channels, d.in_channels),
        "fc_post_s": init_linear(keys[2], d.in_channels, 1024),
        "encoder": sem_module(keys[3:7]),
        "decoder": sem_module(keys[7:11]),
    }
