"""Training state: generator/discriminator params + optimizer states + step.

Replaces the Lightning module's two-optimizer manual-optimization setup
(BigCodec_SSL/lightning_module.py:85, 487-517): two AdamW(betas=(0.8, 0.9))
with the WarmupLR absolute-LR schedule and global-norm grad clipping, one for
the generator side (encoder + quantizer + decoder [+ semantic heads]) and one
for both discriminators.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from .schedule import warmup_lr_schedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any


def make_optimizers(cfg: Config):
    tcfg = cfg.train
    gen_sched = warmup_lr_schedule(
        warmup_step=tcfg.gen_schedule_params.warmup_step,
        down_step=tcfg.gen_schedule_params.down_step,
        max_lr=tcfg.gen_schedule_params.max_lr,
        min_lr=tcfg.gen_schedule_params.min_lr)
    disc_sched = warmup_lr_schedule(
        warmup_step=tcfg.disc_schedule_params.warmup_step,
        down_step=tcfg.disc_schedule_params.down_step,
        max_lr=tcfg.disc_schedule_params.max_lr,
        min_lr=tcfg.disc_schedule_params.min_lr)

    def adamw(optim, sched, clip):
        return optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(learning_rate=sched, b1=optim.betas[0], b2=optim.betas[1],
                        eps=optim.eps, weight_decay=optim.weight_decay),
        )

    gen_tx = adamw(tcfg.gen_optim_params, gen_sched, tcfg.gen_grad_clip)
    disc_tx = adamw(tcfg.disc_optim_params, disc_sched, tcfg.disc_grad_clip)
    return gen_tx, disc_tx


def init_train_state(key, cfg: Config) -> TrainState:
    from ..models.codec import init_codec
    from ..models.discriminators import init_mpd, init_spec_discriminator

    k1, k2, k3 = jax.random.split(key, 3)
    gen_params = init_codec(k1, cfg)
    m = cfg.model
    disc_params = {
        "mpd": init_mpd(k2, periods=tuple(m.mpd.periods),
                        channels=m.mpd.channels,
                        channel_increasing_factor=m.mpd.channel_increasing_factor,
                        max_downsample_channels=m.mpd.max_downsample_channels),
        "spec": init_spec_discriminator(
            k3, n_resolutions=len(m.mstft.stft_params.fft_sizes),
            channels=m.mstft.channels,
            max_downsample_channels=m.mstft.max_downsample_channels,
            downsample_scales=tuple(m.mstft.downsample_scales)),
    }
    gen_tx, disc_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt_state=gen_tx.init(gen_params),
        disc_opt_state=disc_tx.init(disc_params),
    )
