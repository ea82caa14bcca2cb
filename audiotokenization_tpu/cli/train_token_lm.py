"""Stage-2 token-LM training CLI (CodecLLM equivalent).

Reference: BigCodec_SSL/lightning_module.py:527-612 — loads a trained codec
checkpoint, freezes encoder + quantizer, and trains the small Llama-style LM
on next-token CE over the token streams, with AdamW + WarmupLR.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def load_token_lm(run_dir, lm_cfg):
    """Restore trained LM params from a train_token_lm run dir (the
    counterpart of extract_indices.load_model for stage 2)."""
    import jax
    import orbax.checkpoint as ocp

    from ..models.token_lm import init_token_lm

    template = init_token_lm(jax.random.key(0), lm_cfg)
    with ocp.CheckpointManager(Path(run_dir).resolve() / "ckpt") as mngr:
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no token-LM checkpoint under {run_dir}")
        restored = mngr.restore(
            step, args=ocp.args.Composite(
                lm_params=ocp.args.StandardRestore(template)))
    return restored["lm_params"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--codec_ckpt", type=str, required=True,
                   help="trained codec run dir (ours or reference)")
    p.add_argument("--filelist", type=str, required=True)
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--run_dir", type=str, default="runs/token_lm")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--crop_seconds", type=float, default=1.0)
    p.add_argument("--log_every", type=int, default=50)
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import optax

    from ..config import DatasetSplit
    from ..data.dataset import AudioDataset, DataLoader
    from ..models.token_lm import (TokenLMConfig, init_token_lm,
                                   make_token_lm_train_step)
    from ..train.schedule import warmup_lr_schedule
    from ..utils.logging import MetricsLogger
    from .extract_indices import load_model

    cfg, codec_params = load_model(args.codec_ckpt)
    lm_cfg = TokenLMConfig(vocab_size=cfg.model.codec_decoder.codebook_size + 2)
    lm_params = init_token_lm(jax.random.key(0), lm_cfg)

    sched = warmup_lr_schedule(
        warmup_step=cfg.train.gen_schedule_params.warmup_step,
        down_step=cfg.train.gen_schedule_params.down_step,
        max_lr=cfg.train.gen_schedule_params.max_lr,
        min_lr=cfg.train.gen_schedule_params.min_lr)
    tx = optax.chain(optax.clip_by_global_norm(cfg.train.gen_grad_clip),
                     optax.adamw(sched, b1=0.8, b2=0.9))
    opt_state = tx.init(lm_params)
    step_fn = make_token_lm_train_step(cfg, lm_cfg, codec_params, tx)

    sr = cfg.dataset.sample_rate
    split = DatasetSplit(filelist=args.filelist, batch_size=args.batch_size,
                         shuffle=True, min_audio_length=int(args.crop_seconds * sr))
    ds = AudioDataset(split, sample_rate=sr,
                      pad_to_multiple_of=cfg.dataset.pad_to_multiple_of,
                      root=args.dataset_root, train=True)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True)
    logger = MetricsLogger(args.run_dir, run_name="token_lm", use_wandb=False)

    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(Path(args.run_dir).resolve() / "ckpt",
                                 options=ocp.CheckpointManagerOptions(max_to_keep=2,
                                                                      create=True))
    step = 0
    while step < args.max_steps:
        for batch in loader:
            if step >= args.max_steps:
                break
            lm_params, opt_state, logs = step_fn(lm_params, opt_state,
                                                 {"wav": jnp.asarray(batch["wav"])})
            step += 1
            if step % args.log_every == 0:
                logger.log({k: float(v) for k, v in logs.items()}, step)
            if step % 10000 == 0 or step == args.max_steps:
                # two Composite items so load_token_lm can restore the params
                # without reconstructing the optimizer-state template
                mngr.save(step, args=ocp.args.Composite(
                    lm_params=ocp.args.StandardSave(lm_params),
                    opt_state=ocp.args.StandardSave(opt_state)))
    mngr.wait_until_finished()


if __name__ == "__main__":
    main()
