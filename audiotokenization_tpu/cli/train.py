"""Codec training CLI (the reference's train.py equivalent).

Usage:
  python -m audiotokenization_tpu.cli.train --config path/to/config.yaml \
      [--override dataset.train.filelist=... train.max_steps=1000 ...] \
      [--run_dir runs/my_run]

Replaces @hydra.main composition with the typed config loader; the run dir
gets config.json + Orbax checkpoints + metrics.jsonl. Multi-host: launch the
same command on every host with JAX_NUM_PROCESSES etc. set
(jax.distributed.initialize is called automatically).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--override", type=str, nargs="*", default=[])
    p.add_argument("--run_dir", type=str, default=None)
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--no_wandb", action="store_true")
    args = p.parse_args(argv)

    import jax

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from ..config import load_config
    from ..data.dataset import AudioDataset, DataLoader
    from ..parallel.mesh import initialize_distributed
    from ..train.loop import train
    from ..utils.logging import MetricsLogger

    initialize_distributed()
    cfg = load_config(args.config, args.override)
    run_dir = args.run_dir or str(Path(cfg.log_dir) / cfg.name)

    ds_kw = dict(sample_rate=cfg.dataset.sample_rate,
                 pad_to_multiple_of=cfg.dataset.pad_to_multiple_of,
                 root=args.dataset_root)
    train_ds = AudioDataset(cfg.dataset.train, train=True, **ds_kw)
    train_loader = DataLoader(
        train_ds, batch_size=cfg.dataset.train.batch_size,
        shuffle=cfg.dataset.train.shuffle, seed=cfg.train.seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    val_loader = None
    if cfg.dataset.val.filelist:
        val_ds = AudioDataset(cfg.dataset.val, train=False, **ds_kw)
        val_loader = DataLoader(val_ds, batch_size=cfg.dataset.val.batch_size,
                                shuffle=False,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())

    logger = MetricsLogger(run_dir, run_name=cfg.name,
                           use_wandb=not args.no_wandb)
    train(cfg, train_loader=train_loader, val_loader=val_loader,
          run_dir=run_dir, max_steps=args.max_steps, logger=logger)


if __name__ == "__main__":
    main()
