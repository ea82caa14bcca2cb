"""Codec training CLI (the reference's train.py equivalent).

Usage:
  python -m audiotokenization_tpu.cli.train --config path/to/config.yaml \
      [--override dataset.train.filelist=... train.max_steps=1000 ...] \
      [--run_dir runs/my_run]

Replaces @hydra.main composition with the typed config loader; the run dir
gets config.json + Orbax checkpoints + metrics.jsonl. Multi-host: launch the
same command on every host with JAX_NUM_PROCESSES etc. set
(jax.distributed.initialize is called automatically).

SSL semantic distillation (cfg.train.use_semantic, the reference's
cfgs/config1-4 path, lightning_module.py:185-265):
  - default: the dataset computes w2v-bert input features from each cropped
    clip (ops/fbank.py, the reference's in-dataloader AutoFeatureExtractor)
    and the frozen teacher runs inside the jitted step. Teacher weights come
    from --w2v_bert_path (a local facebook/w2v-bert-2.0 snapshot dir);
    --w2v_bert_init random gives a seeded random teacher for smoke tests.
  - --semantic_dir: precomputed per-file teacher targets instead
    (cli/precompute_semantic.py) — no teacher in the step.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def _build_teacher(cfg, args):
    """Frozen w2v-bert teacher params for the in-loop SSL branch."""
    from ..models.w2v_bert import W2vBertConfig, load_w2v_bert_teacher

    tc = W2vBertConfig(num_hidden_layers=cfg.train.teacher_layers,
                       num_attention_heads=cfg.train.teacher_heads,
                       intermediate_size=cfg.train.teacher_intermediate)
    if args.w2v_bert_path:
        return load_w2v_bert_teacher(args.w2v_bert_path, tc)
    if args.w2v_bert_init == "random":
        import jax

        from ..models.w2v_bert import init_w2v_bert

        print("[train] using a RANDOM-INIT w2v-bert teacher (smoke mode); "
              "pass --w2v_bert_path for real distillation")
        return init_w2v_bert(jax.random.key(0), tc)
    raise SystemExit(
        "cfg.train.use_semantic needs teacher features: pass --semantic_dir "
        "(precomputed targets), --w2v_bert_path (local HF snapshot), or "
        "--w2v_bert_init random (smoke test)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--override", type=str, nargs="*", default=[])
    p.add_argument("--run_dir", type=str, default=None)
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--semantic_dir", type=str, default=None,
                   help="directory of precomputed w2v-bert targets "
                        "(<stem>.npy) for the SSL branch")
    p.add_argument("--w2v_bert_path", type=str, default=None,
                   help="local facebook/w2v-bert-2.0 snapshot dir (in-loop "
                        "teacher weights)")
    p.add_argument("--w2v_bert_init", choices=["pretrained", "random"],
                   default="pretrained",
                   help="random: seeded random teacher (smoke runs only)")
    p.add_argument("--resume_from", type=str, default=None,
                   help="run dir to restore TrainState from (the reference's "
                        "resume_ckpt); default: this run dir's latest")
    p.add_argument("--resume_best", action="store_true",
                   help="with --resume_from: prefer its best checkpoint")
    p.add_argument("--profile_steps", type=int, nargs=2, default=None,
                   metavar=("START", "STOP"),
                   help="capture a jax.profiler trace between these steps "
                        "into <run_dir>/profile")
    p.add_argument("--skip_test", action="store_true",
                   help="skip the post-training full-length test phase")
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
    if args.resume_from is None and cfg.resume_ckpt:
        args.resume_from = cfg.resume_ckpt

    import numpy as np

    hop = int(np.prod(cfg.model.codec_encoder.up_ratios))
    teacher_params = None
    compute_feats = False
    if cfg.train.use_semantic:
        if args.semantic_dir is None:
            compute_feats = True
            teacher_params = _build_teacher(cfg, args)
        elif args.w2v_bert_path:
            print("[train] --semantic_dir set; ignoring --w2v_bert_path "
                  "(precomputed targets take precedence)")

    ds_kw = dict(sample_rate=cfg.dataset.sample_rate,
                 pad_to_multiple_of=cfg.dataset.pad_to_multiple_of,
                 root=args.dataset_root, semantic_dir=args.semantic_dir,
                 compute_feats=compute_feats, hop_length=hop)
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
    test_loader = None
    if cfg.dataset.test.filelist and not args.skip_test:
        # full-length batch-1 test split (config/dataset/default.yaml:17-21);
        # the ragged path needs raw wavs only
        test_ds = AudioDataset(cfg.dataset.test, train=False,
                               sample_rate=cfg.dataset.sample_rate,
                               pad_to_multiple_of=hop,
                               root=args.dataset_root)
        test_loader = DataLoader(test_ds, batch_size=1, shuffle=False,
                                 drop_last=False,
                                 process_index=jax.process_index(),
                                 process_count=jax.process_count())

    logger = MetricsLogger(run_dir, run_name=cfg.name,
                           use_wandb=not args.no_wandb)
    train(cfg, train_loader=train_loader, val_loader=val_loader,
          test_loader=test_loader, run_dir=run_dir, max_steps=args.max_steps,
          logger=logger, teacher_params=teacher_params,
          profile_steps=tuple(args.profile_steps) if args.profile_steps else None,
          resume_from=args.resume_from, resume_best=args.resume_best)


if __name__ == "__main__":
    main()
