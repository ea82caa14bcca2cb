"""Metrics logging: JSONL file + stdout + optional wandb.

The reference logs everything through Lightning's WandbLogger
(BigCodec_SSL/train.py:37, project 'Audio-Tokenizer'). Here the primary sink
is an append-only metrics.jsonl next to the run dir (machine-readable,
dependency-free); wandb attaches automatically when the package + env are
available.

Multi-host: only process 0 writes (Lightning's rank-zero logging); other
processes construct a no-op logger so call sites stay unconditional.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class MetricsLogger:
    def __init__(self, log_dir, *, project: str = "Audio-Tokenizer",
                 run_name: str = "run", use_wandb: bool = True,
                 wandb_id: Optional[str] = None):
        self.primary = _is_primary()
        self.file = None
        self.wandb = None
        if not self.primary:
            return
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.file = open(self.log_dir / "metrics.jsonl", "a")
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=project, name=run_name,
                                        id=wandb_id, resume="allow")
            except Exception as e:
                # explicit marker instead of a silent fallback: an unattended
                # run must be able to see from the JSONL alone that wandb was
                # requested but never attached
                self.wandb = None
                self.file.write(json.dumps(
                    {"step": -1, "time": time.time(),
                     "wandb_disabled": f"{type(e).__name__}: {e}"}) + "\n")
                self.file.flush()

    def log(self, metrics: Dict[str, Any], step: int):
        if not self.primary:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            if isinstance(v, str):
                rec[k] = v  # labels (e.g. pesq_impl) pass through verbatim
                continue
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.file.write(json.dumps(rec) + "\n")
        self.file.flush()
        if self.wandb is not None:
            self.wandb.log({k: v for k, v in rec.items() if k not in ("time",)},
                           step=int(step))

    def close(self):
        if self.file is not None:
            self.file.close()
        if self.wandb is not None:
            self.wandb.finish()
