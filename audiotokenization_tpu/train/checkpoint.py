"""Orbax checkpointing: save/restore TrainState + config.

Reference behavior replaced (SURVEY.md §5.4): Lightning ModelCheckpoint with
top-1 on mel_loss, save_last, every 10k steps (train.py:21-23), resume via
fit(ckpt_path=...) and config snapshot to <run>/hydra/config.yaml that
inference reads back. Here: async Orbax saves of the full TrainState, a
`best` alias tracked on a monitored metric, and config.json stored beside the
checkpoints — extract/inference CLIs load the same artifact.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..config import Config, load_config, save_config, to_dict
from .state import TrainState


class CheckpointManager:
    def __init__(self, directory, cfg: Config, *, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        if jax.process_index() == 0:  # plain-file writes race on shared FS
            save_config(cfg, self.directory / "config.json")
        from orbax.checkpoint import options as ocp_options

        # distinct barrier prefixes: both managers can save the SAME step
        # (a best save piggybacks on a rolling save); on multi-process runs
        # orbax keys its commit barriers by step, and two managers sharing
        # the "_async_write_complete.<step>" key deadlock/crash
        self.mngr = ocp.CheckpointManager(
            self.directory / "ckpt",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
                multiprocessing_options=ocp_options.MultiprocessingOptions(
                    barrier_sync_key_prefix="main")),
        )
        # the reference keeps top-1-on-mel AND last (train.py:21-23): the
        # rolling manager above would delete the best step once max_to_keep
        # newer saves land, so the best lives in its own 1-deep manager
        self.best_mngr = ocp.CheckpointManager(
            self.directory / "ckpt_best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True, enable_async_checkpointing=True,
                multiprocessing_options=ocp_options.MultiprocessingOptions(
                    barrier_sync_key_prefix="best")),
        )
        self.best_metric = None
        self.best_step = None
        best_file = self.directory / "best.json"
        if best_file.exists():
            rec = json.loads(best_file.read_text())
            self.best_metric = rec.get("metric")
            self.best_step = rec.get("step")

    def save(self, state: TrainState, *, metric: Optional[float] = None):
        step = int(state.step)
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        if metric is not None and (self.best_metric is None or metric < self.best_metric):
            self.best_metric = float(metric)
            self.best_step = step
            # every process participates in the Orbax save (it coordinates
            # multi-host writes itself); only process 0 touches best.json
            self.best_mngr.save(step, args=ocp.args.StandardSave(state))
            if jax.process_index() == 0:
                (self.directory / "best.json").write_text(
                    json.dumps({"metric": self.best_metric, "step": step}))

    def wait(self):
        self.mngr.wait_until_finished()
        self.best_mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return state
        return self.mngr.restore(step, args=ocp.args.StandardRestore(state))


def restore_train_state(directory, state: TrainState, *,
                        best: bool = False, step: Optional[int] = None) -> TrainState:
    """Restore a full TrainState from another run directory (the reference's
    fit(ckpt_path=cfg.resume_ckpt), train.py:39 — resume with optimizer
    state and step counter intact, possibly into a new run dir)."""
    directory = Path(directory).resolve()
    mngr = None
    if best:
        best_dir = directory / "ckpt_best"
        if best_dir.exists():
            cand = ocp.CheckpointManager(best_dir)
            if cand.latest_step() is not None:
                mngr = cand
            else:
                cand.close()
    if mngr is None:
        mngr = ocp.CheckpointManager(directory / "ckpt")
    try:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        return mngr.restore(step, args=ocp.args.StandardRestore(state))
    finally:
        mngr.close()


def load_checkpoint_params(directory, *, step: Optional[int] = None,
                           best: bool = False):
    """Load (cfg, gen_params) from a run directory for inference/extraction.

    Restores against an abstract target tree built from the config with
    jax.eval_shape (no allocation), so Orbax validates the topology instead
    of guessing it from the serialized layout.
    """
    directory = Path(directory).resolve()
    cfg = load_config(directory / "config.json")
    ckpt_dir = directory / "ckpt"
    if best:
        # Orbax creates ckpt_best/ eagerly at manager construction, so the
        # directory existing does NOT mean a best save landed — check for an
        # actual step before preferring it (else a resumed old run or a
        # metric-less final save would shadow the fallbacks with an empty dir)
        best_dir = directory / "ckpt_best"
        if best_dir.exists():
            probe = ocp.CheckpointManager(best_dir)
            try:
                has_best = probe.latest_step() is not None
            finally:
                probe.close()  # leaves background threads alive otherwise
            if has_best:
                ckpt_dir = best_dir
            elif (directory / "best.json").exists():
                step = json.loads((directory / "best.json").read_text())["step"]
        elif (directory / "best.json").exists():
            # older runs without the dedicated best manager: the step may
            # have rolled out of the max_to_keep window
            step = json.loads((directory / "best.json").read_text())["step"]
    mngr = ocp.CheckpointManager(ckpt_dir)
    try:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        try:
            import jax

            from ..models.codec import init_codec

            abstract = jax.eval_shape(lambda: init_codec(jax.random.key(0), cfg))
            restored = mngr.restore(
                step, args=ocp.args.StandardRestore({"gen_params": abstract}))
        except Exception:
            restored = mngr.restore(step, args=ocp.args.StandardRestore())
    finally:
        mngr.close()
    gen_params = restored.gen_params if hasattr(restored, "gen_params") else restored["gen_params"]
    return cfg, gen_params
