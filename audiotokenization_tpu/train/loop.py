"""Training loop: the train.py/Lightning-Trainer replacement.

Drives the single jitted GAN step (train/step.py) over the data-parallel
mesh, with periodic validation (recon metrics + codebook stats, mirroring
lightning_module.py:419-451), Orbax checkpointing (best-on-mel + last, every
N steps, like the reference's ModelCheckpoint, train.py:21-23), and JSONL/
wandb logging.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import codec
from ..parallel.mesh import make_data_mesh, shard_batch
from ..utils.logging import MetricsLogger
from . import metrics as M
from .checkpoint import CheckpointManager
from .state import TrainState, init_train_state
from .step import jit_train_step


def _device_batch(batch):
    """Host batch -> device batch: every key the jitted step consumes
    (wav + the semantic-branch feats/semantic_target), lengths dropped
    (fixed-crop phases don't use them).

    Multi-process runs keep the batch on HOST: shard_batch's
    make_array_from_process_local_data is the single upload there — an
    eager jnp.asarray would cost a wasted device round trip per step."""
    if jax.process_count() > 1:
        return {k: np.asarray(v) for k, v in batch.items() if k != "lengths"}
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "lengths"}


def _local_np(x):
    """Host-read a possibly multi-process-sharded device array.

    Fully addressable arrays (single-process) come back whole; on a
    multi-host mesh the result is THIS process's addressable rows (dim-0
    sharding) — exactly its stripe of the batch, which is the right domain
    for per-process host metrics that are later (sum,count)-allgathered.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def make_eval_step(cfg: Config, mesh=None, *, fsdp: bool = False):
    def eval_fn(gen_params, batch):
        out = codec.forward(gen_params, cfg, batch, training=False)
        y = out.gt_wav[:, 0, :]
        y_ = out.gen_wav[:, 0, :]
        res = {
            "si_snr": M.si_snr(y_, y),
            "si_sdr": M.si_sdr(y_, y),
            "codebook_hist": M.codebook_histogram(
                out.vq_code, cfg.model.codec_decoder.codebook_size),
            "gen_wav": out.gen_wav,
            "gt_wav": out.gt_wav,
        }
        if out.semantic_recon_loss is not None:
            res["semantic_recon_loss"] = out.semantic_recon_loss
        return res

    if mesh is None:
        return jax.jit(eval_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # fsdp: leave the param shardings unspecified (None = GSPMD propagation)
    # so ZeRO-3-sharded gen_params are consumed in place — weights gathered
    # per use — instead of materializing a fully replicated copy per chip
    # up front, which would spike peak memory exactly when fsdp is needed.
    return jax.jit(eval_fn, in_shardings=(None if fsdp else repl, data))


def run_validation(cfg: Config, gen_params, val_loader, *, mesh=None,
                   compute_stoi: bool = True, max_batches: Optional[int] = None,
                   artifact_dir: Optional[str] = None, step: int = 0,
                   eval_step=None, teacher_params=None):
    """Validation pass. With artifact_dir set, dumps reconstructed audio +
    spectrograms for cfg.dataset.val.log_idxs batches (the wandb
    audio/spectrogram logging of lightning_module.py:434-447, file-based) —
    on process 0 only.

    Pass a prebuilt eval_step (make_eval_step) when calling repeatedly —
    a fresh closure misses jit's cache and recompiles every validation.
    """
    eval_step = eval_step if eval_step is not None else make_eval_step(cfg, mesh)
    if teacher_params is not None:
        gen_params = {**gen_params, "w2v_bert": teacher_params}
    agg = {"si_snr": [], "si_sdr": [], "stoi": [], "pesq": [],
           "quality_items": [], "semantic_recon_loss": []}
    hist = None
    log_idxs = set(cfg.dataset.val.log_idxs or ())
    for i, batch in enumerate(val_loader):
        if max_batches is not None and i >= max_batches:
            break
        lens = batch.get("lengths") if isinstance(batch, dict) else None
        if lens is not None and len(set(np.asarray(lens).tolist())) > 1:
            # the fixed-crop eval_fn has no masking; zero-padded tails would
            # silently skew SI-SNR/STOI. Full-length eval goes through the
            # ragged codec instead (run_test / cli/inference_full).
            raise ValueError(
                "run_validation got a ragged batch (unequal lengths); use a "
                "fixed min_audio_length val split or run_test's ragged path")
        b = _device_batch(batch)
        if mesh is not None:
            b = shard_batch(mesh, b)
        out = eval_step(gen_params, b)
        if (artifact_dir is not None and i in log_idxs
                and jax.process_index() == 0):
            _dump_val_artifacts(artifact_dir, i, step,
                                _local_np(out["gt_wav"])[0, 0],
                                _local_np(out["gen_wav"])[0, 0],
                                cfg.dataset.sample_rate)
        agg["si_snr"].append(float(out["si_snr"]))
        agg["si_sdr"].append(float(out["si_sdr"]))
        if "semantic_recon_loss" in out:
            agg["semantic_recon_loss"].append(float(out["semantic_recon_loss"]))
        h = np.asarray(out["codebook_hist"])
        hist = h if hist is None else hist + h
        if compute_stoi:
            gt = _local_np(out["gt_wav"])[:, 0]
            gen = _local_np(out["gen_wav"])[:, 0]
            # cap host-metric cost: STOI/PESQ on a SEEDED RANDOM subset of
            # quality_metric_items per batch (a deviation from the
            # reference's full-batch torchmetrics update; always-first-N
            # would be a biased sample). The subsample size is surfaced as
            # val_quality_items_used in the emitted metrics.
            cap = cfg.dataset.val.quality_metric_items
            if cap >= len(gt):
                idxs = range(len(gt))
            else:
                seed = ((int(step or 0) << 10) ^ i) & 0xFFFFFFFF
                idxs = np.random.RandomState(seed).choice(len(gt), cap,
                                                          replace=False)
            for j in idxs:
                agg["quality_items"].append(1.0)
                s = M.stoi(gt[j], gen[j], cfg.dataset.sample_rate)
                if np.isfinite(s):
                    agg["stoi"].append(s)
                # pesq_metric: ITU package when importable, else the native
                # full-P.862 pipeline (train/pesq_p862.py) — always a value
                p = M.pesq_metric(gt[j], gen[j], cfg.dataset.sample_rate)
                if p is not None:
                    agg["pesq"].append(p)
    return _finalize_validation(
        agg, hist, cfg.model.codec_decoder.codebook_size)


def _finalize_validation(agg, hist, codebook_size):
    """(sum, count) reduction of the per-process aggregates, so every process
    reports identical val metrics on multi-host runs (the sync_dist=True
    equivalent of lightning_module.py:450).

    The local vector's length must NOT depend on how many batches this
    process saw: a process whose val stripe yields zero batches (hist=None)
    still has to allgather the same shape as its peers, so the histogram slot
    is always codebook_size wide (zeros when empty).
    """
    keys = sorted(agg)
    local = np.concatenate([
        np.asarray([np.sum(agg[k]) if agg[k] else 0.0 for k in keys], np.float64),
        np.asarray([len(agg[k]) for k in keys], np.float64),
        np.zeros(codebook_size, np.float64) if hist is None
        else np.asarray(hist, np.float64),
    ])
    total = reduce_validation_aggregates(local)
    sums, counts = total[:len(keys)], total[len(keys):2 * len(keys)]
    results = {f"val_{k}": float(sums[i] / counts[i])
               for i, k in enumerate(keys)
               if counts[i] > 0 and k != "quality_items"}
    if "val_pesq" in results:
        # label the implementation behind the number (VERDICT r4 weak #5):
        # ITU-package MOS and native-P.862 MOS are separate calibrations
        results["val_pesq_impl"] = M.pesq_impl()
    if "quality_items" in keys and counts[keys.index("quality_items")] > 0:
        # surface the STOI/PESQ subsample size (global count across
        # processes) so the quality_metric_items cap is visible in the JSONL
        results["val_quality_items_used"] = float(
            counts[keys.index("quality_items")])
    hj = jnp.asarray(total[2 * len(keys):])
    if float(jnp.sum(hj)) > 0:
        results["val_codebook_perplexity"] = float(M.perplexity_from_histogram(hj))
        results["val_codebook_utilization"] = float(M.utilization_from_histogram(hj))
    return results


def reduce_validation_aggregates(local: np.ndarray) -> np.ndarray:
    """Sum a host-resident aggregate vector across processes.

    Single-process: identity. Multi-host: allgather+sum over all processes
    (each striping the val filelist), so the reported metrics are the global
    means, identical on every host.
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(local))).sum(axis=0)


def _dump_val_artifacts(artifact_dir, batch_idx, step, gt, gen, sr):
    from pathlib import Path

    from ..data.audio_io import write_wav

    d = Path(artifact_dir) / f"val_batch_{batch_idx}"
    d.mkdir(parents=True, exist_ok=True)
    write_wav(d / f"step{step}_original.wav", gt, sr)
    write_wav(d / f"step{step}_reconstructed.wav", gen, sr)
    try:
        from ..cli.inference_full import _save_spectrogram_png

        _save_spectrogram_png(d / f"step{step}_spec.png", gt, gen, sr)
    except Exception:
        pass


def train(cfg: Config, *, train_loader, val_loader=None, run_dir: str,
          use_mesh: bool = True, max_steps: Optional[int] = None,
          logger: Optional[MetricsLogger] = None,
          profile_steps: Optional[tuple] = None,
          teacher_params=None, test_loader=None,
          resume_from: Optional[str] = None, resume_best: bool = False):
    """Main entry: loops batches through the jitted step until max_steps.

    profile_steps=(start, stop): capture a jax.profiler device trace between
    those steps into <run_dir>/profile (SURVEY.md §5.1 tracing hook).

    teacher_params: frozen w2v-bert params for the in-loop SSL branch
    (cfg.train.use_semantic without precomputed targets) — replicated into
    the step, excluded from optimizer and checkpoints.

    test_loader: optional full-length test split; after max_steps the loop
    runs a final test pass and logs test_* metrics (the reference's
    trainer.validate -> trainer.test sequence, train.py:40-41).

    resume_from/resume_best: restore a full TrainState from another run dir
    (fit(ckpt_path=cfg.resume_ckpt), train.py:39) instead of this run dir's
    implicit latest.
    """
    # DP needs the global batch divisible across devices; fall back to
    # single-device execution (with a note) instead of a sharding error
    n_dev = len(jax.devices())
    mesh = None
    tp_n = max(int(cfg.train.tensor_parallel), 1)
    pp_n = max(int(cfg.train.pipeline_parallel), 1)
    if tp_n > 1 and pp_n > 1:
        raise ValueError("tensor_parallel and pipeline_parallel both >1 is "
                         "not composed yet; pick one model axis")
    if use_mesh and n_dev > 1:
        # the loader yields a PER-PROCESS batch; the global batch the mesh
        # sees is batch_size * process_count (shard_batch assembles it)
        global_bs = cfg.dataset.train.batch_size * jax.process_count()
        if pp_n > 1:
            from ..parallel.pp import make_dp_pipe_mesh, validate_pp

            if cfg.train.fsdp:
                raise ValueError("fsdp + pipeline_parallel is not composed "
                                 "yet; pick one memory axis")
            if n_dev % pp_n:
                raise ValueError(
                    f"train.pipeline_parallel={pp_n} does not divide the "
                    f"{n_dev} attached devices")
            validate_pp(cfg, pp_n)
            n_micro = int(cfg.train.pipeline_microbatches) or pp_n
            d_axis = n_dev // pp_n
            if global_bs % n_micro or (global_bs // n_micro) % max(d_axis, 1):
                raise ValueError(
                    f"global batch {global_bs} must split into "
                    f"{n_micro} microbatches x the {d_axis}-way data axis "
                    f"(pipeline_parallel={pp_n})")
            mesh = make_dp_pipe_mesh(pp_n)
        elif tp_n > 1:
            # ('data','model') mesh: batch shards over the data axis only
            from ..parallel.tp import make_dp_tp_mesh

            if n_dev % tp_n:
                raise ValueError(
                    f"train.tensor_parallel={tp_n} does not divide the "
                    f"{n_dev} attached devices")
            if global_bs % (n_dev // tp_n):
                raise ValueError(
                    f"global batch {global_bs} not divisible by the "
                    f"{n_dev // tp_n}-way data axis (tensor_parallel={tp_n})")
            mesh = make_dp_tp_mesh(tp_n)
        elif global_bs % n_dev == 0:
            mesh = make_data_mesh()
        else:
            print(f"[train] global batch {global_bs} not divisible by "
                  f"{n_dev} devices; running unsharded")
    elif tp_n > 1 or pp_n > 1:
        # model-parallel knob configured but no mesh will be built — don't
        # train unsharded silently (ADVICE r3)
        knob = ("tensor_parallel", tp_n) if tp_n > 1 else ("pipeline_parallel", pp_n)
        raise ValueError(
            f"train.{knob[0]}={knob[1]} requires use_mesh=True and >1 "
            f"devices (have {n_dev}); set {knob[0]}: 1 to run unsharded")
    state = init_train_state(jax.random.key(cfg.train.seed), cfg)
    if mesh is not None:
        # Place the state on the mesh BEFORE any Orbax restore: the restore
        # target's shardings are what the restored arrays come back with, so
        # restoring into a single-device state and then feeding a jitted step
        # whose in_shardings span the mesh raises an incompatible-sharding
        # error (committed arrays are never implicitly resharded). FSDP/TP
        # additionally restore straight into shards instead of full per-chip
        # copies. The 2-process test does the same (tests/_mp_worker.py).
        from jax.sharding import NamedSharding, PartitionSpec as P

        if tp_n > 1:
            from ..parallel.tp import tp_state_shardings

            state_sh = tp_state_shardings(mesh, cfg, fsdp=cfg.train.fsdp)
        elif cfg.train.fsdp:
            from ..parallel.mesh import fsdp_state_shardings

            state_sh = fsdp_state_shardings(
                mesh, jax.eval_shape(
                    lambda: init_train_state(jax.random.key(0), cfg)))
        else:
            state_sh = NamedSharding(mesh, P())
        state = jax.device_put(state, state_sh)
    ckpt = CheckpointManager(run_dir, cfg)
    if resume_from is not None:
        from .checkpoint import restore_train_state

        state = restore_train_state(resume_from, state, best=resume_best)
    elif ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    step_fn = jit_train_step(cfg, mesh, donate=True, fsdp=cfg.train.fsdp)
    # tp: params arrive TP-sharded; like fsdp, let GSPMD propagate their
    # shardings through the eval graph instead of forcing replication
    eval_step = (make_eval_step(cfg, mesh, fsdp=cfg.train.fsdp or tp_n > 1)
                 if val_loader is not None else None)
    logger = logger or MetricsLogger(run_dir, run_name=cfg.name, use_wandb=False)
    max_steps = max_steps if max_steps is not None else cfg.train.max_steps

    step = int(state.step)
    if val_loader is not None and cfg.train.num_sanity_val_steps > 0:
        # sanity validation before the loop (reference num_sanity_val_steps: 4,
        # config/train/default.yaml:9): a crash in the eval path surfaces at
        # step 0 instead of step val_every_n_steps. Metrics are discarded,
        # like Lightning's sanity check; a marker lands in the JSONL.
        run_validation(cfg, state.gen_params, val_loader, mesh=mesh,
                       eval_step=eval_step, teacher_params=teacher_params,
                       max_batches=cfg.train.num_sanity_val_steps,
                       compute_stoi=False)
        logger.log({"sanity_val_ok": 1.0}, step)
    t_last = time.perf_counter()
    hist_accum = None
    skip_accum = 0.0
    while step < max_steps:
        for batch in train_loader:
            if step >= max_steps:
                break
            b = _device_batch(batch)
            if mesh is not None:
                b = shard_batch(mesh, b)
            if profile_steps and step == profile_steps[0]:
                jax.profiler.start_trace(str(run_dir) + "/profile")
            state, metrics = step_fn(state, b, teacher_params)
            step += 1
            if profile_steps and step == profile_steps[1]:
                jax.block_until_ready(metrics["gen_loss"])
                jax.profiler.stop_trace()
            h = metrics.pop("codebook_hist")
            hist_accum = h if hist_accum is None else hist_accum + h
            if "nonfinite_skipped" in metrics:
                # accumulate between logs: sampling the per-step flag every
                # log_every_n_steps silently hid guarded skips (the r4 soak
                # reported 0 skips for a run that had them)
                skip_accum = skip_accum + metrics.pop("nonfinite_skipped")
            if step % cfg.train.log_every_n_steps == 0:
                now = time.perf_counter()
                sps = cfg.train.log_every_n_steps / (now - t_last)
                t_last = now
                logs = {k: float(v) for k, v in metrics.items()}
                if cfg.train.guard_nonfinite:
                    logs["nonfinite_skipped"] = float(skip_accum)
                    skip_accum = 0.0
                logs["steps_per_sec"] = sps
                logs["codebook_perplexity"] = float(M.perplexity_from_histogram(hist_accum))
                logs["codebook_utilization"] = float(M.utilization_from_histogram(hist_accum))
                hist_accum = None
                logger.log(logs, step)
            if val_loader is not None and step % cfg.train.val_every_n_steps == 0:
                val = run_validation(cfg, state.gen_params, val_loader, mesh=mesh,
                                     artifact_dir=run_dir, step=step,
                                     eval_step=eval_step,
                                     teacher_params=teacher_params)
                logger.log(val, step)
            if step % cfg.train.checkpoint_every_n_steps == 0 or step == max_steps:
                mel = metrics.get("mel_loss")
                ckpt.save(state, metric=float(mel) if mel is not None else None)
    ckpt.save(state)
    ckpt.wait()
    if test_loader is not None:
        # post-training test phase (reference: trainer.test, train.py:41 —
        # full-length batch-1 eval via the ragged round-trip codec)
        test = run_test(cfg, state.gen_params, test_loader,
                        teacher_params=teacher_params)
        logger.log(test, step)
    return state


def _make_test_teacher(cfg: Config):
    """Per-file w2v-bert targets for the concat_semantic full-length test
    phase (the reference computes them in-loop, lightning_module.py:232-238).

    Host fbank runs on the UNPADDED file (per-file exact — the clip's own
    ±160 zero pad is what a zero tail would supply anyway), the teacher runs
    on the bucket-padded feature array with an attention key mask at the
    file's frame count (models/w2v_bert.py valid_frames), and the result is
    zeroed past the teacher frames — exactly the zero-pad-to-Tf the reference
    applies (lightning_module.py:236-238). Returns
    compute(teacher_params, wav_1d, padded_len, hop) -> (1, 1024, plen//hop).
    """
    import jax as _jax

    from ..models.w2v_bert import W2vBertConfig, w2v_bert_apply

    tc = W2vBertConfig(num_hidden_layers=cfg.train.teacher_layers,
                       num_attention_heads=cfg.train.teacher_heads,
                       intermediate_size=cfg.train.teacher_intermediate)
    layer = cfg.train.teacher_layer

    @_jax.jit
    def fwd(tp, feats, valid):
        h = w2v_bert_apply(tp, tc, feats, output_layer=layer,
                           valid_frames=valid)
        return jnp.swapaxes(h, 1, 2)  # (B, 1024, nf)

    def compute(tp, w, plen, hop):
        from ..ops.fbank import _FRAME, _HOP, _STRIDE, w2v_bert_features_from_clip

        f = w2v_bert_features_from_clip(w)  # (nf_file, 160), per-file exact
        # bucket frame count from the padded length (one compile per bucket)
        nfb = 1 + (plen + 320 - _FRAME) // _HOP
        nfb = -(-nfb // _STRIDE)
        feats = np.zeros((1, nfb, f.shape[1] if len(f) else 160), np.float32)
        nf_file = min(len(f), nfb)
        feats[0, :nf_file] = f[:nf_file]
        t = np.array(fwd(tp, jnp.asarray(feats),
                         jnp.asarray([max(nf_file, 1)], np.int32)))
        t[:, :, nf_file:] = 0.0
        Tf = plen // hop
        out = np.zeros((1, t.shape[1], Tf), np.float32)
        n = min(Tf, t.shape[2])
        out[:, :, :n] = t[:, :, :n]
        return jnp.asarray(out)

    return compute


def run_test(cfg: Config, gen_params, test_loader, *, teacher_params=None,
             max_batches: Optional[int] = None):
    """Full-length test pass over a batch-1 loader, bucketing files to
    second-quantum lengths through the ragged round-trip codec
    (utils/ragged.py) so XLA compiles once per bucket instead of once per
    file length. Returns test_-prefixed metrics."""
    from ..utils.ragged import make_ragged_codec

    concat_sem = cfg.train.use_semantic and cfg.train.concat_semantic
    if concat_sem:
        tp = (teacher_params if teacher_params is not None
              else gen_params.get("w2v_bert"))
        if tp is None:
            # explicit JSONL marker instead of a silent empty dict: an
            # unattended run must not mistake "no teacher, phase skipped"
            # for "test phase ran clean"
            print("[test] concat_semantic quantizes concat(teacher, latents) "
                  "and no w2v-bert teacher is loaded — skipping the test "
                  "phase (pass teacher_params / --w2v_bert_path)")
            return {"test_skipped_concat_semantic": 1.0}
        teacher_fwd = _make_test_teacher(cfg)
    if teacher_params is not None:
        gen_params = {**gen_params, "w2v_bert": teacher_params}
    sr = cfg.dataset.sample_rate
    hop = (cfg.model.codec_encoder.hop_length
           if cfg.model.codec_encoder.type == "conformer_stft"
           else int(np.prod(cfg.model.codec_decoder.up_ratios)))
    quantum = max(sr // hop * hop, hop)
    try:
        ragged = make_ragged_codec(cfg)
    except NotImplementedError as exc:
        # families without an exact ragged path (conformer MoE: capacity
        # routing is batch-global by construction); surface an explicit
        # marker instead of crashing the END of a long training run (use
        # cli/inference_full --batch_size 1 / --exact instead)
        print(f"[test] ragged full-length path unavailable ({exc}); skipping "
              "the test phase")
        return {"test_skipped_ragged_unavailable": 1.0}
    agg = {"si_snr": [], "si_sdr": [], "stoi": [], "pesq": []}
    hist = np.zeros(cfg.model.codec_decoder.codebook_size, np.int64)
    for i, batch in enumerate(test_loader):
        if max_batches is not None and i >= max_batches:
            break
        w = np.asarray(batch["wav"])[0]
        plen = -(-len(w) // quantum) * quantum
        wav = np.zeros((1, plen), np.float32)
        wav[0, :len(w)] = w
        lens = np.asarray([len(w)], np.int32)
        sem_t = None
        if concat_sem:
            sem_t = teacher_fwd(gen_params["w2v_bert"], w, plen, hop)
        recon, codes = ragged(gen_params, jnp.asarray(wav), jnp.asarray(lens),
                              sem_t)
        gen = np.asarray(recon)[0, :len(w)]
        codes = np.asarray(codes)[:, 0, :len(w) // hop]
        np.add.at(hist, codes.reshape(-1), 1)
        agg["si_snr"].append(float(M.si_snr(gen[None], w[None])))
        agg["si_sdr"].append(float(M.si_sdr(gen[None], w[None])))
        s = M.stoi(w, gen, sr)
        if np.isfinite(s):
            agg["stoi"].append(s)
        p = M.pesq_metric(w, gen, sr)
        if p is not None:
            agg["pesq"].append(p)
    res = _finalize_validation(agg, hist, cfg.model.codec_decoder.codebook_size)
    return {k.replace("val_", "test_"): v for k, v in res.items()}
