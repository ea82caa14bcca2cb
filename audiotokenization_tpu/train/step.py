"""The jitted GAN training step.

Replaces the reference's manual-optimization Lightning step
(BigCodec_SSL/lightning_module.py:392-417) with ONE compiled function that
preserves its exact semantics:

  1. shared generator forward (encode -> VQ -> decode);
  2. discriminator update on the stop-gradiented fake
     (compute_disc_loss, :288-320: LSGAN over MPD + spec final logits);
  3. generator update computed against the *updated* discriminator
     (the reference calls compute_gen_loss after disc_opt.step()):
     mel(x15) + adv + feature-matching (real side detached) + sum(vq) +
     semantic MSE(x5), lightning_module.py:322-389.

TPU-first efficiency: the generator forward is linearized ONCE via jax.vjp;
the discriminator step consumes its stop-gradiented output, and the
generator's cotangents (d loss / d gen_wav, d/d vq_loss, d/d sem_loss) are
pulled back through the saved linearization — so the big conv stacks run one
forward + one backward per step, like the reference, while the whole
disc-then-gen schedule stays inside a single XLA program (no Python between
optimizer steps, no `find_unused_parameters` machinery — functional grads
are exact).

Data parallelism: the step is jitted with the batch sharded over the 'data'
mesh axis and params/opt-state replicated; XLA inserts the gradient
all-reduces (the NCCL-DDP equivalent) automatically.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..losses.gan import disc_loss, feature_matching_loss, gen_adv_loss
from ..losses.mel import MultiResolutionMelLoss
from ..losses.stft_loss import multi_resolution_stft_loss
from ..models import codec
from ..models.discriminators import mpd_apply, spec_discriminator_apply
from .state import TrainState, make_optimizers


def make_disc_forward(cfg: Config):
    m = cfg.model
    bf16 = cfg.train.precision == "bf16"

    def disc_forward(disc_params, wav):
        if bf16:
            from ..models.codec import _cast_tree

            disc_params = _cast_tree(disc_params, jnp.bfloat16)
            wav = wav.astype(jnp.bfloat16)
        outs = mpd_apply(disc_params["mpd"], wav, periods=tuple(m.mpd.periods))
        outs += spec_discriminator_apply(
            disc_params["spec"], wav,
            fft_sizes=tuple(m.mstft.stft_params.fft_sizes),
            hop_sizes=tuple(m.mstft.stft_params.hop_sizes),
            win_lengths=tuple(m.mstft.stft_params.win_lengths),
            downsample_scales=tuple(m.mstft.downsample_scales))
        return outs

    return disc_forward


def make_train_step(cfg: Config, *, donate: bool = True):
    """Build the jitted train step: (state, batch) -> (state, metrics)."""
    import copy

    from ..config import resolve_remat

    cfg = copy.deepcopy(cfg)
    cfg.train.remat = resolve_remat(cfg)  # "auto" -> bool, once, for the
    tcfg = cfg.train                      # whole step (codec.forward reads it)
    lam = tcfg.lambdas
    mel_loss = MultiResolutionMelLoss(sample_rate=cfg.dataset.sample_rate) if tcfg.use_mel_loss else None
    disc_forward = make_disc_forward(cfg)
    if tcfg.remat:
        # discriminator activations (5 MPD + 5 spec pyramids on raw-rate audio)
        # dominate step memory; recompute them in the backward pass
        disc_forward = jax.checkpoint(disc_forward)

    def disc_forward_pair(disc_params, a, b):
        """Run the real and fake wavs through every sub-discriminator as ONE
        2B batch (convs are per-sample, so this is the same math as two
        passes) — halves the number of conv dispatches and doubles the
        per-conv batch, which the small disc convs need for MXU utilization."""
        n = a.shape[0]
        outs = disc_forward(disc_params, jnp.concatenate([a, b], axis=0))
        return (jax.tree.map(lambda t: t[:n], outs),
                jax.tree.map(lambda t: t[n:], outs))
    gen_tx, disc_tx = make_optimizers(cfg)

    has_moe = codec.uses_moe(cfg)

    def gen_forward(gen_params, batch, teacher, step=None):
        # the frozen SSL teacher rides OUTSIDE gen_params: it takes no
        # gradient and must not see AdamW weight decay (the reference
        # freezes it with requires_grad_(False), lightning_module.py:194)
        fwd_params = gen_params if teacher is None else {**gen_params,
                                                         "w2v_bert": teacher}
        out = codec.forward(fwd_params, cfg, batch, training=True, step=step)
        sem = out.semantic_recon_loss
        diff = (out.gen_wav, out.vq_loss) + ((sem,) if sem is not None else ())
        if has_moe:
            diff = diff + (out.moe_aux_loss,)
        aux = (out.vq_code, jax.lax.stop_gradient(out.quantizer_state))
        return diff, aux

    def make_disc_loss(y, y_detached):
        def disc_loss_fn(disc_params):
            real_outs, fake_outs = disc_forward_pair(disc_params, y, y_detached)
            real_l, fake_l = disc_loss(real_outs, fake_outs)
            total = lam.lambda_disc * (real_l + fake_l)
            return total, {"real_loss": real_l, "fake_loss": fake_l,
                           "disc_loss": total}

        return disc_loss_fn

    def make_gen_loss(y, disc_params):
        """Generator loss over the differentiable forward outputs, against a
        (stop-gradiented) discriminator — shared by the fused step and the
        per-micro-batch accumulation scan."""

        def gen_loss_fn(*diff):
            y_g = diff[0]
            vq_l = diff[1]
            # positional layout mirrors gen_forward: [sem][moe] by cfg flags
            idx = 2
            sem_l = None
            if tcfg.use_semantic:
                sem_l, idx = diff[idx], idx + 1
            moe_v = None
            if has_moe:
                moe_v, idx = diff[idx], idx + 1
            logs = {}
            total = 0.0
            if mel_loss is not None:
                ml = mel_loss(y_g[:, 0, :], y[:, 0, :])
                total += ml * lam.lambda_mel_loss
                logs["mel_loss"] = ml
            if tcfg.use_stft_loss:
                sl = multi_resolution_stft_loss(
                    y_g[:, 0, :], y[:, 0, :],
                    fft_sizes=tuple(tcfg.stft_loss_params.fft_sizes),
                    hop_sizes=tuple(tcfg.stft_loss_params.hop_sizes),
                    win_lengths=tuple(tcfg.stft_loss_params.win_lengths))
                total += sl * lam.lambda_stft_loss
                logs["stft_loss"] = sl
            sg_disc = jax.lax.stop_gradient(disc_params)
            if tcfg.use_feat_match_loss:
                fake_outs, real_outs = disc_forward_pair(sg_disc, y_g, y)
                real_outs = jax.lax.stop_gradient(real_outs)
            else:
                fake_outs = disc_forward(sg_disc, y_g)
            adv = gen_adv_loss(fake_outs)
            total += adv * lam.lambda_adv
            logs["adv_loss"] = adv
            if tcfg.use_feat_match_loss:
                fm = feature_matching_loss(fake_outs, real_outs)
                total += fm * lam.lambda_feat_match_loss
                logs["fm_loss"] = fm
            vq_total = jnp.sum(vq_l)
            total += vq_total
            logs["vq_loss"] = vq_total
            if sem_l is not None:
                total += sem_l * lam.lambda_semantic_loss
                logs["semantic_recon_loss"] = sem_l
            if moe_v is not None:
                # Switch router aux losses (ops/moe.py): load balance + z
                total += (moe_v[0] * lam.lambda_moe_load_balance
                          + moe_v[1] * lam.lambda_moe_router_z)
                logs["moe_load_balance"] = moe_v[0]
                logs["moe_router_z"] = moe_v[1]
                logs["moe_dropped_frac"] = moe_v[2]
            logs["gen_loss"] = total
            return total, logs

        return gen_loss_fn

    n_accum = max(int(tcfg.accumulate_grad_batches), 1)

    def step_fn(state: TrainState, batch: Dict[str, Any], teacher=None):
        if tcfg.precision == "fp32_strict":
            # true fp32 MXU accumulation everywhere (TPU default keeps fp32
            # tensors but runs matmuls in bf16, like torch's TF32-on default)
            import contextlib

            ctx = jax.default_matmul_precision("float32")
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            if n_accum > 1:
                return _step_body_accum(state, batch, teacher)
            return _step_body(state, batch, teacher)

    def _step_body(state: TrainState, batch: Dict[str, Any], teacher):
        y = batch["wav"][:, None, :]

        # --- 1. shared generator forward, linearized once
        diff_out, gen_vjp, (vq_code, qstate) = jax.vjp(
            functools.partial(gen_forward, batch=batch, teacher=teacher,
                              step=state.step),
            state.gen_params, has_aux=True)
        y_ = diff_out[0]
        y_detached = jax.lax.stop_gradient(y_)

        # --- 2. discriminator update on detached fake
        (disc_total, disc_logs), disc_grads = jax.value_and_grad(
            make_disc_loss(y, y_detached), has_aux=True)(state.disc_params)
        disc_updates, disc_opt_state = disc_tx.update(
            disc_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        # --- 3. generator loss against the UPDATED discriminator
        gen_loss_fn = make_gen_loss(y, disc_params)
        grad_fn = jax.value_and_grad(gen_loss_fn, argnums=tuple(range(len(diff_out))),
                                     has_aux=True)
        (gen_total, gen_logs), cotangents = grad_fn(*diff_out)
        (gen_grads,) = gen_vjp(cotangents)
        gen_updates, gen_opt_state = gen_tx.update(
            gen_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)
        if qstate is not None:
            # EMA-codebook quantizers: the codebook is state, not a gradient
            # parameter — overwrite with the forward pass's EMA update
            # (discards the optimizer's spurious weight-decay on those leaves).
            gen_params = {**gen_params, "quantizer": qstate}

        from .metrics import codebook_histogram

        hist = codebook_histogram(vq_code, cfg.model.codec_decoder.codebook_size)
        metrics = {**disc_logs, **gen_logs}
        return _finalize(state, disc_total, disc_grads, gen_total, gen_grads,
                         gen_params, disc_params, gen_opt_state,
                         disc_opt_state, metrics, hist)

    def _step_body_accum(state: TrainState, batch: Dict[str, Any], teacher):
        """Gradient accumulation over N micro-batches (reference trainer
        surface: accumulate_grad_batches, cfgs/config2/train/default.yaml:10),
        preserving the disc-then-gen schedule PER EFFECTIVE STEP:

          phase 1: disc grads on every micro-batch's stop-gradiented fake at
                   the PRE-update disc params, averaged -> one disc update;
          phase 2: gen grads on every micro-batch against the UPDATED disc,
                   averaged -> one gen update.

        Both phases are lax.scan over the micro axis, so activation memory is
        one micro-batch's worth (the memory knob that makes effective bs64
        fit a 16 GB chip). Equal-size micro-batches make the averaged losses
        equal the fused big-batch means, so N=2 matches the fused 2x-batch
        step to fp32 rounding (test_train_step_accumulation_matches_fused).
        Cost vs fused: one extra generator forward per micro-batch (phase 1
        recomputes the fake rather than saving N sets of vjp residuals).
        EMA quantizer state threads sequentially through phase 2's carry.
        """
        n = n_accum
        for k, v in batch.items():
            if v.shape[0] % n:
                raise ValueError(
                    f"batch dim {v.shape[0]} of {k!r} not divisible by "
                    f"accumulate_grad_batches={n}")
        mbs = {k: v.reshape((n, v.shape[0] // n) + v.shape[1:])
               for k, v in batch.items()}
        zeros_like = functools.partial(jax.tree.map, jnp.zeros_like)

        # --- phase 1: accumulate disc grads at the pre-update disc params
        def disc_body(carry, mb):
            gacc, lacc = carry
            y = mb["wav"][:, None, :]
            diff_out, _ = gen_forward(state.gen_params, mb, teacher,
                                      step=state.step)
            y_det = jax.lax.stop_gradient(diff_out[0])
            (_, logs), grads = jax.value_and_grad(
                make_disc_loss(y, y_det), has_aux=True)(state.disc_params)
            return (jax.tree.map(jnp.add, gacc, grads),
                    jax.tree.map(jnp.add, lacc, logs)), None

        dlog0 = {k: jnp.zeros(()) for k in ("real_loss", "fake_loss",
                                            "disc_loss")}
        (disc_grads, disc_logs), _ = jax.lax.scan(
            disc_body, (zeros_like(state.disc_params), dlog0), mbs)
        disc_grads = jax.tree.map(lambda g: g / n, disc_grads)
        disc_logs = {k: v / n for k, v in disc_logs.items()}
        disc_total = disc_logs["disc_loss"]
        disc_updates, disc_opt_state = disc_tx.update(
            disc_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        # --- phase 2: accumulate gen grads against the updated disc
        from .metrics import codebook_histogram

        d = cfg.model.codec_decoder
        has_qstate = (not d.fsq) and d.quantizer == "ema_vq"
        glog_keys = ["adv_loss", "gen_loss", "vq_loss"]
        if mel_loss is not None:
            glog_keys.append("mel_loss")
        if tcfg.use_stft_loss:
            glog_keys.append("stft_loss")
        if tcfg.use_feat_match_loss:
            glog_keys.append("fm_loss")
        if tcfg.use_semantic:
            glog_keys.append("semantic_recon_loss")
        if has_moe:
            glog_keys += ["moe_load_balance", "moe_router_z",
                          "moe_dropped_frac"]

        def gen_body(carry, mb):
            q, gacc, lacc, hacc = carry
            gp = {**state.gen_params, "quantizer": q}
            y = mb["wav"][:, None, :]
            diff_out, gen_vjp, (vq_code, qstate) = jax.vjp(
                functools.partial(gen_forward, batch=mb, teacher=teacher,
                                  step=state.step), gp, has_aux=True)
            grad_fn = jax.value_and_grad(
                make_gen_loss(y, disc_params),
                argnums=tuple(range(len(diff_out))), has_aux=True)
            (_, logs), cotangents = grad_fn(*diff_out)
            (grads,) = gen_vjp(cotangents)
            q_new = qstate if qstate is not None else q
            return (q_new, jax.tree.map(jnp.add, gacc, grads),
                    jax.tree.map(jnp.add, lacc, logs),
                    hacc + codebook_histogram(vq_code, d.codebook_size)), None

        glog0 = {k: jnp.zeros(()) for k in glog_keys}
        (q_final, gen_grads, gen_logs, hist), _ = jax.lax.scan(
            gen_body, (state.gen_params["quantizer"],
                       zeros_like(state.gen_params), glog0,
                       jnp.zeros(d.codebook_size, jnp.float32)), mbs)
        gen_grads = jax.tree.map(lambda g: g / n, gen_grads)
        gen_logs = {k: v / n for k, v in gen_logs.items()}
        gen_total = gen_logs["gen_loss"]
        gen_updates, gen_opt_state = gen_tx.update(
            gen_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)
        if has_qstate:
            gen_params = {**gen_params, "quantizer": q_final}

        metrics = {**disc_logs, **gen_logs}
        return _finalize(state, disc_total, disc_grads, gen_total, gen_grads,
                         gen_params, disc_params, gen_opt_state,
                         disc_opt_state, metrics, hist)

    def _finalize(state, disc_total, disc_grads, gen_total, gen_grads,
                  gen_params, disc_params, gen_opt_state, disc_opt_state,
                  metrics, hist):
        if tcfg.guard_nonfinite:
            # non-finite step guard (SURVEY §5.2 hardening, beyond the
            # reference): if either side's total loss OR any gradient leaf is
            # non-finite, keep the old params/opt-state for that side instead
            # of poisoning them — a jnp.where select, no host sync. Gradients
            # must be checked too: a backward-only NaN (e.g. d/dx of a norm at
            # exactly 0) leaves the loss finite while the update is poisoned.
            # The skipped-step count surfaces in the metrics for the logger.
            def _keep_if(bad, new, old):
                return jax.tree.map(
                    lambda n, o: jnp.where(bad, o, n) if hasattr(n, "dtype")
                    else n, new, old)

            def _any_nonfinite(tree):
                flags = [~jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(tree)
                         if hasattr(l, "dtype")
                         and jnp.issubdtype(l.dtype, jnp.floating)]
                return functools.reduce(jnp.logical_or, flags,
                                        jnp.asarray(False))

            bad_d = ~jnp.isfinite(disc_total) | _any_nonfinite(disc_grads)
            bad_g = ~jnp.isfinite(gen_total) | _any_nonfinite(gen_grads)
            disc_params = _keep_if(bad_d, disc_params, state.disc_params)
            disc_opt_state = _keep_if(bad_d, disc_opt_state, state.disc_opt_state)
            gen_params = _keep_if(bad_g, gen_params, state.gen_params)
            gen_opt_state = _keep_if(bad_g, gen_opt_state, state.gen_opt_state)
            metrics["nonfinite_skipped"] = (bad_d | bad_g).astype(jnp.float32)

        new_state = TrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
        )
        # LR monitor (reference: LearningRateMonitor, train.py:25)
        from .schedule import warmup_lr_schedule

        gen_sched = warmup_lr_schedule(
            warmup_step=tcfg.gen_schedule_params.warmup_step,
            down_step=tcfg.gen_schedule_params.down_step,
            max_lr=tcfg.gen_schedule_params.max_lr,
            min_lr=tcfg.gen_schedule_params.min_lr)
        metrics["gen_lr"] = gen_sched(state.step)
        metrics["codebook_hist"] = hist
        return new_state, metrics

    return step_fn


def jit_train_step(cfg: Config, mesh=None, *, donate: bool = False,
                   fsdp: bool = False, fsdp_min_size: int = 2 ** 14):
    """Jit the step; with a mesh, shard the batch over 'data' and replicate state.

    The step signature is (state, batch, teacher=None); `teacher` carries
    the frozen w2v-bert params for the in-loop SSL path (replicated, never
    donated, never checkpointed). The batch sharding is a pytree prefix, so
    any batch keys (wav, feats, semantic_target) shard on dim 0.

    fsdp=True additionally shards params + optimizer state over 'data'
    (ZeRO-3 style, parallel/mesh.fsdp_state_shardings): weights are
    all-gathered at use and gradients reduce-scattered by GSPMD, cutting
    per-chip param/opt memory by ~mesh size. Metrics stay replicated.

    donate=True (used by the training loop) donates the input state buffers —
    halves peak param/opt-state memory but invalidates the passed-in state.

    A mesh with a 'model' axis (parallel/tp.make_dp_tp_mesh) activates
    Megatron-style tensor parallelism for conformer backbones: attention/FFN
    weights (and their mirrored optimizer moments) shard over 'model', the
    batch shards over 'data', and the step is traced under
    tp_shard_activations so q/k/v carry the head-sharding constraint.
    Composes with fsdp=True (non-TP leaves shard over 'data').
    """
    step_fn = make_train_step(cfg)
    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = repl
    tp = "model" in mesh.axis_names
    if "pipe" in mesh.axis_names:
        # GPipe pipeline parallelism (parallel/pp.py): state stays
        # replicated (the backbone is stage-stacked + 'pipe'-sharded inside
        # the traced forward, gradients flowing back to the unstacked
        # leaves); the batch shards over 'data' as usual
        from ..parallel.pp import pp_train_context, validate_pp

        validate_pp(cfg, mesh.shape["pipe"])
        n_micro = (int(cfg.train.pipeline_microbatches)
                   or mesh.shape["pipe"])
        inner_pp = step_fn

        def step_fn(state, batch, teacher=None):  # noqa: F811
            with pp_train_context(mesh, n_micro):
                return inner_pp(state, batch, teacher)
    if tp:
        from ..parallel.tp import tp_shard_activations, tp_state_shardings

        state_sh = tp_state_shardings(mesh, cfg, fsdp=fsdp,
                                      fsdp_min_size=fsdp_min_size)
        inner = step_fn

        def step_fn(state, batch, teacher=None):  # noqa: F811
            with tp_shard_activations(mesh):
                return inner(state, batch, teacher)
    elif fsdp:
        from ..parallel.mesh import fsdp_state_shardings
        from .state import init_train_state

        abstract = jax.eval_shape(
            lambda: init_train_state(jax.random.key(0), cfg))
        state_sh = fsdp_state_shardings(mesh, abstract,
                                        min_size=fsdp_min_size)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl),
        out_shardings=((state_sh, repl) if (fsdp or tp) else (repl, repl)),
        **donate_kw,
    )

    def call(state, batch, teacher=None):
        # in_shardings pins 3 positional args; fill the teacher default here
        return jitted(state, batch, teacher)

    return call
