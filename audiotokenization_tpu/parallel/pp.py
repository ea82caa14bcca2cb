"""Pipeline parallelism (GPipe-style) for the conformer backbone.

The reference has no pipeline parallelism — its deepest stack is 6 conformer
layers on one GPU (SURVEY.md §2.8). This module adds the remaining axis of
the parallelism matrix (dp / fsdp / tp / sp / **pp**) for deep conformer
variants that exceed one chip's HBM: the layer stack is split into
contiguous stages over a ``'pipe'`` mesh axis, the batch into M microbatches,
and activations stream stage-to-stage with neighbor-only ``ppermute`` (ICI)
in the classic GPipe schedule — M + P − 1 ticks, every device running its
stage's layers each tick, the first P − 1 results per stage being warm-up
bubble.

Implementation notes (TPU/XLA):
  - stage weights are the per-layer param pytrees stacked to a leading
    ``(n_stages, layers_per_stage, ...)`` axis and sharded ``P('pipe')`` —
    one ``lax.scan`` applies a stage's layers, so the schedule is a scan of
    scans with static trip counts (no dynamic shapes, one compiled program);
  - the tick loop is differentiable (scan + ppermute + where), so the same
    machinery backpropagates for pipeline-parallel training — asserted by
    the gradient-parity test (tests/test_pp.py);
  - numerics are IDENTICAL to the sequential backbone: each microbatch
    visits the same layers in the same order with the same dtypes, so
    pipeline tokenize is token-exact vs single device (also asserted).

For the flagship-size models, DP/FSDP/TP already cover training scale; PP
is the capability for depth growth, exposed as ``jit_pp_tokenize`` (serving)
and ``pp_backbone_fn`` (the ``backbone_fn`` hook of
models/conformer.conformer_encode, usable under any outer transform).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"{n_stages} stages > {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_stages]), axis_names=("pipe",))


def make_dp_pipe_mesh(n_pipe: int, devices=None) -> Mesh:
    """2-D mesh for pipeline-parallel TRAINING: data-parallel outer axis x
    pipeline-stage inner axis (stage neighbors on the fastest ICI hops, like
    tp.make_dp_tp_mesh's model axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_pipe:
        raise ValueError(
            f"{len(devices)} devices not divisible by pipeline_parallel={n_pipe}")
    arr = np.asarray(devices).reshape(len(devices) // n_pipe, n_pipe)
    return Mesh(arr, axis_names=("data", "pipe"))


def validate_pp(cfg, n_pipe: int, which=("encoder", "decoder")) -> None:
    """Fail fast on non-conformer configs / indivisible layer counts / MoE.

    which: restrict to the side(s) actually pipelined — serving paths
    pipeline one side (jit_pp_tokenize: encoder; jit_pp_synthesize:
    decoder), training both."""
    sides = []
    if "encoder" in which and cfg.model.codec_encoder.type == "conformer_stft":
        sides.append(("encoder", cfg.model.codec_encoder))
    if "decoder" in which and cfg.model.codec_decoder.type == "conformer_istft":
        sides.append(("decoder", cfg.model.codec_decoder))
    if not sides:
        raise ValueError(
            "pipeline_parallel>1 requires a conformer encoder or decoder; "
            "the BigCodec conv family scales via data/FSDP/sequence "
            "parallelism (parallel/mesh.py, parallel/sp.py)")
    for side, m in sides:
        if m.n_layers % n_pipe:
            raise ValueError(f"{side}: n_layers={m.n_layers} not divisible by "
                             f"pipeline_parallel={n_pipe}")
        if getattr(m, "ffn_type", "dense") == "moe":
            # moe_ffn's aux recording inside the shard_map stage scan would
            # leak sharded tracers into the outer collect_moe_aux bucket,
            # and the stage layers would route with default (top_k,
            # capacity) instead of the config's — not composed yet
            raise ValueError(f"{side}: ffn_type: moe is not composed with "
                             "pipeline_parallel yet; shard experts via "
                             "train.tensor_parallel instead")


# ---------------------------------------------------------------------------
# Trace-time context: the stock train step pipelines conformer backbones
# (models/conformer.py consults maybe_pp_backbone when no explicit
# backbone_fn is passed) — the pp analogue of tp.tp_shard_activations.
# ---------------------------------------------------------------------------

import contextlib
import threading

_local = threading.local()


@contextlib.contextmanager
def pp_train_context(mesh: Mesh, n_micro: int | None = None):
    """Inside this trace-time context, conformer backbones run as GPipe
    pipelines over the mesh's 'pipe' axis. Enter it INSIDE the jitted step
    so the schedule is baked into the traced program (train/step.py)."""
    prev = getattr(_local, "ctx", None)
    _local.ctx = (mesh, n_micro)
    try:
        yield
    finally:
        _local.ctx = prev


def maybe_pp_backbone(backbone_params, *, dim: int, n_head: int,
                      rope_theta: float, max_seq_len: int, conv_first: bool,
                      causal: bool, remat: bool = False):
    """Return a pipeline backbone_fn when a pp_train_context is active,
    else None. The per-layer params are stage-stacked INSIDE the traced
    program (one jnp.stack per leaf — gradients flow back through the stack
    to the unstacked state leaves, so the TrainState/checkpoint layout is
    identical to sequential training)."""
    ctx = getattr(_local, "ctx", None)
    if ctx is None:
        return None
    mesh, n_micro = ctx
    from ..ops.transformer import precompute_rope

    n_stages = mesh.shape["pipe"]
    stacked = stack_stage_params(backbone_params, n_stages)
    stacked = jax.lax.with_sharding_constraint(
        stacked, NamedSharding(mesh, P("pipe")))
    cos, sin = precompute_rope(dim // n_head, max_seq_len, rope_theta)
    return pp_backbone_fn(mesh, stacked, n_head=n_head, cos=cos, sin=sin,
                          conv_first=conv_first, causal=causal,
                          n_micro=n_micro, remat=remat)


def stack_stage_params(backbone_params, n_stages: int):
    """List-of-layer param dicts -> one pytree with leaves
    (n_stages, layers_per_stage, ...): stage s holds layers
    [s*L/P, (s+1)*L/P) — shard axis 0 over 'pipe'."""
    layers = backbone_params["layers"]
    L = len(layers)
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible by {n_stages} stages")
    per = L // n_stages
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, per) + xs[0].shape),
        *layers)


def pp_backbone_fn(mesh: Mesh, stacked, *, n_head: int, cos, sin,
                   conv_first: bool = True, causal: bool = False,
                   n_micro: int | None = None, remat: bool = False):
    """Build a (h, backbone_params) -> h replacement for conformer_backbone
    that runs `stacked` (stack_stage_params output, sharded over 'pipe') as
    a GPipe pipeline. The backbone_params argument is ignored — weights live
    in `stacked` so their sharding is explicit."""
    from ..ops.transformer import conformer_layer

    n_stages = mesh.shape["pipe"]

    def run(h, _backbone_params_unused=None):
        B, C, T = h.shape
        M = n_micro or n_stages
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mbs = h.reshape(M, B // M, C, T)
        cos_t, sin_t = cos[:T], sin[:T]
        layer = functools.partial(conformer_layer, n_head=n_head,
                                  conv_first=conv_first, causal=causal)
        if remat:
            # without this, the stage scan saves every layer's activations
            # per microbatch — exactly the memory the deep-stack regime PP
            # exists for can't afford (cfg.train.remat threads through
            # maybe_pp_backbone)
            layer = jax.checkpoint(layer)

        def local(stage_stack, mbs_l):
            stage_params = jax.tree.map(lambda a: a[0], stage_stack)
            idx = jax.lax.axis_index("pipe")

            def apply_stage(x):
                def body(x, lp):
                    return layer(x, lp, cos_t, sin_t), None

                x, _ = jax.lax.scan(body, x, stage_params)
                return x

            zero = jnp.zeros_like(mbs_l[0])

            def tick(carry, t):
                recv, results = carry
                feed = jax.lax.dynamic_index_in_dim(
                    mbs_l, jnp.minimum(t, M - 1), 0, keepdims=False)
                out = apply_stage(jnp.where(idx == 0, feed, recv))
                j = t - (n_stages - 1)
                write = (idx == n_stages - 1) & (j >= 0)
                upd = jax.lax.dynamic_update_index_in_dim(
                    results, out, jnp.maximum(j, 0), 0)
                results = jnp.where(write, upd, results)
                recv = jax.lax.ppermute(
                    out, "pipe", [(i, i + 1) for i in range(n_stages - 1)])
                return (recv, results), None

            (_, results), _ = jax.lax.scan(
                tick, (zero, jnp.zeros_like(mbs_l)),
                jnp.arange(M + n_stages - 1))
            # broadcast the last stage's completed buffer to every stage so
            # the result leaves the shard_map replicated: only stage P-1 ever
            # writes `results` (zeros elsewhere), so the psum IS the broadcast
            return jax.lax.psum(results, "pipe")

        # on a ('data','pipe') training mesh each data-group runs its own
        # pipeline over its microbatch rows (dim 1); pipe-only serving
        # meshes replicate the microbatches across stages
        mb_spec = P(None, "data") if "data" in mesh.axis_names else P()
        out = shard_map(local, mesh=mesh, in_specs=(P("pipe"), mb_spec),
                        out_specs=mb_spec, check_vma=False)(stacked, mbs)
        return out.reshape(B, C, T)

    return run


def jit_pp_tokenize(cfg, mesh: Mesh, *, n_micro: int | None = None):
    """Tokenizer with the conformer encoder backbone pipelined over 'pipe'.

    Returns fn(params, wav) -> codes, token-exact vs codec.tokenize
    (mode='conformant' — fp32 matmul accumulation) on a single device.
    """
    from ..models import codec
    from ..models.conformer import conformer_encode
    from ..ops.transformer import precompute_rope

    e = cfg.model.codec_encoder
    if e.type != "conformer_stft":
        raise ValueError("pipeline parallelism targets the conformer family; "
                         "BigCodec scales via dp/fsdp/sp (parallel/)")
    validate_pp(cfg, mesh.shape["pipe"], which=("encoder",))
    n_stages = mesh.shape["pipe"]
    cos, sin = precompute_rope(e.dim // e.n_head, e.max_seq_len, e.rope_theta)

    def fn(params, wav):
        stacked = stack_stage_params(params["encoder"]["backbone"], n_stages)
        stacked = jax.lax.with_sharding_constraint(
            stacked, NamedSharding(mesh, P("pipe")))
        bb = pp_backbone_fn(mesh, stacked, n_head=e.n_head, cos=cos, sin=sin,
                            conv_first=True, causal=e.causal, n_micro=n_micro)
        with jax.default_matmul_precision("float32"):
            latents = conformer_encode(
                params["encoder"], wav[:, None, :], hop_length=e.hop_length,
                n_fft=e.n_fft, window_size=e.window_size, n_head=e.n_head,
                rope_theta=e.rope_theta, max_seq_len=e.max_seq_len,
                causal=e.causal, backbone_fn=bb)
            latents = codec.semantic_vq_in(params, cfg, latents)
            _, codes, _ = codec.quantize(params, cfg, latents, training=False)
        return codes

    return _with_mesh_placement(jax.jit(fn), mesh)


def jit_pp_synthesize(cfg, mesh: Mesh, *, n_micro: int | None = None):
    """Decoder mirror: codes (Nq, B, Tf) -> waveform (B, T) with the
    conformer decoder backbone pipelined over 'pipe' (conv_first=False,
    codec_decoder.py:462-485 ordering). fp32-identical to codec.decode."""
    from ..models import codec
    from ..models.conformer import conformer_decode
    from ..ops.transformer import precompute_rope

    d = cfg.model.codec_decoder
    if d.type != "conformer_istft":
        raise ValueError("pipeline parallelism targets the conformer family")
    validate_pp(cfg, mesh.shape["pipe"], which=("decoder",))
    n_stages = mesh.shape["pipe"]
    cos, sin = precompute_rope(d.dim // d.n_head, d.max_seq_len, d.rope_theta)

    def fn(params, codes):
        stacked = stack_stage_params(params["decoder"]["backbone"], n_stages)
        stacked = jax.lax.with_sharding_constraint(
            stacked, NamedSharding(mesh, P("pipe")))
        bb = pp_backbone_fn(mesh, stacked, n_head=d.n_head, cos=cos, sin=sin,
                            conv_first=False, causal=d.causal, n_micro=n_micro)
        with jax.default_matmul_precision("float32"):
            emb = codec.codes_to_emb(params, cfg, jnp.moveaxis(codes, 0, -1))
            # semantic checkpoints decode fc_post_a(zq) (semantic.py:91)
            emb = codec.apply_fc_post_a(params, cfg, emb)
            wav = conformer_decode(
                params["decoder"], emb, hop_length=d.hop_length, n_fft=d.n_fft,
                n_head=d.n_head, rope_theta=d.rope_theta,
                max_seq_len=d.max_seq_len, causal=d.causal, backbone_fn=bb)
        return wav[:, 0, :]

    return _with_mesh_placement(jax.jit(fn), mesh)


def _with_mesh_placement(jitted, mesh: Mesh):
    """Checkpoint-restored params arrive committed to one device, which
    conflicts with the pipeline's multi-device sharding constraints; place
    inputs replicated on the mesh first (a no-op copy once resident)."""
    repl = NamedSharding(mesh, P())

    def call(params, x):
        return jitted(jax.device_put(params, repl), jax.device_put(x, repl))

    return call
