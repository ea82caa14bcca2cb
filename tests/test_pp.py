"""Pipeline-parallel conformer tests (virtual 8-device CPU mesh).

Beyond-reference capability (the reference has no PP, SURVEY §2.8): GPipe
microbatch pipelining of the conformer layer stack over a 'pipe' mesh axis
(parallel/pp.py) must reproduce the sequential backbone — token-exact
tokenize, activations equal to scan-fusion rounding (~1e-6, the same delta
a non-pipelined lax.scan over layers produces), and matching gradients (the
training-readiness property).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.ops.transformer import (conformer_backbone,
                                                   init_conformer_backbone,
                                                   precompute_rope)
from audiotokenization_tpu.parallel.pp import (jit_pp_tokenize, make_pipe_mesh,
                                               pp_backbone_fn,
                                               stack_stage_params)

from test_conformer_train import conformer_tiny_config


def pp_tiny_config():
    cfg = conformer_tiny_config()
    cfg.model.codec_encoder.n_layers = 4  # 4 stages x 1 layer
    return cfg


def test_pp_backbone_matches_sequential_and_grads():
    dim, n_head, n_layers = 32, 2, 4
    key = jax.random.key(0)
    bb = init_conformer_backbone(key, dim, n_layers, n_head=n_head)
    x = jnp.asarray(
        (np.random.RandomState(0).randn(8, dim, 20) * 0.5).astype(np.float32))
    cos, sin = precompute_rope(dim // n_head, 64, 500.0)

    ref = conformer_backbone(x, bb, n_head=n_head, rope_theta=500.0,
                             max_seq_len=64, conv_first=True)

    mesh = make_pipe_mesh(4)
    stacked = stack_stage_params(bb, 4)

    def run_pp(stacked, x):
        fn = pp_backbone_fn(mesh, stacked, n_head=n_head, cos=cos, sin=sin,
                            conv_first=True)
        return fn(x)

    got = jax.jit(run_pp)(stacked, x)
    # the pipeline applies layers via lax.scan; XLA fuses a scanned layer
    # body slightly differently from the unrolled python loop, giving ~1e-6
    # deltas IDENTICAL to a plain (non-pipelined) scan over layers — the
    # pipeline machinery itself adds nothing (tokens stay exact, see below)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    # gradient parity: the pipeline backpropagates like the sequential stack
    def loss_pp(stacked):
        return jnp.sum(jnp.square(run_pp(stacked, x)))

    def loss_seq(stacked):
        # unstack back to the per-layer list and run sequentially
        L = 4
        layers = [jax.tree.map(lambda a: a.reshape((L,) + a.shape[2:])[i],
                               stacked) for i in range(L)]
        out = conformer_backbone(x, {"layers": layers}, n_head=n_head,
                                 rope_theta=500.0, max_seq_len=64,
                                 conv_first=True)
        return jnp.sum(jnp.square(out))

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
        # backprop amplifies the ~1e-6 scan-fusion forward deltas
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_pp_tokenize_token_exact():
    cfg = pp_tiny_config()
    params = C.init_codec(jax.random.key(1), cfg)
    wav = jnp.asarray(
        (np.random.RandomState(1).randn(4, 800) * 0.1).astype(np.float32))
    ref = np.asarray(jax.jit(
        lambda p, w: C.tokenize(p, cfg, w, mode="conformant"))(params, wav))
    mesh = make_pipe_mesh(4)
    got = np.asarray(jit_pp_tokenize(cfg, mesh)(params, wav))
    assert np.array_equal(ref, got)
    # more microbatches than stages (M=4 batch rows, M > P bubbles amortized)
    mesh2 = make_pipe_mesh(2)
    got2 = np.asarray(jit_pp_tokenize(cfg, mesh2, n_micro=4)(params, wav))
    assert np.array_equal(ref, got2)


def test_pp_synthesize_round_trip():
    from audiotokenization_tpu.parallel.pp import jit_pp_synthesize

    cfg = pp_tiny_config()
    cfg.model.codec_decoder.n_layers = 4
    params = C.init_codec(jax.random.key(2), cfg)
    wav = jnp.asarray(
        (np.random.RandomState(2).randn(4, 800) * 0.1).astype(np.float32))
    codes = C.tokenize(params, cfg, wav, mode="conformant")
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def ref_decode(p, codes):
        with jax.default_matmul_precision("float32"):
            emb = C.codes_to_emb(p, cfg, jnp.moveaxis(codes, 0, -1))
            return C.decode(p, cfg, emb)[:, 0, :]

    ref = np.asarray(ref_decode(params, codes))
    mesh = make_pipe_mesh(4)
    got = np.asarray(jit_pp_synthesize(cfg, mesh)(params, codes))
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)


def test_synthesize_cli_pipeline_parallel(tmp_path):
    """synthesize --pipeline_parallel N produces the same audio as the plain
    decode path (same --random token stream, folded inference params)."""
    from audiotokenization_tpu.cli.synthesize import main as synth_main
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state

    cfg = pp_tiny_config()
    cfg.model.codec_decoder.n_layers = 4
    run_dir = tmp_path / "run"
    ckpt = CheckpointManager(str(run_dir), cfg)
    ckpt.save(init_train_state(jax.random.key(0), cfg))
    ckpt.wait()

    common = ["--codec_ckpt", str(run_dir), "--random", "--seconds", "0.05",
              "--num_samples", "2", "--seed", "3"]
    synth_main(common + ["--out_dir", str(tmp_path / "plain")])
    synth_main(common + ["--out_dir", str(tmp_path / "pp"),
                         "--pipeline_parallel", "4"])
    from audiotokenization_tpu.data.audio_io import read_audio

    for i in range(2):
        a, _ = read_audio(tmp_path / "plain" / f"sample_{i}.wav")
        b, _ = read_audio(tmp_path / "pp" / f"sample_{i}.wav")
        np.testing.assert_allclose(a, b, atol=2e-4)
    np.testing.assert_array_equal(
        np.load(tmp_path / "plain" / "tokens.npy"),
        np.load(tmp_path / "pp" / "tokens.npy"))


def test_synthesize_cli_semantic_paths_agree(tmp_path):
    """Semantic checkpoints decode fc_post_a(zq) (semantic.py:91): the plain
    and --pipeline_parallel synthesize paths must produce the SAME audio —
    a parallelism flag never changes the output (ADVICE r3 medium)."""
    from audiotokenization_tpu.cli.synthesize import main as synth_main
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state

    cfg = pp_tiny_config()
    cfg.model.codec_decoder.n_layers = 4
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = False
    run_dir = tmp_path / "run"
    ckpt = CheckpointManager(str(run_dir), cfg)
    ckpt.save(init_train_state(jax.random.key(0), cfg))
    ckpt.wait()

    common = ["--codec_ckpt", str(run_dir), "--random", "--seconds", "0.05",
              "--num_samples", "2", "--seed", "3"]
    synth_main(common + ["--out_dir", str(tmp_path / "plain")])
    synth_main(common + ["--out_dir", str(tmp_path / "pp"),
                         "--pipeline_parallel", "4"])
    from audiotokenization_tpu.data.audio_io import read_audio

    for i in range(2):
        a, _ = read_audio(tmp_path / "plain" / f"sample_{i}.wav")
        b, _ = read_audio(tmp_path / "pp" / f"sample_{i}.wav")
        assert np.abs(a).max() > 0  # fc_post_a actually ran (non-trivial out)
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_pp_rejects_bad_shapes():
    cfg = pp_tiny_config()
    with pytest.raises(ValueError, match="divisible"):
        stack_stage_params(
            C.init_codec(jax.random.key(0), cfg)["encoder"]["backbone"], 3)
    cfg_bc = conformer_tiny_config()
    cfg_bc.model.codec_encoder.type = "bigcodec"
    with pytest.raises(ValueError, match="conformer"):
        jit_pp_tokenize(cfg_bc, make_pipe_mesh(2))
