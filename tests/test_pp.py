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


def test_pp_train_step_matches_dp():
    """train.pipeline_parallel: the GPipe step over a ('data','pipe') mesh
    must match the pure-DP step to fp32-reduction tolerance (the same
    contract test_tp_train_step_matches_dp holds for TP)."""
    from audiotokenization_tpu.parallel.mesh import make_data_mesh, shard_batch
    from audiotokenization_tpu.parallel.pp import make_dp_pipe_mesh
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = pp_tiny_config()
    cfg.model.codec_encoder.n_layers = 4
    cfg.model.codec_decoder.n_layers = 4
    rng = np.random.RandomState(5)
    batch = {"wav": jnp.asarray((rng.randn(8, 800) * 0.1).astype(np.float32))}
    state0 = init_train_state(jax.random.key(0), cfg)

    mesh_dp = make_data_mesh()
    s_dp, m_dp = jit_train_step(cfg, mesh_dp)(state0, shard_batch(mesh_dp, batch))

    cfg.train.pipeline_parallel = 4
    mesh_pp = make_dp_pipe_mesh(4)
    assert dict(mesh_pp.shape) == {"data": 2, "pipe": 4}
    s_pp, m_pp = jit_train_step(cfg, mesh_pp)(state0, shard_batch(mesh_pp, batch))

    for k in ("gen_loss", "disc_loss", "mel_loss", "vq_loss"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_pp[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    # the scanned stage bodies fuse slightly differently from the unrolled
    # layer loop (~1e-6 activation delta, module docstring) — with random
    # weights that can flip an occasional argmin near-tie, which moves a
    # single codebook row's gradient. Allow a <=0.1% element tail.
    for a, b in zip(jax.tree.leaves(s_dp.gen_params),
                    jax.tree.leaves(s_pp.gen_params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        bad = np.abs(a - b) > (1e-5 + 1e-4 * np.abs(b))
        assert bad.mean() <= 1e-3, (a.shape, bad.mean())


def test_pp_train_loop_end_to_end(tmp_path):
    """train.pipeline_parallel through the stock loop: fit builds the
    ('data','pipe') mesh, steps, validates, checkpoints, resumes."""
    from audiotokenization_tpu.data.audio_io import write_wav
    from audiotokenization_tpu.data.dataset import AudioDataset, DataLoader
    from audiotokenization_tpu.train.loop import train

    rng = np.random.RandomState(0)
    files = []
    for i in range(4):
        p = tmp_path / f"clip{i}.wav"
        write_wav(p, (rng.randn(900) * 0.1).astype(np.float32), 16000)
        files.append(str(p))
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(files))

    cfg = pp_tiny_config()
    cfg.model.codec_encoder.n_layers = 4
    cfg.model.codec_decoder.n_layers = 4
    cfg.train.pipeline_parallel = 4
    cfg.train.pipeline_microbatches = 2  # 4-row batch: 2 micro x 2-way data
    cfg.dataset.train.filelist = str(fl)
    cfg.dataset.train.min_audio_length = 800
    cfg.dataset.train.batch_size = 4
    cfg.train.val_every_n_steps = 2
    cfg.train.num_sanity_val_steps = 1
    cfg.train.log_every_n_steps = 1
    ds = AudioDataset(cfg.dataset.train, sample_rate=16000,
                      pad_to_multiple_of=40, train=True)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    state = train(cfg, train_loader=loader, val_loader=loader,
                  run_dir=str(tmp_path / "run"), max_steps=2)
    assert int(state.step) == 2
    state2 = train(cfg, train_loader=loader, val_loader=loader,
                   run_dir=str(tmp_path / "run"), max_steps=3)
    assert int(state2.step) == 3


def test_pp_loop_validation_errors():
    from audiotokenization_tpu.parallel.pp import validate_pp
    from audiotokenization_tpu.config import Config

    cfg = Config()  # bigcodec: no PP target
    with pytest.raises(ValueError, match="conformer"):
        validate_pp(cfg, 2)
    cfg2 = pp_tiny_config()
    cfg2.model.codec_encoder.n_layers = 3
    with pytest.raises(ValueError, match="divisible"):
        validate_pp(cfg2, 2)


def test_pp_rejects_bad_shapes():
    cfg = pp_tiny_config()
    with pytest.raises(ValueError, match="divisible"):
        stack_stage_params(
            C.init_codec(jax.random.key(0), cfg)["encoder"]["backbone"], 3)
    cfg_bc = conformer_tiny_config()
    cfg_bc.model.codec_encoder.type = "bigcodec"
    with pytest.raises(ValueError, match="conformer"):
        jit_pp_tokenize(cfg_bc, make_pipe_mesh(2))
