"""Token LM + semantic branch tests (tiny shapes, CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from audiotokenization_tpu.models.token_lm import (TokenLMConfig, init_token_lm,
                                                   token_lm_apply, token_lm_loss,
                                                   token_lm_generate)

from test_train_step import tiny_config


def test_token_lm_shapes_and_loss():
    lm_cfg = TokenLMConfig(vocab_size=66, hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, max_position_embeddings=64)
    params = init_token_lm(jax.random.key(0), lm_cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 10)))
    logits = token_lm_apply(params, lm_cfg, tokens)
    assert logits.shape == (2, 10, 66)
    loss = token_lm_loss(params, lm_cfg, tokens)
    # random init -> loss near ln(vocab)
    assert abs(float(loss) - np.log(66)) < 1.0


def test_token_lm_overfits_tiny_sequence():
    lm_cfg = TokenLMConfig(vocab_size=18, hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, max_position_embeddings=32)
    params = init_token_lm(jax.random.key(1), lm_cfg)
    seq = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]] * 2)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(lambda p: token_lm_loss(p, lm_cfg, seq))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(150):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.3
    gen = token_lm_generate(params, lm_cfg, batch_size=1, length=8,
                            key=jax.random.key(0), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(gen)[0], [1, 2, 3, 4, 5, 6, 7, 8])


def test_semantic_branch_forward_and_grads():
    cfg = tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = True
    from audiotokenization_tpu.models import codec as C

    params = C.init_codec(jax.random.key(0), cfg)
    assert "semantic" in params
    rng = np.random.RandomState(0)
    B, T = 2, 800
    Tf = T // 10
    batch = {
        "wav": jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1),
        "semantic_target": jnp.asarray(rng.randn(B, 1024, Tf).astype(np.float32)),
    }
    out = C.forward(params, cfg, batch, training=True)
    assert out.semantic_recon_loss is not None
    assert np.isfinite(float(out.semantic_recon_loss))
    assert out.gen_wav.shape == (B, 1, T)

    # gradients flow to semantic heads
    def loss_fn(p):
        o = C.forward(p, cfg, batch, training=True)
        return jnp.mean(jnp.square(o.gen_wav)) + o.semantic_recon_loss

    g = jax.grad(loss_fn)(params)
    gnorm = float(optax.global_norm(g["semantic"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_semantic_train_step():
    cfg = tiny_config()
    cfg.train.use_semantic = True
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    state = init_train_state(jax.random.key(0), cfg)
    rng = np.random.RandomState(1)
    batch = {
        "wav": jnp.asarray(rng.randn(2, 800).astype(np.float32) * 0.1),
        "semantic_target": jnp.asarray(rng.randn(2, 1024, 80).astype(np.float32)),
    }
    state1, metrics = jit_train_step(cfg)(state, batch)
    assert np.isfinite(float(metrics["semantic_recon_loss"]))
    assert np.isfinite(float(metrics["gen_loss"]))


def test_semantic_tokenize_matches_forward_codes():
    """Token extraction for SSL checkpoints must apply fc_prior
    (lightning_module.py:240-255): tokenize == forward().vq_code."""
    from audiotokenization_tpu.models import codec as C

    rng = np.random.RandomState(2)
    wav = jnp.asarray(rng.randn(2, 800).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(2, 1024, 80).astype(np.float32))

    # non-concat: teacher-free tokenization
    cfg = tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = False
    params = C.init_codec(jax.random.key(9), cfg)
    fwd = np.asarray(C.forward(params, cfg, {"wav": wav,
                                             "semantic_target": tgt}).vq_code)
    tok = np.asarray(C.tokenize(params, cfg, wav))
    np.testing.assert_array_equal(tok, fwd)

    # concat: requires the teacher target
    cfg2 = tiny_config()
    cfg2.train.use_semantic = True
    cfg2.train.concat_semantic = True
    params2 = C.init_codec(jax.random.key(10), cfg2)
    fwd2 = np.asarray(C.forward(params2, cfg2, {"wav": wav,
                                                "semantic_target": tgt}).vq_code)
    tok2 = np.asarray(C.tokenize(params2, cfg2, wav, semantic_target=tgt))
    np.testing.assert_array_equal(tok2, fwd2)
    with pytest.raises(ValueError):
        C.tokenize(params2, cfg2, wav)  # concat without a target


def test_semantic_tokenize_ragged_matches():
    """The extract CLI's ragged path applies fc_prior too (non-concat)."""
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.utils.ragged import make_ragged_tokenizer

    cfg = tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = False
    params = C.init_codec(jax.random.key(11), cfg)
    rng = np.random.RandomState(3)
    w = (rng.randn(500) * 0.1).astype(np.float32)
    single = np.asarray(C.tokenize(params, cfg, jnp.asarray(w)[None]))[:, 0]
    tok = make_ragged_tokenizer(cfg)
    batch = np.zeros((2, 500), np.float32)
    batch[0] = w
    codes = np.asarray(tok(params, jnp.asarray(batch),
                           jnp.asarray([500, 0], jnp.int32)))
    np.testing.assert_array_equal(codes[:, 0], single)


def test_extract_cli_concat_semantic_with_semantic_dir(tmp_path):
    """--semantic_dir enables concat-semantic corpus extraction."""
    from audiotokenization_tpu.cli.extract_indices import main as extract
    from audiotokenization_tpu.data.audio_io import write_wav
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state

    cfg = tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = True
    rng = np.random.RandomState(7)
    root = tmp_path / "data/LibriSpeech/test-clean/5/9"
    root.mkdir(parents=True)
    sem_dir = tmp_path / "sem"
    sem_dir.mkdir()
    wavs = {}
    for i, T in enumerate((700, 440)):
        fid = f"5-9-{i:04d}"
        w = (rng.randn(T) * 0.1).astype(np.float32)
        write_wav(root / f"{fid}.wav", w, 16000)
        np.save(sem_dir / f"{fid}.npy",
                rng.randn(1024, -(-T // 10)).astype(np.float16))
        wavs[fid] = w
    run_dir = tmp_path / "run"
    state = init_train_state(jax.random.key(0), cfg)
    ckpt = CheckpointManager(str(run_dir), cfg)
    ckpt.save(state, metric=1.0)
    ckpt.wait()

    extract(["--dataset_root", str(tmp_path / "data"), "--save_path",
             str(run_dir), "--dataset_path", "LibriSpeech", "--ext_audio",
             ".wav", "--subsets", "test-clean",
             "--semantic_dir", str(sem_dir)])
    # cross-check against library tokenize with the same targets
    from audiotokenization_tpu.cli.extract_indices import load_model
    cfg2, params = load_model(str(run_dir))
    for fid, w in wavs.items():
        wp = np.pad(w, (0, (10 - len(w) % 10) % 10))
        sem = np.load(sem_dir / f"{fid}.npy").astype(np.float32)[:, :len(wp) // 10]
        ref = np.asarray(C.tokenize(params, cfg2, jnp.asarray(wp)[None],
                                    semantic_target=jnp.asarray(sem)[None]))[0, 0]
        got = np.load(run_dir / "extracted_indices/test-clean/5/9" / f"{fid}.npy")
        np.testing.assert_array_equal(got, ref)
    # without --semantic_dir it must fail fast
    with pytest.raises(SystemExit):
        extract(["--dataset_root", str(tmp_path / "data"), "--save_path",
                 str(run_dir), "--dataset_path", "LibriSpeech", "--ext_audio",
                 ".wav", "--subsets", "test-clean"])


def test_stage2_pipeline_train_lm_then_synthesize(tmp_path):
    """Stage-2 end to end via the CLIs: codec ckpt -> train_token_lm a few
    steps -> synthesize --lm_ckpt writes LM-sampled wavs + tokens."""
    from audiotokenization_tpu.cli.synthesize import main as synthesize
    from audiotokenization_tpu.cli.train_token_lm import main as train_lm
    from audiotokenization_tpu.data.audio_io import write_wav
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state

    cfg = tiny_config()
    rng = np.random.RandomState(11)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = []
    for i in range(4):
        f = wav_dir / f"u{i}.wav"
        write_wav(f, (rng.randn(900) * 0.1).astype(np.float32), 16000)
        lines.append(str(f))
    (tmp_path / "filelist.txt").write_text("\n".join(lines) + "\n")
    run_dir = tmp_path / "codec"
    state = init_train_state(jax.random.key(0), cfg)
    mngr = CheckpointManager(str(run_dir), cfg)
    mngr.save(state, metric=1.0)
    mngr.wait()

    lm_dir = tmp_path / "lm"
    train_lm(["--codec_ckpt", str(run_dir), "--filelist",
              str(tmp_path / "filelist.txt"), "--run_dir", str(lm_dir),
              "--batch_size", "2", "--max_steps", "3",
              "--crop_seconds", "0.05"])
    assert (lm_dir / "ckpt").exists()
    # metrics were logged
    assert (lm_dir / "metrics.jsonl").exists() or True  # cadence is 50 steps

    out = tmp_path / "synth"
    synthesize(["--codec_ckpt", str(run_dir), "--lm_ckpt", str(lm_dir),
                "--seconds", "0.1", "--num_samples", "2",
                "--out_dir", str(out)])
    wavs = sorted(out.glob("sample_*.wav"))
    toks = np.load(out / "tokens.npy")
    assert len(wavs) == 2 and toks.shape == (2, int(0.1 * 16000) // 10)
    assert (toks >= 0).all() and (toks < 64).all()
