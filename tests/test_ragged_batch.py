"""Ragged-batch tokenization: batched variable-length files == per-file tokens."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.utils.ragged import make_ragged_tokenizer

from test_train_step import tiny_config


def test_ragged_batch_exact_vs_per_file():
    cfg = tiny_config()  # hop 10
    params = C.init_codec(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    lengths = [730, 400, 1000, 90]  # hop multiples
    wavs = [(rng.randn(T) * 0.1).astype(np.float32) for T in lengths]
    L = 1000
    batch = np.zeros((4, L), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    tok = make_ragged_tokenizer(cfg)
    codes = np.asarray(tok(params, jnp.asarray(batch),
                           jnp.asarray(lengths, jnp.int32)))
    assert codes.shape == (1, 4, L // 10)
    for i, w in enumerate(wavs):
        single = np.asarray(C.tokenize(params, cfg, jnp.asarray(w)[None]))[:, 0]
        np.testing.assert_array_equal(codes[:, i, :len(w) // 10], single)


def test_ragged_zero_length_row_is_harmless():
    cfg = tiny_config()
    params = C.init_codec(jax.random.key(1), cfg)
    rng = np.random.RandomState(1)
    w = (rng.randn(500) * 0.1).astype(np.float32)
    batch = np.zeros((2, 500), np.float32)
    batch[0] = w
    tok = make_ragged_tokenizer(cfg)
    codes = np.asarray(tok(params, jnp.asarray(batch),
                           jnp.asarray([500, 0], jnp.int32)))
    single = np.asarray(C.tokenize(params, cfg, jnp.asarray(w)[None]))[:, 0]
    np.testing.assert_array_equal(codes[:, 0], single)


def test_extract_cli_batched_matches_single(tmp_path):
    """extract_indices --batch_size 3 writes byte-identical .npy trees."""
    from audiotokenization_tpu.cli.extract_indices import main as extract
    from audiotokenization_tpu.data.audio_io import write_wav
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state

    cfg = tiny_config()
    rng = np.random.RandomState(2)
    root = tmp_path / "data/LibriSpeech/test-clean/7/21"
    root.mkdir(parents=True)
    for i, T in enumerate((1210, 433, 780, 1111, 350)):
        write_wav(root / f"7-21-{i:04d}.wav",
                  (rng.randn(T) * 0.1).astype(np.float32), 16000)
    run_dir = tmp_path / "run"
    state = init_train_state(jax.random.key(0), cfg)
    ckpt = CheckpointManager(str(run_dir), cfg)
    ckpt.save(state, metric=1.0)
    ckpt.wait()

    common = ["--dataset_root", str(tmp_path / "data"), "--save_path",
              str(run_dir), "--dataset_path", "LibriSpeech", "--ext_audio",
              ".wav", "--subsets", "test-clean"]
    extract(common + ["--output_folder", "tok1", "--batch_size", "1"])
    extract(common + ["--output_folder", "tok3", "--batch_size", "3"])
    a = sorted((run_dir / "tok1").rglob("*.npy"))
    b = sorted((run_dir / "tok3").rglob("*.npy"))
    assert len(a) == len(b) == 5
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.load(fa), np.load(fb))


def test_ragged_int16_input_matches_float():
    """int16 PCM shipped to device == host-converted float32, bit for bit."""
    cfg = tiny_config()
    params = C.init_codec(jax.random.key(3), cfg)
    rng = np.random.RandomState(3)
    pcm = rng.randint(-32768, 32767, (2, 500)).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    tok = make_ragged_tokenizer(cfg)
    lens = jnp.asarray([500, 300], jnp.int32)
    a = np.asarray(tok(params, jnp.asarray(pcm), lens))
    b = np.asarray(tok(params, jnp.asarray(f32), lens))
    np.testing.assert_array_equal(a, b)


def test_ragged_codec_roundtrip_matches_per_file():
    """Batched full-length reconstruction == per-file forward (tokens exact,
    waveforms to fp32 rounding)."""
    from audiotokenization_tpu.utils.ragged import make_ragged_codec

    cfg = tiny_config()
    params = C.init_codec(jax.random.key(4), cfg)
    rng = np.random.RandomState(4)
    lengths = [730, 400, 1000]
    wavs = [(rng.randn(T) * 0.1).astype(np.float32) for T in lengths]
    L = 1000
    batch = np.zeros((3, L), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    codec = make_ragged_codec(cfg)
    recon, codes = codec(params, jnp.asarray(batch),
                         jnp.asarray(lengths, jnp.int32))
    recon, codes = np.asarray(recon), np.asarray(codes)
    for i, w in enumerate(wavs):
        out = C.forward(params, cfg, {"wav": jnp.asarray(w)[None]})
        np.testing.assert_array_equal(codes[:, i, :len(w) // 10],
                                      np.asarray(out.vq_code)[:, 0])
        np.testing.assert_allclose(recon[i, :len(w)],
                                   np.asarray(out.gen_wav)[0, 0],
                                   rtol=1e-5, atol=1e-6)


def test_ragged_codec_causal_config():
    from audiotokenization_tpu.utils.ragged import make_ragged_codec

    cfg = tiny_config()
    cfg.model.codec_encoder.causal = True
    cfg.model.codec_decoder.causal = True
    params = C.init_codec(jax.random.key(5), cfg)
    rng = np.random.RandomState(5)
    w = (rng.randn(500) * 0.1).astype(np.float32)
    batch = np.zeros((2, 600), np.float32)
    batch[0, :500] = w
    codec = make_ragged_codec(cfg)
    recon, codes = codec(params, jnp.asarray(batch),
                         jnp.asarray([500, 0], jnp.int32))
    out = C.forward(params, cfg, {"wav": jnp.asarray(w)[None]})
    np.testing.assert_array_equal(np.asarray(codes)[:, 0, :50],
                                  np.asarray(out.vq_code)[:, 0])
    np.testing.assert_allclose(np.asarray(recon)[0, :500],
                               np.asarray(out.gen_wav)[0, 0],
                               rtol=1e-5, atol=1e-6)


def test_ragged_antialias_config_matches_per_file():
    """Antialias (cfgs/config11) configs are exact under ragged batching:
    the replicate-tail masked AA (utils/ragged._MaskedAA) reproduces the
    per-file Activation1d replicate-edge padding inside the padded batch."""
    from audiotokenization_tpu.utils.ragged import (make_ragged_codec,
                                                    make_ragged_tokenizer)

    cfg = tiny_config()
    cfg.model.codec_encoder.antialias = True
    cfg.model.codec_decoder.antialias = True
    params = C.init_codec(jax.random.key(6), cfg)
    rng = np.random.RandomState(6)
    lengths = [730, 400, 1000, 90]
    wavs = [(rng.randn(T) * 0.1).astype(np.float32) for T in lengths]
    batch = np.zeros((4, 1000), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    lens = jnp.asarray(lengths, jnp.int32)

    tok = make_ragged_tokenizer(cfg)
    codes_t = np.asarray(tok(params, jnp.asarray(batch), lens))
    codec = make_ragged_codec(cfg)
    recon, codes = codec(params, jnp.asarray(batch), lens)
    recon, codes = np.asarray(recon), np.asarray(codes)
    for i, w in enumerate(wavs):
        single = np.asarray(C.tokenize(params, cfg, jnp.asarray(w)[None]))[:, 0]
        np.testing.assert_array_equal(codes_t[:, i, :len(w) // 10], single)
        out = C.forward(params, cfg, {"wav": jnp.asarray(w)[None]})
        np.testing.assert_array_equal(codes[:, i, :len(w) // 10],
                                      np.asarray(out.vq_code)[:, 0])
        np.testing.assert_allclose(recon[i, :len(w)],
                                   np.asarray(out.gen_wav)[0, 0],
                                   rtol=1e-5, atol=1e-6)


def test_ragged_codec_concat_semantic_matches_per_file():
    """concat_semantic (cfgs/config2) full-length path: per-file teacher
    targets computed via the masked teacher (train/loop._make_test_teacher)
    + the masked bottleneck (utils/ragged._semantic_vq_in_masked) reproduce
    the per-file codec.forward inside a longer zero-padded batch — the
    VERDICT r2 missing-#4 closure."""
    from audiotokenization_tpu.models.w2v_bert import (W2vBertConfig,
                                                       init_w2v_bert)
    from audiotokenization_tpu.ops.fbank import w2v_bert_features_from_clip
    from audiotokenization_tpu.train.loop import _make_test_teacher
    from audiotokenization_tpu.utils.ragged import make_ragged_codec

    cfg = tiny_config()
    cfg.train.use_semantic = True
    cfg.train.concat_semantic = True
    cfg.train.teacher_layers = 1
    cfg.train.teacher_heads = 4
    cfg.train.teacher_intermediate = 64
    cfg.train.teacher_layer = 1
    teacher = init_w2v_bert(
        jax.random.key(9),
        W2vBertConfig(num_hidden_layers=1, num_attention_heads=4,
                      intermediate_size=64))
    params = {**C.init_codec(jax.random.key(10), cfg), "w2v_bert": teacher}
    rng = np.random.RandomState(10)
    lengths = [700, 400, 1000]
    wavs = [(rng.randn(T) * 0.1).astype(np.float32) for T in lengths]
    L = 1000
    batch = np.zeros((3, L), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    teacher_fwd = _make_test_teacher(cfg)
    hop = 10
    sem_rows = [np.asarray(teacher_fwd(teacher, w, L, hop)) for w in wavs]
    sem_t = jnp.asarray(np.concatenate(sem_rows, axis=0))
    codec = make_ragged_codec(cfg)
    recon, codes = codec(params, jnp.asarray(batch),
                         jnp.asarray(lengths, jnp.int32), sem_t)
    recon, codes = np.asarray(recon), np.asarray(codes)
    for i, w in enumerate(wavs):
        feats = w2v_bert_features_from_clip(w)
        out = C.forward(params, cfg,
                        {"wav": jnp.asarray(w)[None],
                         "feats": jnp.asarray(feats)[None]})
        ref_codes = np.asarray(out.vq_code)[:, 0]
        got = codes[:, i, :len(w) // hop]
        # teacher attention reduces over the (shape-dependent) frame axis, so
        # the padded+masked teacher equals the per-file teacher to fp32
        # rounding; allow the rare near-tie token flip that rounding can cause
        match = np.mean(got == ref_codes)
        assert match >= 0.99, f"file {i}: token match {match}"
        np.testing.assert_allclose(recon[i, :len(w)],
                                   np.asarray(out.gen_wav)[0, 0],
                                   rtol=1e-4, atol=1e-4)


def test_ragged_bidirectional_rnn_exact():
    """r5 (VERDICT r4 stretch #10): bidirectional-RNN bigcodec configs are
    exact under ragged batching — the per-sample (B, T) valid mask makes
    each sample's REVERSED LSTM scan start at its own last valid frame with
    the zero init state (ops/lstm._lstm_layer valid=...), so the backward
    pass never reads the zero tail."""
    from audiotokenization_tpu.utils.ragged import make_ragged_codec

    cfg = tiny_config()
    cfg.model.codec_encoder.rnn_bidirectional = True
    cfg.model.codec_decoder.rnn_bidirectional = True
    params = C.init_codec(jax.random.key(7), cfg)
    rng = np.random.RandomState(7)
    lengths = [730, 400, 1000, 90]
    wavs = [(rng.randn(T) * 0.1).astype(np.float32) for T in lengths]
    L = 1000
    batch = np.zeros((4, L), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w
    # tokens byte-exact
    tok = make_ragged_tokenizer(cfg)
    codes = np.asarray(tok(params, jnp.asarray(batch),
                           jnp.asarray(lengths, jnp.int32)))
    for i, w in enumerate(wavs):
        single = np.asarray(C.tokenize(params, cfg, jnp.asarray(w)[None]))[:, 0]
        np.testing.assert_array_equal(codes[:, i, :len(w) // 10], single)
    # full round trip (decoder-side bidir LSTM) to fp32 rounding
    codec = make_ragged_codec(cfg)
    recon, codes2 = codec(params, jnp.asarray(batch),
                          jnp.asarray(lengths, jnp.int32))
    recon = np.asarray(recon)
    np.testing.assert_array_equal(np.asarray(codes2), codes)
    for i, w in enumerate(wavs):
        out = C.forward(params, cfg, {"wav": jnp.asarray(w)[None]},
                        training=False)
        single = np.asarray(out.gen_wav)[0, 0]
        np.testing.assert_allclose(recon[i, :len(w)], single,
                                   atol=2e-5, rtol=1e-4)
