"""Tensor-parallel conformer tests (virtual 8-device CPU mesh).

Beyond-reference capability (the reference has no TP, SURVEY §2.8): Megatron
placement of conformer attention/FFN weights over a ('data','model') mesh
(parallel/tp.py) must reproduce single-device numerics — token-exact
tokenize, and training steps matching pure DP to fp32-reduction tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiotokenization_tpu.config import Config
from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.parallel.mesh import make_data_mesh, shard_batch
from audiotokenization_tpu.parallel.tp import (
    jit_tp_tokenize, make_dp_tp_mesh, tp_state_shardings, validate_tp)
from audiotokenization_tpu.train.state import init_train_state
from audiotokenization_tpu.train.step import jit_train_step

from test_conformer_train import conformer_tiny_config


def tp_tiny_config() -> Config:
    cfg = conformer_tiny_config()
    # 4-way model axis needs n_head % 4 == 0 (head-sharded attention)
    cfg.model.codec_encoder.n_head = 4
    cfg.model.codec_decoder.n_head = 4
    return cfg


def test_tp_tokenize_token_exact():
    cfg = tp_tiny_config()
    params = C.init_codec(jax.random.key(0), cfg)
    wav = jnp.asarray(
        (np.random.RandomState(0).randn(4, 800) * 0.1).astype(np.float32))
    ref = np.asarray(jax.jit(
        lambda p, w: C.tokenize(p, cfg, w, mode="conformant"))(params, wav))

    mesh = make_dp_tp_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    got = np.asarray(jit_tp_tokenize(cfg, mesh)(params, wav))
    assert np.array_equal(ref, got)


def test_tp_train_step_matches_dp():
    cfg = tp_tiny_config()
    rng = np.random.RandomState(1)
    batch = {"wav": jnp.asarray((rng.randn(8, 800) * 0.1).astype(np.float32))}
    state0 = init_train_state(jax.random.key(0), cfg)

    mesh_dp = make_data_mesh()
    s_dp, m_dp = jit_train_step(cfg, mesh_dp)(
        state0, shard_batch(mesh_dp, batch))

    mesh_tp = make_dp_tp_mesh(4)
    step_tp = jit_train_step(cfg, mesh_tp)
    s_tp, m_tp = step_tp(state0, shard_batch(mesh_tp, batch))

    for k in ("gen_loss", "disc_loss", "mel_loss", "vq_loss"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_tp[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    flat_dp = jax.tree.leaves(s_dp.gen_params)
    flat_tp = jax.tree.leaves(s_tp.gen_params)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tp_shardings_place_megatron_axes():
    cfg = tp_tiny_config()
    mesh = make_dp_tp_mesh(4)
    sh = tp_state_shardings(mesh, cfg)
    enc = sh.gen_params["encoder"]["backbone"]["layers"][0]
    assert "model" in str(enc["ffn1"]["w1"]["w"].spec)
    assert str(enc["ffn1"]["w2"]["w"].spec) == "PartitionSpec(None, 'model')"
    # qkv stays replicated at rest: a head-block-permuted VIEW is sharded at
    # trace time instead (tp_qkv_heads), so [q|k|v] packed rows never force a
    # per-layer reshard of the head-sharded activations
    assert "model" not in str(enc["attn"]["qkv"]["w"].spec)
    assert str(enc["attn"]["out"]["w"].spec) == "PartitionSpec(None, 'model')"
    # optimizer moments mirror the param placements (path-suffix rule)
    mus = [l for path, l in jax.tree_util.tree_leaves_with_path(
        sh.gen_opt_state) if "model" in str(getattr(l, "spec", ""))]
    assert mus, "no optimizer-state leaf got a TP sharding"
    # quantizer + norms stay replicated
    assert all("model" not in str(l.spec)
               for l in jax.tree.leaves(sh.gen_params["quantizer"]))


def test_tp_train_step_params_actually_sharded():
    cfg = tp_tiny_config()
    mesh = make_dp_tp_mesh(4)
    state = init_train_state(jax.random.key(0), cfg)
    batch = shard_batch(mesh, {
        "wav": jnp.asarray((np.random.RandomState(2).randn(8, 800) * 0.1)
                           .astype(np.float32))})
    state1, metrics = jit_train_step(cfg, mesh)(state, batch)
    assert np.isfinite(float(metrics["gen_loss"]))
    w1 = state1.gen_params["encoder"]["backbone"]["layers"][0]["ffn1"]["w1"]["w"]
    assert "model" in str(w1.sharding.spec)


def test_tp_fsdp_compose():
    cfg = tp_tiny_config()
    mesh = make_dp_tp_mesh(4)
    sh = tp_state_shardings(mesh, cfg, fsdp=True, fsdp_min_size=64)
    # a non-TP leaf big enough for FSDP shards over 'data'
    specs = [str(l.spec) for path, l in jax.tree_util.tree_leaves_with_path(
        sh.gen_params)]
    assert any(s == "PartitionSpec('data',)" or "'data'" in s for s in specs)
    state = init_train_state(jax.random.key(0), cfg)
    batch = shard_batch(mesh, {
        "wav": jnp.asarray((np.random.RandomState(3).randn(8, 800) * 0.1)
                           .astype(np.float32))})
    state1, metrics = jit_train_step(cfg, mesh, fsdp=True,
                                     fsdp_min_size=64)(state, batch)
    assert np.isfinite(float(metrics["gen_loss"]))


def test_tp_train_loop_end_to_end(tmp_path):
    """train.tensor_parallel through the stock loop: fit builds the
    ('data','model') mesh, steps, validates (GSPMD-propagated eval), logs."""
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

    cfg = tp_tiny_config()
    cfg.train.tensor_parallel = 4
    cfg.dataset.train.filelist = str(fl)
    cfg.dataset.train.min_audio_length = 800
    cfg.dataset.train.batch_size = 2
    cfg.train.val_every_n_steps = 2
    cfg.train.num_sanity_val_steps = 1
    cfg.train.log_every_n_steps = 1
    ds = AudioDataset(cfg.dataset.train, sample_rate=16000,
                      pad_to_multiple_of=40, train=True)
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    state = train(cfg, train_loader=loader, val_loader=loader,
                  run_dir=str(tmp_path / "run"), max_steps=2)
    assert int(state.step) == 2
    w1 = state.gen_params["encoder"]["backbone"]["layers"][0]["ffn1"]["w1"]["w"]
    assert "model" in str(w1.sharding.spec)
    # resume over the same mesh: the Orbax restore must come back with the
    # TP shardings the jitted step expects (loop device_puts before restore)
    state2 = train(cfg, train_loader=loader, val_loader=loader,
                   run_dir=str(tmp_path / "run"), max_steps=3)
    assert int(state2.step) == 3


def test_extract_cli_tensor_parallel_token_identical(tmp_path):
    """extract_indices --tensor_parallel (whole-mesh model axis, folded
    weight-norm inference params) writes byte-identical .npy tokens."""
    from audiotokenization_tpu.data.audio_io import write_wav
    from audiotokenization_tpu.train.checkpoint import CheckpointManager
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.cli.extract_indices import main as extract_main

    cfg = tp_tiny_config()
    cfg.model.codec_encoder.n_head = 8  # whole-mesh model axis = 8 devices
    cfg.model.codec_decoder.n_head = 8
    run_dir = tmp_path / "run"
    ckpt = CheckpointManager(str(run_dir), cfg)
    ckpt.save(init_train_state(jax.random.key(0), cfg))
    ckpt.wait()

    rng = np.random.RandomState(0)
    d = tmp_path / "data" / "LS" / "test-clean" / "7" / "70"
    d.mkdir(parents=True)
    for i in range(2):
        write_wav(d / f"7-70-{i:04d}.wav",
                  (rng.randn(800 + 40 * i) * 0.1).astype(np.float32), 16000)

    def run(out, extra):
        extract_main(["--dataset_root", str(tmp_path / "data"),
                      "--save_path", str(run_dir), "--dataset_path", "LS",
                      "--ext_audio", ".wav", "--subsets", "test-clean",
                      "--output_folder", out] + extra)
        return {p.name: np.load(p) for p in
                sorted((run_dir / out).rglob("*.npy"))}

    ref = run("plain", [])
    got = run("tp", ["--tensor_parallel"])
    assert ref.keys() == got.keys() and len(ref) == 2
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k])
    # an explicit degree SMALLER than the attached device count must also
    # work: the mesh spans exactly N devices so the B=1 batch never has to
    # shard over a >1 data axis (round-4 review fix)
    got4 = run("tp4", ["--tensor_parallel", "4"])
    for k in ref:
        np.testing.assert_array_equal(ref[k], got4[k])


def test_tp_validation_rejects_bad_configs():
    mesh_n = 4
    cfg = Config()  # bigcodec family: no TP target
    with pytest.raises(ValueError, match="conformer"):
        validate_tp(cfg, mesh_n)
    cfg2 = tp_tiny_config()
    cfg2.model.codec_encoder.n_head = 2  # indivisible heads
    with pytest.raises(ValueError, match="n_head"):
        validate_tp(cfg2, mesh_n)
