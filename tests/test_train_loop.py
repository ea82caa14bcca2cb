"""Integration: dataset -> loader -> train loop -> checkpoint -> resume (tiny)."""
import numpy as np
import pytest
import jax

from audiotokenization_tpu.config import Config
from audiotokenization_tpu.data.audio_io import write_wav
from audiotokenization_tpu.data.dataset import AudioDataset, DataLoader
from audiotokenization_tpu.train.checkpoint import load_checkpoint_params
from audiotokenization_tpu.train.loop import run_validation, train

from test_train_step import tiny_config


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    files = []
    for i in range(8):
        p = tmp_path / f"clip{i}.wav"
        write_wav(p, (rng.randn(900 + 100 * i) * 0.1).astype(np.float32), 16000)
        files.append(str(p))
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(f"{p}\tspeaker{i}" for i, p in enumerate(files)))
    return tmp_path, fl


def _loaders(cfg, fl):
    cfg.dataset.train.filelist = str(fl)
    cfg.dataset.train.min_audio_length = 800
    cfg.dataset.train.batch_size = 2
    cfg.dataset.pad_to_multiple_of = 10
    ds = AudioDataset(cfg.dataset.train, sample_rate=16000, pad_to_multiple_of=10,
                      train=True)
    return DataLoader(ds, batch_size=2, shuffle=True, seed=0, num_workers=2)


def test_dataset_crop_pad_policy(corpus):
    tmp, fl = corpus
    cfg = tiny_config()
    loader = _loaders(cfg, fl)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["wav"].shape == (2, 800)  # exact crop of min_audio_length
    # eval mode: full length padded to multiple
    cfg.dataset.test.filelist = str(fl)
    cfg.dataset.test.min_audio_length = -1
    ds = AudioDataset(cfg.dataset.test, sample_rate=16000, pad_to_multiple_of=320)
    clip = ds.get(3)
    assert len(clip) % 320 == 0
    assert len(clip) >= 900 + 300


def test_train_loop_checkpoint_resume(corpus, tmp_path):
    tmp, fl = corpus
    cfg = tiny_config()
    cfg.train.log_every_n_steps = 2
    cfg.train.checkpoint_every_n_steps = 3
    loader = _loaders(cfg, fl)
    run_dir = tmp_path / "run"
    state = train(cfg, train_loader=loader, run_dir=str(run_dir),
                  use_mesh=False, max_steps=3)
    assert int(state.step) == 3
    # metrics.jsonl written
    assert (run_dir / "metrics.jsonl").exists()
    # restore for inference
    cfg2, gen_params = load_checkpoint_params(run_dir)
    assert cfg2.model.codec_decoder.codebook_size == 64
    leaves_a = jax.tree.leaves(state.gen_params)
    leaves_b = jax.tree.leaves(gen_params)
    np.testing.assert_allclose(np.asarray(leaves_a[0]), np.asarray(leaves_b[0]))
    # resume continues from step 3
    state2 = train(cfg, train_loader=loader, run_dir=str(run_dir),
                   use_mesh=False, max_steps=5)
    assert int(state2.step) == 5


def test_validation_metrics(corpus):
    tmp, fl = corpus
    cfg = tiny_config()
    loader = _loaders(cfg, fl)
    from audiotokenization_tpu.train.state import init_train_state

    state = init_train_state(jax.random.key(0), cfg)
    res = run_validation(cfg, state.gen_params, loader, compute_stoi=False,
                         max_batches=1)
    assert "val_si_snr" in res and "val_codebook_perplexity" in res
    assert np.isfinite(res["val_si_snr"])


def test_best_checkpoint_survives_rolling_window(tmp_path):
    """top-1-on-metric must survive max_to_keep newer saves (the reference's
    ModelCheckpoint keeps best + last, train.py:21-23)."""
    import jax
    import numpy as np
    from audiotokenization_tpu.train.checkpoint import (CheckpointManager,
                                                        load_checkpoint_params)
    from audiotokenization_tpu.train.state import init_train_state
    from test_train_step import tiny_config

    cfg = tiny_config()
    state = init_train_state(jax.random.key(0), cfg)
    mngr = CheckpointManager(str(tmp_path), cfg, max_to_keep=2)
    import jax.numpy as jnp
    best_alpha = None
    for step, metric in [(1, 5.0), (2, 1.0), (3, 7.0), (4, 8.0), (5, 9.0)]:
        # distinct params per step so the restored tree identifies the step
        gen = jax.tree.map(lambda t: t + float(step), state.gen_params)
        state = (state.replace(step=step, gen_params=gen)
                 if hasattr(state, "replace")
                 else state._replace(step=step, gen_params=gen))
        if step == 2:
            best_alpha = np.asarray(jax.tree.leaves(gen)[0]).copy()
        mngr.save(state, metric=metric)
    mngr.wait()
    # steps 1-3 rolled out of the main window; best (step 2) must restore
    cfg2, gen = load_checkpoint_params(tmp_path, best=True)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(gen)[0]),
                                  best_alpha)


def test_best_restore_falls_back_when_no_best_saved(tmp_path):
    """Metric-less saves never populate ckpt_best; best=True must fall back
    to the latest checkpoint instead of reading the empty directory."""
    import jax
    import numpy as np
    from audiotokenization_tpu.train.checkpoint import (CheckpointManager,
                                                        load_checkpoint_params)
    from audiotokenization_tpu.train.state import init_train_state
    from test_train_step import tiny_config

    cfg = tiny_config()
    state = init_train_state(jax.random.key(1), cfg)
    mngr = CheckpointManager(str(tmp_path), cfg)
    state = state._replace(step=1)
    mngr.save(state)  # no metric -> ckpt_best stays empty
    mngr.wait()
    assert (tmp_path / "ckpt_best").exists()  # eagerly created by orbax
    cfg2, gen = load_checkpoint_params(tmp_path, best=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(gen)[0]),
        np.asarray(jax.tree.leaves(state.gen_params)[0]))
