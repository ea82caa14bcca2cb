"""Extract CLI with an FSQ-quantizer codec: indices contract holds."""
import numpy as np
import jax

from audiotokenization_tpu.data.audio_io import write_wav
from audiotokenization_tpu.models import codec as C
from audiotokenization_tpu.train.checkpoint import CheckpointManager
from audiotokenization_tpu.train.state import TrainState

from test_train_step import tiny_config


def test_extract_cli_fsq_codec(tmp_path):
    cfg = tiny_config()
    d = cfg.model.codec_decoder
    d.fsq = True
    d.fsq_levels = (4, 4, 4)
    d.codebook_size = 64
    params = C.init_codec(jax.random.key(0), cfg)
    # write a framework-layout run dir with just gen params
    mngr = CheckpointManager(tmp_path / "run", cfg)
    state = TrainState(step=jax.numpy.asarray(1), gen_params=params,
                       disc_params={}, gen_opt_state=(), disc_opt_state=())
    mngr.save(state)
    mngr.wait()

    root = tmp_path / "data" / "LibriSpeech" / "test-clean" / "1" / "2"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    write_wav(root / "1-2-0000.wav", (rng.randn(1500) * 0.1).astype(np.float32), 16000)

    from audiotokenization_tpu.cli.extract_indices import main

    main(["--dataset_root", str(tmp_path / "data"), "--save_path", str(tmp_path / "run"),
          "--dataset_path", "LibriSpeech", "--ext_audio", ".wav",
          "--subsets", "test-clean"])
    out = np.load(tmp_path / "run" / "extracted_indices" / "test-clean" / "1" / "2" / "1-2-0000.npy")
    assert out.dtype == np.int16
    assert out.shape == (150,)  # 1500 samples / hop 10
    assert (out >= 0).all() and (out < 64).all()
