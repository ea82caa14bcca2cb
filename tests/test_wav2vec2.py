"""Golden parity: native JAX wav2vec2-family encoder vs transformers
(random init, no download) for all three remaining s3prl SSL upstreams of
the reference's speaker-verification suite
(speaker_verification/models/ecapa_tdnn.py:258-273): wav2vec 2.0, HuBERT,
UniSpeech-SAT. Both checkpoint layouts are covered for wav2vec2 (group/
post-LN base, layer/stable-pre-LN large); HuBERT and UniSpeech-SAT reuse
the same encoder so one layout each suffices.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from audiotokenization_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                                   convert_wav2vec2,
                                                   make_ssl_fn,
                                                   wav2vec2_apply)

_SMALL = dict(
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=128, conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
_NO_DROP = dict(output_hidden_states=True, layerdrop=0.0, hidden_dropout=0.0,
                attention_dropout=0.0, feat_proj_dropout=0.0,
                activation_dropout=0.0)


def _mk(family: str, norm: str):
    if family == "wav2vec2":
        from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model as HFModel
    elif family == "hubert":
        from transformers import HubertConfig as HFConfig, HubertModel as HFModel
    elif family == "unispeech_sat":
        from transformers import (UniSpeechSatConfig as HFConfig,
                                  UniSpeechSatModel as HFModel)
    else:  # pragma: no cover
        raise ValueError(family)

    torch.manual_seed(0)
    shape = dict(_SMALL, feat_extract_norm=norm, conv_bias=(norm == "layer"),
                 do_stable_layer_norm=(norm == "layer"))
    model = HFModel(HFConfig(**shape, **_NO_DROP)).eval()
    jcfg = Wav2Vec2Config(**shape)
    return model, jcfg


@pytest.mark.parametrize("family,norm", [
    ("wav2vec2", "group"), ("wav2vec2", "layer"),
    ("hubert", "group"), ("unispeech_sat", "layer"),
])
def test_wav2vec2_family_hidden_state_parity(family, norm):
    model, jcfg = _mk(family, norm)
    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 2000) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(wav))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wav2vec2(sd, jcfg)
    hiddens = wav2vec2_apply(params, jcfg, jnp.asarray(wav))
    assert len(hiddens) == len(out.hidden_states) == 4
    for i, (ours, ref) in enumerate(zip(hiddens, out.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=2e-3, atol=3e-4,
            err_msg=f"hidden {i} ({family}/{norm})")


def test_wav2vec2_output_layer_selects_hidden():
    model, jcfg = _mk("wav2vec2", "group")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wav2vec2(sd, jcfg)
    rng = np.random.RandomState(2)
    wav = jnp.asarray((rng.randn(1, 2000) * 0.1).astype(np.float32))
    hiddens = wav2vec2_apply(params, jcfg, wav)
    one = wav2vec2_apply(params, jcfg, wav, output_layer=2)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(hiddens[2]))


def test_wav2vec2_as_ecapa_ssl_frontend():
    """The SV suite's layer-weighted SSL frontend consumes the hidden
    states end to end (speaker_verification/models/ecapa_tdnn.py:258-273)."""
    from audiotokenization_tpu.models.ecapa_tdnn import ssl_weighted_features

    model, jcfg = _mk("hubert", "group")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_wav2vec2(sd, jcfg)
    ssl_fn = make_ssl_fn(params, jcfg)
    rng = np.random.RandomState(1)
    wav = jnp.asarray((rng.randn(2, 2000) * 0.1).astype(np.float32))
    weight = jnp.zeros((jcfg.num_hidden_layers + 1,))
    feats = ssl_weighted_features(ssl_fn(wav), weight)
    assert feats.shape[0] == 2 and feats.shape[1] == jcfg.hidden_size
    assert np.isfinite(np.asarray(feats)).all()


def test_infer_config_from_sd_roundtrip():
    """Config inference from weight shapes recovers the tiny model's
    derivable fields (strides/heads are the documented overrides)."""
    from audiotokenization_tpu.models.wav2vec2 import infer_config_from_sd

    model, jcfg = _mk("unispeech_sat", "layer")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = infer_config_from_sd(sd, "unispeech_sat",
                               num_attention_heads=4, conv_stride=(5, 2, 2))
    for f in ("hidden_size", "num_hidden_layers", "num_attention_heads",
              "intermediate_size", "conv_dim", "conv_kernel", "conv_stride",
              "feat_extract_norm", "conv_bias", "do_stable_layer_norm",
              "num_conv_pos_embeddings", "num_conv_pos_embedding_groups"):
        assert getattr(cfg, f) == getattr(jcfg, f), f


def test_verification_cli_ssl_frontend(tmp_path, capsys):
    """cli.verification --feat_type ssl drives a native upstream end to end
    (reference speaker_verification/verification.py + the s3prl frontend)."""
    import json

    from audiotokenization_tpu.cli.verification import main as ver_main
    from audiotokenization_tpu.data.audio_io import write_wav

    model, _ = _mk("hubert", "group")
    ckpt = tmp_path / "hubert_tiny.pt"
    torch.save(model.state_dict(), str(ckpt))
    rng = np.random.RandomState(3)
    wavs = []
    for i in range(2):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, (rng.randn(3200) * 0.1).astype(np.float32), 16000)
        wavs.append(str(p))
    ver_main(["--wav1", wavs[0], "--wav2", wavs[1], "--smoke",
              "--feat_type", "ssl", "--ssl_family", "hubert",
              "--ssl_checkpoint", str(ckpt), "--ssl_heads", "4",
              "--ssl_strides", "5,2,2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert -1.0 <= out["similarity"] <= 1.0
