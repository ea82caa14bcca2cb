"""Golden parity: native ECAPA-TDNN vs the reference's actual torch module.

Imports speaker_verification/models/ecapa_tdnn.py with torchaudio/s3prl
stubs (the fbank path only touches torchaudio at __init__ time), randomizes
the BN running stats, and asserts embedding parity through
convert_ecapa_from_torch — the gate for loading UniSpeech SV checkpoints.
"""
import sys
import types
import importlib.machinery

import numpy as np
import pytest
import torch

REF_SV = "/root/reference/BigCodec_SSL/speaker_verification"


def _load_ref_ecapa():
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", loader=None)
        tr = types.ModuleType("torchaudio.transforms")
        tr.__spec__ = importlib.machinery.ModuleSpec("torchaudio.transforms",
                                                     loader=None)

        class _Dummy(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                raise RuntimeError("stub frontend")

        tr.MelSpectrogram = _Dummy
        tr.MFCC = _Dummy
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
    # models/utils.py needs fairseq+s3prl; the fbank path never touches it
    if "models.utils" not in sys.modules:
        mu = types.ModuleType("models.utils")
        mu.UpstreamExpert = object
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF_SV + "/models"]
        sys.modules.setdefault("models", pkg)
        sys.modules["models.utils"] = mu
    if REF_SV not in sys.path:
        sys.path.insert(0, REF_SV)
    from importlib import import_module

    return import_module("models.ecapa_tdnn")


@pytest.fixture(scope="module")
def pair():
    mod = _load_ref_ecapa()
    torch.manual_seed(0)
    model = mod.ECAPA_TDNN_SMALL(feat_dim=80, emb_dim=256,
                                 feat_type="fbank").eval()
    # randomize BN running stats so the converter mapping is actually probed
    with torch.no_grad():
        for name, m in model.named_modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    from audiotokenization_tpu.models.ecapa_tdnn import convert_ecapa_from_torch

    params = convert_ecapa_from_torch(model.state_dict())
    return model, params


def _torch_embed(model, feats):
    """The reference forward after get_feat (ecapa_tdnn.py:274-288)."""
    import torch.nn.functional as F

    x = model.instance_norm(feats)
    out1 = model.layer1(x)
    out2 = model.layer2(out1)
    out3 = model.layer3(out2)
    out4 = model.layer4(out3)
    out = torch.cat([out2, out3, out4], dim=1)
    out = F.relu(model.conv(out))
    out = model.bn(model.pooling(out))
    return model.linear(out)


def test_embedding_parity(pair):
    from audiotokenization_tpu.models.ecapa_tdnn import ecapa_tdnn_embed

    model, params = pair
    rng = np.random.RandomState(1)
    feats = rng.randn(3, 80, 120).astype(np.float32)
    with torch.no_grad():
        want = _torch_embed(model, torch.from_numpy(feats)).numpy()
    got = np.asarray(ecapa_tdnn_embed(params, feats))
    assert got.shape == want.shape == (3, 256)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cosine_similarity_parity(pair):
    from audiotokenization_tpu.models.ecapa_tdnn import ecapa_tdnn_embed

    model, params = pair
    rng = np.random.RandomState(2)
    fa = rng.randn(2, 80, 90).astype(np.float32)
    fb = rng.randn(2, 80, 90).astype(np.float32)
    with torch.no_grad():
        ta = _torch_embed(model, torch.from_numpy(fa))
        tb = _torch_embed(model, torch.from_numpy(fb))
        want = torch.nn.functional.cosine_similarity(ta, tb).numpy()
    import jax.numpy as jnp

    ea = ecapa_tdnn_embed(params, fa)
    eb = ecapa_tdnn_embed(params, fb)
    got = np.asarray(jnp.sum(
        ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
        * eb / jnp.linalg.norm(eb, axis=-1, keepdims=True), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

def test_global_context_att_parity():
    """global_context_att=True branch (ecapa_tdnn.py:146-149): torch.var is
    UNBIASED by default — the context_std concat must use ddof=1."""
    from audiotokenization_tpu.models.ecapa_tdnn import (
        convert_ecapa_from_torch, ecapa_tdnn_embed)

    mod = _load_ref_ecapa()
    torch.manual_seed(3)
    model = mod.ECAPA_TDNN(feat_dim=80, channels=256, emb_dim=192,
                           global_context_att=True).eval()
    with torch.no_grad():
        for name, m in model.named_modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    params = convert_ecapa_from_torch(model.state_dict())
    rng = np.random.RandomState(4)
    feats = rng.randn(2, 80, 100).astype(np.float32)
    with torch.no_grad():
        want = _torch_embed(model, torch.from_numpy(feats)).numpy()
    got = np.asarray(ecapa_tdnn_embed(params, feats, global_context_att=True))
    assert got.shape == want.shape == (2, 192)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
