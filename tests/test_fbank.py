"""Golden parity: native SeamlessM4T fbank frontend vs HF AutoFeatureExtractor.

The reference runs SeamlessM4TFeatureExtractor on the ±160-padded cropped wav
in the dataloader (BigCodec_SSL/data_module.py:124-132); these tests assert
the native numpy frontend reproduces it and the batched JAX variant matches
the numpy one.
"""
import numpy as np
import pytest

from audiotokenization_tpu.ops import fbank as F

# fast core tier: `pytest -m quick` (~4 min on this 2-core host)
pytestmark = pytest.mark.quick


def _hf_extractor():
    from transformers.models.seamless_m4t.feature_extraction_seamless_m4t import (
        SeamlessM4TFeatureExtractor,
    )

    # default kwargs == facebook/w2v-bert-2.0's preprocessor_config
    return SeamlessM4TFeatureExtractor()


@pytest.mark.parametrize("n", [16320, 16000, 12345, 399, 800])
def test_w2v_bert_features_match_hf(n):
    fe = _hf_extractor()
    rng = np.random.RandomState(7 + n)
    wav = (rng.randn(n) * 0.1).astype(np.float32)
    if n < 400:
        assert F.w2v_bert_features(wav).shape == (0, 160)
        return
    got = F.w2v_bert_features(wav)
    want = fe(wav, sampling_rate=16000, return_tensors="np")["input_features"][0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_clip_pad_matches_reference_shape():
    # 1 s crop: reference pads ±160 -> 16320 samples -> 100 fbank frames ->
    # 50 stacked features, matching the hop-320 semantic encoder's 50 latents
    wav = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.05
    feats = F.w2v_bert_features_from_clip(wav)
    assert feats.shape == (50, 160)
    fe = _hf_extractor()
    want = fe(np.pad(wav, (160, 160)), sampling_rate=16000,
              return_tensors="np")["input_features"][0]
    np.testing.assert_allclose(feats, want, rtol=1e-4, atol=1e-4)


def test_jax_variant_matches_numpy():
    rng = np.random.RandomState(3)
    wav = (rng.randn(4, 16000) * 0.1).astype(np.float32)
    got = np.asarray(F.w2v_bert_features_jax(wav))
    want = np.stack([F.w2v_bert_features_from_clip(w) for w in wav])
    assert got.shape == want.shape
    # fp32 FFT vs float64: bounded well below the teacher's input scale
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_odd_frame_count_pads_to_stride():
    # 16000+2*160 gives even frames; pick a length producing odd frames:
    # nf = 1 + (T-400)//160 odd  ->  T = 400 + 160*(nf-1)
    wav = np.zeros(400 + 160 * 2, np.float32)  # nf = 3 -> padded to 4 -> 2 rows
    wav[::7] = 0.1
    feats = F.w2v_bert_features(wav)
    assert feats.shape == (2, 160)
    fe = _hf_extractor()
    want = fe(wav, sampling_rate=16000, return_tensors="np")["input_features"][0]
    np.testing.assert_allclose(feats, want, rtol=1e-4, atol=1e-4)
