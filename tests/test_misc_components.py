"""Tests: ECAPA-TDNN speaker model, token merging, resampler, schedules."""
import numpy as np
import jax
import jax.numpy as jnp

from audiotokenization_tpu.models.ecapa_tdnn import (ecapa_tdnn_embed,
                                                     init_ecapa_tdnn,
                                                     log_mel_fbank,
                                                     speaker_similarity)
from audiotokenization_tpu.ops.resample import resample
from audiotokenization_tpu.train.schedule import warmup_lr_schedule
from audiotokenization_tpu.utils.tome import adjacent_chained_merge, unmerge


def test_mfcc_matches_torchaudio_formula():
    """MFCC == DCT-II(ortho) of the power-dB HTK mel spectrogram, i.e. the
    torchaudio MFCC(log_mels=False) construction the reference uses
    (speaker_verification/models/ecapa_tdnn.py:183-193), built here
    independently with numpy + scipy on our (golden-tested) STFT."""
    from audiotokenization_tpu.models.ecapa_tdnn import mfcc
    from audiotokenization_tpu.ops.stft import stft
    import scipy.fft as sf

    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(2, 4000) * 0.1).astype(np.float32))
    s = np.asarray(stft(wav, n_fft=512, hop_length=160, win_length=400,
                        center=True, pad_mode="reflect"))
    power = np.abs(s) ** 2
    # independent HTK filterbank (torchaudio mel_scale='htk', norm=None)
    n_mels, sr = 128, 16000
    freqs = np.linspace(0, sr / 2, 257)
    mels = np.linspace(0, 2595 * np.log10(1 + (sr / 2) / 700), n_mels + 2)
    pts = 700 * (10 ** (mels / 2595) - 1)
    fbk = np.zeros((n_mels, 257))
    for m in range(n_mels):
        lo, ce, hi = pts[m], pts[m + 1], pts[m + 2]
        fbk[m] = np.clip(np.minimum((freqs - lo) / (ce - lo),
                                    (hi - freqs) / (hi - ce)), 0, None)
    mel = np.einsum("mf,bft->bmt", fbk, power)
    db = 10 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max(axis=(-2, -1), keepdims=True) - 80.0)
    ref = sf.dct(db, type=2, norm="ortho", axis=1)[:, :40] + 1e-6
    got = np.asarray(mfcc(wav, n_mfcc=40))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_ssl_weighted_features_and_embed():
    """SSL frontend: softmax layer weighting (raw features; the instance
    norm is applied inside ecapa_tdnn_embed, matching get_feat :270)."""
    from audiotokenization_tpu.models.ecapa_tdnn import (extract_features,
                                                         ssl_weighted_features)

    rng = np.random.RandomState(1)
    hs = [jnp.asarray(rng.randn(2, 12, 16).astype(np.float32)) for _ in range(3)]
    # equal logits == plain mean over layers
    eq = np.asarray(ssl_weighted_features(hs, jnp.zeros((3,))))
    man = np.mean([np.asarray(h) for h in hs], axis=0).swapaxes(1, 2) + 1e-6
    np.testing.assert_allclose(eq, man, rtol=1e-5, atol=1e-6)
    # extreme logit selects one layer
    one = np.asarray(ssl_weighted_features(hs, jnp.asarray([50.0, 0.0, 0.0])))
    h0 = np.asarray(hs[0]).swapaxes(1, 2) + 1e-6
    np.testing.assert_allclose(one, h0, rtol=1e-4, atol=1e-4)
    # end-to-end through the ECAPA stem (n_mels == SSL dim)
    params = init_ecapa_tdnn(jax.random.key(0), n_mels=16, channels=32,
                             emb_dim=8)
    feats = extract_features(jnp.zeros((2, 1600)), feat_type="ssl",
                             ssl_fn=lambda w: hs,
                             feature_weight=jnp.zeros((3,)))
    emb = ecapa_tdnn_embed(params, feats)
    assert emb.shape == (2, 8) and np.all(np.isfinite(np.asarray(emb)))


def test_ecapa_embedding_shapes():
    params = init_ecapa_tdnn(jax.random.key(0), channels=64, emb_dim=32)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32))
    feats = log_mel_fbank(wav)
    assert feats.shape[1] == 80
    emb = ecapa_tdnn_embed(params, feats)
    assert emb.shape == (2, 32)
    sim = speaker_similarity(params, wav, wav)
    np.testing.assert_allclose(np.asarray(sim), 1.0, atol=1e-4)


def test_tome_merge_unmerge():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    merged, info = adjacent_chained_merge(x, r=3)
    assert merged.shape == (2, 7, 4)
    assert (np.asarray(info.n_groups) <= 7).all()
    rec = unmerge(merged, info)
    assert rec.shape == x.shape
    # tokens in the same group share the pooled value
    g = np.asarray(info.group_of)
    m = np.asarray(merged)
    r = np.asarray(rec)
    for b in range(2):
        for t in range(10):
            np.testing.assert_allclose(r[b, t], m[b, g[b, t]], rtol=1e-6)


def test_tome_chaining_merges_identical_runs():
    # three identical adjacent tokens -> links inside the run are most similar
    x = np.random.RandomState(1).randn(1, 6, 8).astype(np.float32)
    x[0, 2] = x[0, 1]
    x[0, 3] = x[0, 1]
    merged, info = adjacent_chained_merge(jnp.asarray(x), r=2)
    g = np.asarray(info.group_of)[0]
    assert g[1] == g[2] == g[3]
    assert int(np.asarray(info.n_groups)[0]) == 4


def test_resampler_preserves_tone_frequency():
    fs_in, fs_out = 16000, 10000
    t = np.arange(fs_in) / fs_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = np.asarray(resample(jnp.asarray(tone), fs_in, fs_out))
    assert len(out) == 10000
    spec = np.abs(np.fft.rfft(out[1000:9000] * np.hanning(8000)))
    freq = np.fft.rfftfreq(8000, 1 / fs_out)
    assert abs(freq[np.argmax(spec)] - 440) < 3
    # identity when rates match
    same = np.asarray(resample(jnp.asarray(tone), fs_in, fs_in))
    np.testing.assert_array_equal(same, tone)


def test_warmup_lr_schedule_matches_reference_formula():
    sched = warmup_lr_schedule(warmup_step=1000, down_step=500000,
                               max_lr=1e-4, min_lr=1e-5)
    assert abs(float(sched(0)) - 1e-5) < 1e-9
    assert abs(float(sched(1000)) - 1e-4) < 1e-9
    # halfway through decay
    mid = float(sched(1000 + 250000))
    np.testing.assert_allclose(mid, (1e-4 + 1e-5) / 2, rtol=1e-3)
    assert abs(float(sched(600000)) - 1e-5) < 1e-9
    # quadratic warmup: value at half warmup is init + (max-init)/4
    q = float(sched(500))
    np.testing.assert_allclose(q, 1e-5 + (1e-4 - 1e-5) / 4, rtol=1e-3)


def test_tokenize_fast_mode():
    """fast (bf16-encoder) tokenize: same contract, near-identical tokens."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    e = cfg.model.codec_encoder
    e.ngf = 4
    e.out_channels = 32
    e.up_ratios = (2, 5)
    e.rnn_num_layers = 1
    d = cfg.model.codec_decoder
    d.in_channels = 32
    d.upsample_initial_channel = 16
    d.up_ratios = (5, 2)
    d.rnn_num_layers = 1
    d.codebook_size = 64
    d.codebook_dim = 8
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1600).astype(np.float32) * 0.1)
    ref = np.asarray(C.tokenize(params, cfg, wav))
    for mode in ("fast", "balanced", "high"):
        fast = np.asarray(C.tokenize(params, cfg, wav, mode=mode))
        assert fast.shape == ref.shape and fast.dtype == ref.dtype
        # bf16 conv stages on random weights: the overwhelming majority of
        # argmins agree (balanced keeps the LSTM/tail/VQ fp32 so it is
        # closer; 'high' = bf16_3x passes is closer still — on CPU both
        # precisions lower to fp32, so 'high' is exact there)
        assert (fast == ref).mean() > 0.9, (mode, (fast == ref).mean())


def test_cosine_decay_with_warmup_matches_reference_formula():
    import math

    import numpy as np

    from audiotokenization_tpu.train.schedule import cosine_decay_with_warmup_schedule

    total, warm, mx, mn = 1000, 100, 1e-3, 1e-7
    sched = cosine_decay_with_warmup_schedule(
        total_steps=total, warmup_steps=warm, max_lr=mx, min_lr=mn)

    def ref(step):
        if step < warm:
            return mx * step / warm
        cd = 0.5 * (1 + math.cos(math.pi * (step - warm) / (total - warm)))
        return mn + (mx - mn) * cd

    for s in (0, 1, 50, 99, 100, 101, 500, 999, 1000):
        np.testing.assert_allclose(float(sched(s)), ref(s), rtol=1e-5, atol=1e-10)
