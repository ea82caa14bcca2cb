"""Semantic-variant (BigCodec_SSL branch) tokenization throughput on TPU.

BASELINE.json target row 4: "SSL-distilled semantic-token variant, batch 64
— tokenization parity for the BigCodec_SSL branch". Parity is covered by the
suite (semantic fc_prior/concat goldens, extract --semantic_dir exact-token
e2e); this measures the THROUGHPUT of the two serving shapes on the
flagship semantic config (configs/bigcodec_semantic.yaml = cfgs/config2
mirror, hop 320):

1. tokenize with PRECOMPUTED w2v-bert targets (cli/precompute_semantic.py
   corpus path) — encoder + semantic bottleneck + concat + fc_prior + VQ;
2. the frozen w2v-bert teacher forward itself (fbank feats -> layer-16
   hidden states), i.e. the extra device cost of the in-loop path. The
   combined in-loop rate is the harmonic combination of (1) and (2).

Timing follows bench.py: lax.map over K distinct batches, np.asarray fetch.
Usage: python scripts/bench_semantic.py [--batch 64]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import load_config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.models.w2v_bert import (W2vBertConfig,
                                                       init_w2v_bert,
                                                       w2v_bert_apply)
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = load_config("configs/bigcodec_semantic.yaml", [])
    B, SR, K = args.batch, cfg.dataset.sample_rate, 8
    hop = int(np.prod(cfg.model.codec_encoder.up_ratios))
    Tf = SR // hop
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))

    rng = np.random.RandomState(0)
    wavs = jnp.asarray(rng.randn(K, B, SR).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.randn(K, B, 1024, Tf).astype(np.float32) * 0.1)

    def timed(jf, *xs):
        np.asarray(jnp.ravel(jf(*xs))[:1])  # compile + warmup
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jf(*xs)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}

    # ---- 1. tokenize with precomputed targets (conformant fp32) ---------
    @jax.jit
    def tok_many(params, wavs, targets):
        return jax.lax.map(
            lambda wt: C.tokenize(params, cfg, wt[0], semantic_target=wt[1]),
            (wavs, targets))

    dt = timed(tok_many, params, wavs, targets)
    thr = K * B / dt
    results["semantic_tokenize_precomputed"] = round(thr, 1)
    print(f"semantic tokenize (precomputed targets, conformant, B={B}): "
          f"{thr:8.1f} audio-s/s/chip")

    # ---- 2. frozen teacher forward (the in-loop extra) -------------------
    tc = W2vBertConfig(num_hidden_layers=cfg.train.teacher_layers,
                       num_attention_heads=cfg.train.teacher_heads,
                       intermediate_size=cfg.train.teacher_intermediate)
    teacher = init_w2v_bert(jax.random.key(1), tc)
    nf = Tf  # 50 stacked feature frames per second == latent rate at hop 320
    feats = jnp.asarray(rng.randn(K, B, nf, 160).astype(np.float32) * 0.1)
    layer = cfg.train.teacher_layer

    def teacher_fwd(tp, f):
        h = w2v_bert_apply(tp, tc, f, output_layer=layer)
        return jnp.swapaxes(h, 1, 2)

    @jax.jit
    def teach_many(tp, feats):
        return jax.lax.map(lambda f: teacher_fwd(tp, f), feats)

    dt_t = timed(teach_many, teacher, feats)
    thr_t = K * B / dt_t
    results["w2v_bert_teacher_forward"] = round(thr_t, 1)
    print(f"w2v-bert teacher forward ({tc.num_hidden_layers} layers, B={B}): "
          f"{thr_t:8.1f} audio-s/s/chip")

    combined = 1.0 / (1.0 / thr + 1.0 / thr_t)
    results["semantic_tokenize_inloop_combined"] = round(combined, 1)
    print(f"in-loop semantic tokenize (teacher + codec, serial): "
          f"{combined:8.1f} audio-s/s/chip")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
