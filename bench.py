"""Benchmark: tokenization throughput (audio-seconds/sec/chip) on the flagship codec.

Measures the BASELINE.json headline config — encoder+VQ tokenization,
batch 32 x 1 s 16 kHz clips on one chip — and reports one JSON line.
vs_baseline compares against 5x the reference PyTorch-CPU tokenization
throughput (the driver-defined target), measured once by
scripts/measure_reference_cpu.py and cached in bench_baseline.json.
"""
import json
import time
from pathlib import Path

import numpy as np


def main():
    import jax

    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C

    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))  # inference path folds WN

    # K distinct batches are tokenized inside ONE jitted call (lax.map) and the
    # timing ends with a tiny (4-byte) fetch, so the measurement reflects
    # sustained device throughput rather than host/tunnel transfer latency
    # (block_until_ready is unreliable on remote-attached chips).
    # This measures the CONFORMANT path: C.tokenize forces full-fp32 matmul
    # accumulation for bit-exact index parity with the reference.
    # K=16 distinct batches per timed call: the host->device fetch latency
    # (~40 ms on the tunneled backend) is a constant per call, so a larger K
    # amortizes it to ~2% of the measurement instead of ~8% at K=4.
    B, SR, K = 32, 16000, 16
    wavs = jnp.asarray(np.random.RandomState(0).randn(K, B, SR).astype(np.float32) * 0.1)

    @jax.jit
    def tokenize_many(params, wavs):
        return jax.lax.map(lambda w: C.tokenize(params, cfg, w), wavs)

    np.asarray(tokenize_many(params, wavs)[0, 0, :1])  # compile + warmup

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        codes = tokenize_many(params, wavs)
        np.asarray(codes[0, 0, :1])  # forces execution; negligible transfer
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = K * B * 1.0
    throughput = audio_seconds / dt  # audio-seconds tokenized per wall second per chip

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = None
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_cpu = ref.get("reference_cpu_audio_sec_per_sec")
        if ref_cpu:
            vs_baseline = throughput / (5.0 * ref_cpu)

    # secondary metric: full GAN train-step throughput at the bs32 x 1 s
    # bf16 sweet spot (BASELINE.json config 5) — reported inside the same
    # single JSON line so step regressions surface in BENCH_r*.json
    extra = {}
    try:
        extra = _bench_train_step(B=B, SR=SR)
    except Exception as e:  # never fail the headline metric
        extra = {"train_step_error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "tokenize_audio_seconds_per_second_per_chip",
        "value": round(throughput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "extra": extra,
    }))


def _bench_train_step(*, B: int, SR: int):
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = Config()  # flagship, precision bf16, remat auto (off at bs32 x 1 s)
    state = init_train_state(jax.random.key(0), cfg)
    step = jit_train_step(cfg, donate=False)
    rng = np.random.RandomState(1)
    batch = {"wav": jnp.asarray(rng.randn(B, SR).astype(np.float32) * 0.1)}
    state, metrics = step(state, batch)
    np.asarray(metrics["gen_loss"])  # compile + warmup
    N = 5
    t0 = time.perf_counter()
    for _ in range(N):
        state, metrics = step(state, batch)
    np.asarray(metrics["gen_loss"])  # forces the chained steps
    dt = (time.perf_counter() - t0) / N
    return {
        "train_step_seconds_bs32_bf16": round(dt, 4),
        "train_audio_s_per_s_per_chip": round(B * 1.0 / dt, 2),
    }


if __name__ == "__main__":
    main()
