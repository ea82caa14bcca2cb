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
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C

    cfg = Config()
    params = C.init_codec(jax.random.key(0), cfg)

    B, SR = 32, 16000
    wav = jnp.asarray(np.random.RandomState(0).randn(B, SR).astype(np.float32) * 0.1)

    tokenize = jax.jit(lambda p, w: C.tokenize(p, cfg, w))
    # warmup / compile
    jax.block_until_ready(tokenize(params, wav))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        codes = tokenize(params, wav)
        jax.block_until_ready(codes)  # block per call: honest wall-clock
    dt = time.perf_counter() - t0
    audio_seconds = n_iters * B * 1.0
    throughput = audio_seconds / dt  # audio-seconds tokenized per wall second per chip

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = None
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_cpu = ref.get("reference_cpu_audio_sec_per_sec")
        if ref_cpu:
            vs_baseline = throughput / (5.0 * ref_cpu)

    print(json.dumps({
        "metric": "tokenize_audio_seconds_per_second_per_chip",
        "value": round(throughput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }))


if __name__ == "__main__":
    main()
