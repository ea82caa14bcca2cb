"""Benchmark: tokenization throughput (audio-seconds/sec/chip) on the flagship codec.

Measures the BASELINE.json headline config — encoder+VQ tokenization,
batch 32 x 1 s 16 kHz clips on one chip — and reports one JSON line.
vs_baseline compares against 5x the reference PyTorch-CPU tokenization
throughput (the driver-defined target), measured once by
scripts/measure_reference_cpu.py and cached in bench_baseline.json.

MFU accounting (VERDICT r4 next #6): the compiled executables' XLA
cost_analysis gives the LOGICAL flop count of exactly the graphs being
timed; mfu fields divide achieved flops/s by the chip's peak. The
conformant tokenize path runs fp32 (6-pass) matmuls for bit-exact parity,
so its utilization is reported against BOTH the bf16 peak and the
fp32-6-pass effective ceiling (peak_bf16 / 6); the bf16 train step is
reported against the bf16 peak.
"""
import json
import time
from pathlib import Path

import numpy as np

# peak dense-matmul throughput per chip, bf16 (published spec sheets)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,
}


# peak HBM bandwidth per chip (bytes/s)
_PEAK_HBM = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5": 2765e9,  # v5p
    "TPU v6 lite": 1640e9,
}


def _cost_of(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def _peaks() -> tuple:
    import jax

    kind = jax.devices()[0].device_kind
    flops = next((v for k, v in _PEAK_BF16.items() if kind.startswith(k)),
                 None)
    hbm = next((v for k, v in _PEAK_HBM.items() if kind.startswith(k)), None)
    return flops, hbm


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

    # MFU of the timed tokenize graph (AOT lower+compile hits the persistent
    # compile cache — the executable was already built for the warmup)
    mfu = {}
    try:
        flops, hbm_bytes = _cost_of(tokenize_many.lower(params, wavs).compile())
        peak, peak_hbm = _peaks()
        if flops and peak:
            achieved = flops / dt
            mfu = {
                "tokenize_tflops_per_s": round(achieved / 1e12, 2),
                "tokenize_mfu_vs_bf16_peak_pct": round(100 * achieved / peak, 2),
                # the conformant path runs 6-pass fp32 matmuls: its
                # speed-of-light is peak_bf16 / 6
                "tokenize_mfu_vs_fp32_6pass_ceiling_pct": round(
                    100 * achieved / (peak / 6.0), 2),
            }
        if hbm_bytes and peak_hbm:
            # the tokenize path is bandwidth-bound, not FLOPs-bound: the
            # roofline number that explains the throughput plateau
            mfu["tokenize_hbm_gb_per_s"] = round(hbm_bytes / dt / 1e9, 1)
            mfu["tokenize_hbm_utilization_pct"] = round(
                100 * hbm_bytes / dt / peak_hbm, 1)
    except Exception as e:  # cost_analysis is backend-dependent
        mfu = {"mfu_error": f"{type(e).__name__}: {e}"}

    # the recommended serving mode (docs/SERVING.md): bf16_3x matmul passes,
    # fp32 VQ — oracle parity equal to conformant at ~1.5x the throughput
    try:
        @jax.jit
        def tokenize_many_high(params, wavs):
            return jax.lax.map(lambda w: C.tokenize(params, cfg, w,
                                                    mode="high"), wavs)

        np.asarray(tokenize_many_high(params, wavs)[0, 0, :1])
        ths = []
        for _ in range(3):
            t0 = time.perf_counter()
            codes_h = tokenize_many_high(params, wavs)
            np.asarray(codes_h[0, 0, :1])
            ths.append(time.perf_counter() - t0)
        mfu["tokenize_high_audio_s_per_s"] = round(K * B / min(ths), 2)
    except Exception as e:
        mfu["tokenize_high_error"] = f"{type(e).__name__}: {e}"

    # secondary metric: full GAN train-step throughput at the bs32 x 1 s
    # bf16 sweet spot (BASELINE.json config 5) — reported inside the same
    # single JSON line so step regressions surface in BENCH_r*.json
    extra = dict(mfu)
    try:
        extra.update(_bench_train_step(B=B, SR=SR))
    except Exception as e:  # never fail the headline metric
        extra["train_step_error"] = f"{type(e).__name__}: {e}"

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
    out = {
        "train_step_seconds_bs32_bf16": round(dt, 4),
        "train_audio_s_per_s_per_chip": round(B * 1.0 / dt, 2),
    }
    try:
        flops, hbm_bytes = _cost_of(step.lower(state, batch).compile())
        peak, peak_hbm = _peaks()
        if flops and peak:
            achieved = flops / dt
            out["train_step_tflops_per_s"] = round(achieved / 1e12, 2)
            out["train_step_mfu_vs_bf16_peak_pct"] = round(
                100 * achieved / peak, 2)
        if hbm_bytes and peak_hbm:
            out["train_step_hbm_utilization_pct"] = round(
                100 * hbm_bytes / dt / peak_hbm, 1)
    except Exception as e:
        out["train_mfu_error"] = f"{type(e).__name__}: {e}"
    return out


if __name__ == "__main__":
    main()
