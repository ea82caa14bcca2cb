"""Measure the fast (bf16-encoder) tokenize mode: speed + token flip rate.

Compares tokenize(mode='fast') against the conformant fp32 path on the
flagship config: throughput for both, and the fraction of token indices
that differ (the production-accuracy tradeoff documented in
models/codec.tokenize).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.models import codec as C
    from audiotokenization_tpu.ops.conv import fold_weight_norm

    cfg = Config()
    params = fold_weight_norm(C.init_codec(jax.random.key(0), cfg))
    B, SR, K = 32, 16000, 16
    wavs = jnp.asarray(np.random.RandomState(0).randn(K, B, SR).astype(np.float32) * 0.1)

    results = {}
    codes = {}
    for mode in ("conformant", "high", "balanced", "fast"):
        jf = jax.jit(lambda p, ws, mode=mode: jax.lax.map(
            lambda w: C.tokenize(p, cfg, w, mode=mode), ws))
        out = jf(params, wavs)
        np.asarray(out[0, 0, 0, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(params, wavs)
            np.asarray(out[0, 0, 0, :1])
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / K
        results[mode] = B / dt
        codes[mode] = np.asarray(out)
        print(f"{mode:11s}: {B/dt:7.1f} audio-s/s/chip ({dt*1e3:.1f} ms/batch)",
              flush=True)

    for m in ("high", "balanced", "fast"):
        flips = float((codes[m] != codes["conformant"]).mean())
        print(f"token flip rate {m} vs conformant: {flips:.4%} "
              f"({(codes[m] != codes['conformant']).sum()} of {codes[m].size}); "
              f"speedup {results[m] / results['conformant']:.2f}x")


if __name__ == "__main__":
    main()
