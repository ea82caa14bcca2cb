"""Internal benchmark: full GAN train-step throughput on the current backend.

Prints one JSON line per variant: steps/sec and audio-seconds trained/sec for
the flagship config at the reference's batch size (32 x 1 s), across
precision x remat. Also reports device peak memory where the backend exposes
it (calibrates the auto-remat policy).

Timing: steps are chained through the state (true device serialization) and
the loop ends with an np.asarray fetch of a scalar — block_until_ready alone
does not reliably wait on the tunneled axon backend.
"""
import json
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
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    variants = [("bf16", True), ("bf16", False), ("fp32", True), ("fp32", False)]
    if len(sys.argv) > 1:  # e.g. bench_train.py bf16:False [batch]
        p, r = sys.argv[1].split(":")
        variants = [(p, r == "True")]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    results = {}
    for precision, remat in variants:
        name = f"{precision}_remat{int(remat)}"
        try:
            cfg = Config()
            cfg.train.precision = precision
            cfg.train.remat = remat
            state = init_train_state(jax.random.key(0), cfg)
            # donate like the real training loop: the chained s -> step(s, ..)
            # pattern is donation-safe and the ~2.6 GB of param+opt buffers
            # otherwise double-buffer and understate what fits in HBM
            step = jit_train_step(cfg, donate=True)
            wav = jnp.asarray(
                np.random.RandomState(0).randn(B, 16000).astype(np.float32) * 0.1)
            batch = {"wav": wav}
            state2, m = step(state, batch)
            np.asarray(m["gen_loss"])  # compile + warmup, real sync
            n = 5
            t0 = time.perf_counter()
            s = state2
            for _ in range(n):
                s, m = step(s, batch)
            np.asarray(m["gen_loss"])  # chained states serialize all n steps
            dt = (time.perf_counter() - t0) / n
            entry = {"sec_per_step": round(dt, 4),
                     "steps_per_sec": round(1 / dt, 3),
                     "audio_s_per_s": round(B / dt, 1)}
            stats = jax.local_devices()[0].memory_stats() or {}
            if "peak_bytes_in_use" in stats:
                entry["peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
            results[name] = entry
            del state, state2, s
        except Exception as e:
            results[name] = {"error": str(e).split("\n")[0][:200]}
        print(json.dumps({"metric": "train_step", "batch": B, name: results[name]}),
              flush=True)
    print(json.dumps({"metric": "train_step_summary", "batch": B, **results}))


if __name__ == "__main__":
    main()
