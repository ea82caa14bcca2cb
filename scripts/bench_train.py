"""Internal benchmark: full GAN train-step throughput on the current backend.

Prints one JSON line: steps/sec and audio-seconds trained/sec for the
flagship config at the reference's batch size (32 x 1 s), fp32 and bf16.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    results = {}
    for precision in ("bf16", "fp32"):
        cfg = Config()
        cfg.train.precision = precision
        state = init_train_state(jax.random.key(0), cfg)
        step = jit_train_step(cfg, donate=False)
        B = 32
        wav = jnp.asarray(np.random.RandomState(0).randn(B, 16000).astype(np.float32) * 0.1)
        batch = {"wav": wav}
        state2, m = step(state, batch)
        jax.block_until_ready(m["gen_loss"])
        n = 5
        t0 = time.perf_counter()
        s = state2
        for _ in range(n):
            s, m = step(s, batch)
            jax.block_until_ready(m["gen_loss"])
        dt = (time.perf_counter() - t0) / n
        results[precision] = {"sec_per_step": round(dt, 4),
                              "steps_per_sec": round(1 / dt, 3),
                              "audio_s_per_s": round(B / dt, 1)}
        del state, state2, s
    print(json.dumps({"metric": "train_step", "batch": 32, **results}))


if __name__ == "__main__":
    main()
