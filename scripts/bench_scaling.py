"""Data-parallel scaling benchmark across however many devices are attached.

On a multi-chip slice this measures the BASELINE scaling config (train-step
throughput at 1 chip vs N chips, same per-chip batch); with one chip it
degenerates to the single-chip number. Prints one JSON line per device count.
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
    from audiotokenization_tpu.parallel.mesh import make_data_mesh, shard_batch
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    n_dev = len(jax.devices())
    counts = sorted({1, n_dev})
    cfg = Config()
    cfg.train.precision = "bf16"
    state = init_train_state(jax.random.key(0), cfg)
    per_chip_batch = 32
    for n in counts:
        mesh = make_data_mesh(jax.devices()[:n]) if n > 1 else None
        step = jit_train_step(cfg, mesh, donate=False)
        B = per_chip_batch * n
        wav = jnp.asarray(np.random.RandomState(0).randn(B, 16000).astype(np.float32) * 0.1)
        batch = {"wav": wav} if mesh is None else shard_batch(mesh, {"wav": wav})
        s, m = step(state, batch)
        np.asarray(m["gen_loss"])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = step(s, batch)
        np.asarray(m["gen_loss"])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"devices": n, "global_batch": B,
                          "sec_per_step": round(dt, 4),
                          "audio_s_per_s": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
