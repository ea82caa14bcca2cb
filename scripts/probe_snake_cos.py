"""Snake transcendental experiment (VERDICT r2 next-round #6).

The train-step xplane profile attributes ~34% to snake fwd+bwd sin/cos on
~49 MB tensors (docs/ROADMAP). The saved-residual custom-VJP lost end-to-end
to fusion barriers; this probe measures the BARRIER-FREE rewrite
sin^2(ax) = (1 - cos(2ax))/2 (ops/snake.cos_form) on the full flagship GAN
step, bf16 bs32, offset-canceled per the timing hygiene rules (chained
states + np.asarray fetch).

Run on TPU:  python scripts/probe_snake_cos.py [n_steps]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_variant(cos: bool, n: int):
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.ops import snake
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    cfg = Config()
    cfg.train.precision = "bf16"
    cfg.train.remat = False
    state = init_train_state(jax.random.key(0), cfg)
    step = jit_train_step(cfg, donate=True)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(32, 16000).astype(np.float32) * 0.1)
    batch = {"wav": wav}
    with snake.cos_form(cos):  # flag is read at trace time
        state2, m = step(state, batch)
        np.asarray(m["gen_loss"])  # compile + warmup with a real sync
    t0 = time.perf_counter()
    s = state2
    for _ in range(n):
        s, m = step(s, batch)
    loss = float(np.asarray(m["gen_loss"]))
    dt = (time.perf_counter() - t0) / n
    del state, state2, s
    return dt, loss


def main():
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = {}
    # interleave A/B/A/B to cancel slow drift on the tunneled backend
    for rep in range(2):
        for name, cos in (("sin2", False), ("cos", True)):
            dt, loss = time_variant(cos, n)
            out.setdefault(name, []).append(dt)
            print(json.dumps({"variant": name, "rep": rep,
                              "sec_per_step": round(dt, 4),
                              "gen_loss": round(loss, 4)}), flush=True)
    best = {k: min(v) for k, v in out.items()}
    speedup = best["sin2"] / best["cos"] - 1.0
    print(json.dumps({"metric": "snake_cos_form", "best": best,
                      "cos_speedup_pct": round(100 * speedup, 2)}))


if __name__ == "__main__":
    main()
