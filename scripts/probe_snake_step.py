"""Full-train-step A/B: stock snake vs saved-residual custom-VJP snake.

probe_snake_bwd.py shows the saved (s2, c2) variant is 1.6-2.2x faster on
isolated fwd+bwd; this measures the real jitted GAN step with
ops.snake.snake_beta monkeypatched, to account for XLA conv+snake fusion
changes and memory pressure (the saved residuals add ~2 tensors/snake).

Usage: python scripts/probe_snake_step.py [--batch 32]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variant", default="both")  # base | saved | both
    args = ap.parse_args()

    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from audiotokenization_tpu.config import Config
    from audiotokenization_tpu.ops import snake as SN
    from audiotokenization_tpu.train.state import init_train_state
    from audiotokenization_tpu.train.step import jit_train_step

    EPS = 1e-9

    @jax.custom_vjp
    def snake_saved(x, alpha, beta):
        return _fwd(x, alpha, beta)[0]

    def _fwd(x, alpha, beta):
        a = jnp.exp(alpha)[None, :, None].astype(x.dtype)
        b = jnp.exp(beta)[None, :, None].astype(x.dtype)
        ax = x * a
        s2 = jnp.sin(2.0 * ax)
        c2 = jnp.cos(2.0 * ax)
        y = x + (1.0 / (b + EPS)) * (0.5 * (1.0 - c2))
        return y, (x, s2, c2, alpha, beta)

    def _bwd(res, ct):
        x, s2, c2, alpha, beta = res
        a = jnp.exp(alpha)[None, :, None].astype(x.dtype)
        b = jnp.exp(beta)[None, :, None].astype(x.dtype)
        inv_b = 1.0 / (b + EPS)
        dx = ct * (1.0 + (a * inv_b) * s2)
        da = jnp.sum((ct * x * s2 * inv_b).astype(jnp.float32), axis=(0, 2)) \
            * jnp.exp(alpha)
        db = -jnp.sum((ct * (0.5 * (1.0 - c2)) * inv_b).astype(jnp.float32),
                      axis=(0, 2))
        return dx, da.astype(alpha.dtype), db.astype(beta.dtype)

    snake_saved.defvjp(_fwd, _bwd)

    cfg = Config()
    cfg.train.precision = "bf16"
    cfg.train.remat = False
    B = args.batch
    state = init_train_state(jax.random.key(0), cfg)
    wav = jax.jit(lambda k: jax.random.normal(k, (B, 16000), jnp.float32) * 0.1)(
        jax.random.key(0))
    batch = {"wav": wav}

    def run_variant(name):
        step = jit_train_step(cfg, donate=False)

        def run(n):
            s2, m2 = step(state, batch)
            t0 = time.perf_counter()
            for _ in range(n):
                s2, m2 = step(s2, batch)
            np.asarray(m2["gen_loss"])
            return time.perf_counter() - t0

        run(1)
        t = (run(8) - run(2)) / 6
        print(f"{name:6s}: {t*1e3:7.1f} ms/step  ({B/t:.1f} audio-s/s)",
              flush=True)
        return t

    orig = SN.snake_beta
    if args.variant in ("base", "both"):
        run_variant("base")
    if args.variant in ("saved", "both"):
        SN.snake_beta = lambda x, alpha, beta: snake_saved(x, alpha, beta)
        try:
            run_variant("saved")
        finally:
            SN.snake_beta = orig


if __name__ == "__main__":
    main()
