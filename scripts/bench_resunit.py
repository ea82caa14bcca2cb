"""On-device A/B: fused ResidualUnit Pallas kernel variants vs the XLA path.

Times each (C, T, dilation) encoder stage shape at batch 32 on the real TPU
chip, using the lax.map-over-distinct-inputs + tiny-fetch timing idiom from
bench.py (block_until_ready is unreliable on the tunneled backend).

Usage: python scripts/bench_resunit.py [--versions 1,4] [--stages 48,96,192]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--versions", default="1,4")
    ap.add_argument("--stages", default="96,192",
                    help="channel counts; T inferred from the encoder schedule")
    ap.add_argument("--dilation", default="3", help="comma list")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8, help="distinct inputs per timed call")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.models.bigcodec import residual_unit
    from audiotokenization_tpu.ops.pallas.residual_unit_kernel import fused_residual_unit

    # encoder stage schedule for the flagship config (ngf 48, strides 2,2,2,5,5)
    stage_T = {48: 16000, 96: 8000, 192: 4000, 384: 2000, 768: 400}
    versions = [int(v) for v in args.versions.split(",")]
    stages = [int(c) for c in args.stages.split(",")]
    B, K = args.batch, args.reps
    dilations = [int(v) for v in str(args.dilation).split(",")]
    rng = np.random.RandomState(0)

    def make_params(C, key):
        ks = jax.random.split(key, 4)
        return {
            "conv1": {"v": jax.random.normal(ks[0], (C, C, 7)) * 0.05,
                      "g": jnp.ones((C, 1, 1)), "b": jnp.zeros((C,))},
            "conv2": {"v": jax.random.normal(ks[1], (C, C, 1)) * 0.05,
                      "g": jnp.ones((C, 1, 1)), "b": jnp.zeros((C,))},
            "snake1": {"alpha": jnp.zeros((C,)), "beta": jnp.zeros((C,))},
            "snake2": {"alpha": jnp.zeros((C,)), "beta": jnp.zeros((C,))},
        }

    def _timed_at(f, params, xs):
        np.asarray(f(params, xs)[0, 0, 0, :1])  # compile+warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, xs)
            np.asarray(out[0, 0, 0, :1])
            times.append(time.perf_counter() - t0)
        return min(times)

    def timed(fn, x_many, params):
        """Offset-canceled per-item time: the tunneled backend adds a fixed
        ~28 ms dispatch+fetch cost per call, so time K and K//4 items and
        difference — otherwise sub-ms ops all read as ~7 ms (the bug that
        first closed the fused-kernel investigation)."""
        f = jax.jit(lambda p, xs: jax.lax.map(lambda x: fn(p, x), xs))
        k1 = max(1, K // 4)
        t_small = _timed_at(f, params, x_many[:k1])
        t_big = _timed_at(f, params, x_many)
        return (t_big - t_small) / (K - k1)

    aa = lambda x, p: x + (1.0 / (jnp.exp(p["beta"])[:, None] + 1e-9)) * jnp.sin(jnp.exp(p["alpha"])[:, None] * x) ** 2

    for C in stages:
      for d in dilations:
        T = stage_T[C]
        params = make_params(C, jax.random.key(C))
        # generate on device: the tunnel moves ~50 MB/s, multi-GB inputs
        # must not cross it
        x_many = jax.jit(lambda k: jax.random.normal(k, (K, B, C, T), jnp.float32)
                         * 0.1)(jax.random.key(17 * C + 1))
        # HBM bytes moved by the ideal fused kernel: read x + write out
        ideal_gb = 2 * B * C * T * 4 / 1e9

        dt_xla = timed(
            lambda p, x: residual_unit(
                x, p, dilation=d, causal=False,
                aa=lambda y, sp: aa(y, sp)), x_many, params)
        print(f"C={C:4d} T={T:6d} XLA      {dt_xla*1e3:8.3f} ms  "
              f"({ideal_gb/dt_xla:6.1f} GB/s vs ideal-traffic)", flush=True)
        for v in versions:
            try:
                dt = timed(
                    lambda p, x, v=v: fused_residual_unit(
                        x, p, dilation=d, interpret=False, version=v),
                    x_many, params)
                print(f"C={C:4d} T={T:6d} pallas-v{v} {dt*1e3:8.3f} ms  "
                      f"({ideal_gb/dt:6.1f} GB/s)  {dt_xla/dt:5.2f}x XLA", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"C={C:4d} T={T:6d} pallas-v{v} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
