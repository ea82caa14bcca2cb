"""Complete the block1 cost accounting: k1 conv, snake, down-conv, LSTM.

Offset-canceled (K=16 vs 4), on-device data. With k7 convs at 5.05 ms
(probe_s2d2), this pins down the remaining ~9 ms of block1 and the
lstm+tail 11.1 ms from the breakdown.

Usage: python scripts/probe_block1_parts.py
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

    HP = jax.lax.Precision.HIGHEST
    B, K1, K2 = 32, 4, 16

    def devgen(key, shape, scale=0.1):
        return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32) * scale)(
            jax.random.key(key))

    def timed_at(jf, xs):
        np.asarray(jnp.ravel(jf(xs))[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(xs)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timed(f, xs):
        jf = jax.jit(lambda a: jax.lax.map(f, a))
        return (timed_at(jf, xs) - timed_at(jf, xs[:K1])) / (K2 - K1)

    C, T = 48, 16000
    x = devgen(0, (K2, B, C, T))
    w1 = devgen(1, (C, C, 1), 0.05)
    wd = devgen(2, (2 * C, C, 4), 0.05)
    alpha = jnp.zeros((C,))

    conv1 = lambda xx: jax.lax.conv_general_dilated(
        xx, w1, (1,), [(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"),
        precision=HP)
    down = lambda xx: jax.lax.conv_general_dilated(
        xx, wd, (2,), [(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"),
        precision=HP)

    def snake(xx):
        a = jnp.exp(alpha)[:, None]
        s = jnp.sin(xx * a)
        return xx + (1.0 / (a + 1e-9)) * (s * s)

    print(f"k1 conv C={C}: {timed(conv1, x)*1e3:7.3f} ms", flush=True)
    print(f"down k4 s2   : {timed(down, x)*1e3:7.3f} ms", flush=True)
    print(f"snake        : {timed(snake, x)*1e3:7.3f} ms", flush=True)
    x.delete()

    # LSTM at the encoder tail: 2 layers, d=1536, T=80
    from audiotokenization_tpu.ops.lstm import init_lstm, res_lstm
    D, Tf = 1536, 80
    params = init_lstm(jax.random.key(3), D, D, num_layers=2)
    xl = devgen(4, (K2, B, D, Tf))

    def lstm_fp32(xx):
        with jax.default_matmul_precision("float32"):
            return res_lstm(xx, params, num_layers=2)

    print(f"res_lstm fp32: {timed(lstm_fp32, xl)*1e3:7.3f} ms", flush=True)
    xl.delete()


if __name__ == "__main__":
    main()
