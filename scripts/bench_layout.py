"""Layout experiment for the conformant tokenize path (ROADMAP perf item 1).

Compares NCH (current, torch-parity layout) vs NHC activations for one
encoder stage (3 ResidualUnits at dilations 1,3,9) at every flagship stage
shape, fp32-HIGHEST matmuls (the conformance precision). Both variants
compute identical math; NHC keeps C in the lane dimension which may map
better onto the MXU for the small-C early stages.

Also reports an fp32 conv-FLOPs rate per stage so we can see where the
2.8x-to-ceiling gap lives.

Usage: PYTHONPATH=. python scripts/bench_layout.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    HP = jax.lax.Precision.HIGHEST
    B, K = 32, 4
    stages = [(48, 16000), (96, 8000), (192, 4000), (384, 2000), (768, 400)]
    rng = np.random.RandomState(0)

    def snake_nch(x, a, b):
        return x + (1.0 / (jnp.exp(b)[:, None] + 1e-9)) * jnp.sin(jnp.exp(a)[:, None] * x) ** 2

    def snake_nhc(x, a, b):
        return x + (1.0 / (jnp.exp(b) + 1e-9)) * jnp.sin(jnp.exp(a) * x) ** 2

    def unit_nch(x, w7, b7, w1, b1, a, bsn, d):
        y = snake_nch(x, a, bsn)
        y = jax.lax.conv_general_dilated(
            y, w7, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP) + b7[None, :, None]
        y = snake_nch(y, a, bsn)
        y = jax.lax.conv_general_dilated(
            y, w1, (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP) + b1[None, :, None]
        return x + y

    def unit_nhc(x, w7, b7, w1, b1, a, bsn, d):
        y = snake_nhc(x, a, bsn)
        y = jax.lax.conv_general_dilated(
            y, w7, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"), precision=HP) + b7
        y = snake_nhc(y, a, bsn)
        y = jax.lax.conv_general_dilated(
            y, w1, (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"), precision=HP) + b1
        return x + y

    def stack(unit, x, ws):
        for d, (w7, b7, w1, b1, a, bsn) in zip((1, 3, 9), ws):
            x = unit(x, w7, b7, w1, b1, a, bsn, d)
        return x

    def timed(f, *args):
        jf = jax.jit(lambda *a: jax.lax.map(lambda x: f(x, *a[1:]), a[0]))
        # slice ON DEVICE before fetching — np.asarray(full output) would drag
        # hundreds of MB through the ~50 MB/s tunnel and swamp the timing
        np.asarray(jf(*args)[0, 0, 0, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*args)
            np.asarray(out[0, 0, 0, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    for C, T in stages:
        x = jnp.asarray(rng.randn(K, B, C, T).astype(np.float32) * 0.1)
        ws_oih = []
        for i in range(3):
            ws_oih.append((
                jnp.asarray(rng.randn(C, C, 7).astype(np.float32) * 0.05),
                jnp.zeros((C,)),
                jnp.asarray(rng.randn(C, C, 1).astype(np.float32) * 0.05),
                jnp.zeros((C,)),
                jnp.zeros((C,)), jnp.zeros((C,)),
            ))
        ws_hio = [(jnp.transpose(w7, (2, 1, 0)), b7, jnp.transpose(w1, (2, 1, 0)),
                   b1, a, bsn) for w7, b7, w1, b1, a, bsn in ws_oih]
        x_nhc = jnp.swapaxes(x, 2, 3)

        flops = 2 * B * T * C * C * (7 + 1) * 3  # per batch, 3 units
        dt_nch = timed(lambda xx, ww=ws_oih: stack(unit_nch, xx, ww), x)
        dt_nhc = timed(lambda xx, ww=ws_hio: stack(unit_nhc, xx, ww), x_nhc)
        print(f"C={C:4d} T={T:6d}  NCH {dt_nch*1e3:8.3f} ms ({flops/dt_nch/1e12:5.2f} TF/s)"
              f"  NHC {dt_nhc*1e3:8.3f} ms ({flops/dt_nhc/1e12:5.2f} TF/s)"
              f"  NHC/NCH speedup {dt_nch/dt_nhc:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
