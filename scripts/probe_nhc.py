"""NHC vs NCH conv layouts at the lane-bound stages (ROADMAP perf item 1).

The tokenize profile shows C<=192 stages dominated by XLA's channels-minor
conv emitter (lane-bound at C=48). This probes whether feeding XLA the
("NHC","HIO","NHC") layout changes the emitter choice / speed for the k7
same-pad convs, at fp32-HIGHEST (conformant) and bf16-default precision.

Offset-canceled (K=16 vs 4 lax.map difference), on-device data.
Usage: python scripts/probe_nhc.py
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
    stage_T = {48: 16000, 96: 8000, 192: 4000}

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

    for C in (48, 96, 192):
        T = stage_T[C]
        flops = 2 * B * C * C * 7 * T
        w_oih = devgen(1000 + C, (C, C, 7), 0.05)  # (O, I, K)
        w_hio = jnp.transpose(w_oih, (2, 1, 0))    # (K, I, O)
        x_nch = devgen(C, (K2, B, C, T))
        x_nhc = jnp.swapaxes(x_nch, 2, 3)

        for prec, label in ((HP, "fp32-HIGHEST"), (None, "bf16-default")):
            nch = lambda xx, p=prec: jax.lax.conv_general_dilated(
                xx, w_oih, (1,), [(3, 3)],
                dimension_numbers=("NCH", "OIH", "NCH"), precision=p)
            nhc = lambda xx, p=prec: jax.lax.conv_general_dilated(
                xx, w_hio, (1,), [(3, 3)],
                dimension_numbers=("NHC", "HIO", "NHC"), precision=p)
            t_nch = timed(nch, x_nch)
            t_nhc = timed(nhc, x_nhc)
            print(f"C={C:4d} {label:13s}: NCH {t_nch*1e3:7.3f} ms "
                  f"({flops/t_nch/1e12:5.1f} TF/s) | NHC {t_nhc*1e3:7.3f} ms "
                  f"({flops/t_nhc/1e12:5.1f} TF/s) | NHC/NCH speedup "
                  f"{t_nch/t_nhc:4.2f}x", flush=True)
        x_nch.delete()
        x_nhc.delete()


if __name__ == "__main__":
    main()
