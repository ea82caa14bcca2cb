"""Does int8 reach the v5e's 2x-over-bf16 MXU tier through XLA?

v5e peak: ~197 bf16 TFLOP/s vs ~394 int8 TOP/s. If XLA lowers
int8 x int8 -> int32 dots/convs onto the int8 MXU path, a 'turbo'
tokenize mode (per-channel int8 weights + dynamic per-tensor activation
scales, fp32 VQ) could roughly double fast-mode throughput on the
MXU-bound stages. This probes raw dot_general and the codec's conv
shapes at fp32 / bf16 / int8.

Offset-canceled (K=16 vs 4 lax.map difference), on-device data.
Usage: python scripts/probe_int8.py
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

    K1, K2 = 4, 16

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

    def devgen(key, shape, dtype, scale=0.1):
        if dtype == jnp.int8:
            return jax.jit(lambda k: jax.random.randint(k, shape, -127, 128, jnp.int8))(
                jax.random.key(key))
        return jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * scale
                                  ).astype(dtype))(jax.random.key(key))

    # ---- raw dot_general: (M, Kd) @ (Kd, N) ----------------------------
    print("== dot_general ==")
    for (M, Kd, N) in ((8192, 768, 768), (8192, 1536, 1536), (32768, 384, 384)):
        flops = 2 * M * Kd * N
        rows = []
        for dt, acc, label in ((jnp.float32, jnp.float32, "fp32-HIGHEST"),
                               (jnp.bfloat16, jnp.float32, "bf16"),
                               (jnp.int8, jnp.int32, "int8")):
            a = devgen(1, (K2, M, Kd), dt)
            b = devgen(2, (Kd, N), dt)
            prec = jax.lax.Precision.HIGHEST if label == "fp32-HIGHEST" else None
            f = lambda x, b=b, acc=acc, prec=prec: jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=acc)
            dt_s = timed(f, a)
            rows.append(f"{label} {dt_s*1e3:7.2f} ms {flops/dt_s/1e12:6.1f} TF/s")
        print(f"  M={M} K={Kd} N={N}: " + " | ".join(rows))

    # ---- codec conv stages (NCH, k7 same-pad), B=32 --------------------
    print("== conv k7 (codec stages) ==")
    stage = {48: 16000, 96: 8000, 192: 4000, 384: 2000, 768: 400}
    B = 32
    for C, T in stage.items():
        flops = 2 * B * C * C * 7 * T
        rows = []
        for dt, acc, label in ((jnp.float32, jnp.float32, "fp32-HIGHEST"),
                               (jnp.bfloat16, jnp.float32, "bf16"),
                               (jnp.int8, jnp.int32, "int8")):
            x = devgen(10 + C, (K2, B, C, T), dt)
            w = devgen(20 + C, (C, C, 7), dt, 0.05)
            prec = jax.lax.Precision.HIGHEST if label == "fp32-HIGHEST" else None
            def f(xx, w=w, acc=acc, prec=prec):
                return jax.lax.conv_general_dilated(
                    xx, w, (1,), [(3, 3)],
                    dimension_numbers=("NCH", "OIH", "NCH"), precision=prec,
                    preferred_element_type=acc)
            try:
                dt_s = timed(f, x)
                rows.append(f"{label} {dt_s*1e3:7.2f} ms {flops/dt_s/1e12:6.1f} TF/s")
            except Exception as e:
                rows.append(f"{label} FAIL({type(e).__name__})")
        print(f"  C={C:4d} T={T:6d}: " + " | ".join(rows))

    # ---- int8 with dynamic dequant epilogue (what turbo would run) -----
    print("== int8 conv + dequant epilogue vs plain bf16 (C=384) ==")
    C, T = 384, 2000
    flops = 2 * B * C * C * 7 * T
    xq = devgen(31, (K2, B, C, T), jnp.int8)
    wq = devgen(32, (C, C, 7), jnp.int8)
    wscale = devgen(33, (C, 1), jnp.float32, 0.01)

    def f_deq(xx):
        y = jax.lax.conv_general_dilated(
            xx, wq, (1,), [(3, 3)], dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * wscale  # per-out-channel dequant

    dt_s = timed(f_deq, xq)
    print(f"  int8+dequant: {dt_s*1e3:7.2f} ms {flops/dt_s/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
