"""Offset-canceling re-measurement of the s2d/folded-GEMM conv idea.

Earlier probe timings were polluted by the tunneled backend's fixed
per-call dispatch+fetch latency (~28 ms/call): with K=4 lax.map items that
is ~7 ms/item added to EVERYTHING, drowning sub-ms ops. Here every op is
timed at K=16 and K=4 items and the cost is (t16 - t4)/12 — the constant
cancels (same idiom as scripts/bench_tokenize_breakdown.py).

Data is generated ON DEVICE (host->device is ~50 MB/s through the tunnel;
multi-GB test arrays must never cross it) and buffers are deleted between
stages to stay inside 16 GB HBM.

Usage: python scripts/probe_s2d2.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.probe_s2d import build  # noqa: E402

K_TAPS = 7


def main():
    import jax
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    HP = jax.lax.Precision.HIGHEST
    conv_ref, _, s2d_gemm = build(jax, jnp)
    B = 32
    K1, K2 = 4, 16

    def devgen(key, shape, scale=0.1):
        return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32) * scale)(
            jax.random.key(key))

    def timed_at(jf, xs, reps=3):
        np.asarray(jnp.ravel(jf(xs))[:1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jf(xs)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timed(f, xs):
        jf = jax.jit(lambda a: jax.lax.map(f, a))
        t_small = timed_at(jf, xs[:K1])
        t_big = timed_at(jf, xs)
        return (t_big - t_small) / (K2 - K1)

    for C, T in [(48, 16000), (96, 8000), (192, 4000)]:
        x = devgen(C, (K2, B, C, T))
        w = devgen(C + 1, (C, C, K_TAPS), 0.05)
        flops = 2 * B * T * C * C * K_TAPS
        for d in (1, 9):
            dt0 = timed(lambda xx: conv_ref(xx, w, d), x)
            dt1 = timed(lambda xx: s2d_gemm(xx, w, d, 4), x)
            print(f"C={C:4d} d={d}: conv {dt0*1e3:7.3f} ms ({flops/dt0/1e12:5.2f} TF/s)"
                  f"  gemm[r4] {dt1*1e3:7.3f} ({flops/dt1/1e12:5.2f}, {dt0/dt1:4.2f}x)",
                  flush=True)
        x.delete()

    # Parts at C=48 geometry
    C, T, r = 48, 16000, 4
    S = T // r
    Kdim, N = 3 * r * C, r * C
    W2 = devgen(1, (Kdim, N), 0.05)
    gflop = 2 * B * S * Kdim * N / 1e9

    x = devgen(2, (K2, B, C, T))
    fold = lambda xx: xx.reshape(B, C, S, r).transpose(0, 2, 3, 1).reshape(B, S, r * C)
    print(f"parts: fold {timed(fold, x)*1e3:7.3f} ms", flush=True)
    x.delete()

    xf = devgen(3, (K2, B, S, r * C))

    def im2col(xx):
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (0, 0)))
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xpad, q, S, axis=1) for q in range(3)],
            axis=2)

    print(f"parts: im2col {timed(im2col, xf)*1e3:7.3f} ms", flush=True)
    unfold = lambda yy: yy.reshape(B, S, r, C).transpose(0, 3, 1, 2).reshape(B, C, T)
    print(f"parts: unfold {timed(unfold, xf)*1e3:7.3f} ms", flush=True)
    xf.delete()

    cols = devgen(4, (K2, B, S, Kdim))
    gemm = lambda cc: jax.lax.dot_general(cc, W2, (((2,), (0,)), ((), ())), precision=HP)
    t = timed(gemm, cols)
    print(f"parts: gemm(M={B*S},K={Kdim},N={N}) {t*1e3:7.3f} ms "
          f"({gflop/t/1e3:5.1f} TF/s)", flush=True)
    gemm_b = lambda cc: jax.lax.dot_general(
        cc.astype(jnp.bfloat16), W2.astype(jnp.bfloat16), (((2,), (0,)), ((), ())))
    t = timed(gemm_b, cols)
    print(f"parts: gemm bf16 {t*1e3:7.3f} ms ({gflop/t/1e3:5.1f} TF/s)", flush=True)
    cols.delete()


if __name__ == "__main__":
    main()
