"""Isolate the cost of each s2d_gemm stage (fold transpose, im2col, GEMM).

Tells us whether the folded-GEMM idea is capped by the matmul itself or by
the data-movement around it — and what the speed-of-light for each part is.

Usage: python scripts/probe_s2d_parts.py
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
    rng = np.random.RandomState(0)
    B, K = 32, 4

    def timed(f, *args):
        jf = jax.jit(lambda *a: jax.lax.map(lambda x: f(x, *a[1:]), a[0]))
        r0 = jf(*args)
        np.asarray(jnp.ravel(r0)[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*args)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    # Stage shapes for C=48, T=16000, r=4: S=4000, K=576, N=192
    for C, T, r in [(48, 16000, 4), (96, 8000, 4), (192, 4000, 4)]:
        S = T // r
        Kdim, N = 3 * r * C, r * C
        x = jnp.asarray(rng.randn(K, B, C, T).astype(np.float32) * 0.1)
        xf = jnp.asarray(rng.randn(K, B, S, r * C).astype(np.float32) * 0.1)
        cols = jnp.asarray(rng.randn(K, B, S, Kdim).astype(np.float32) * 0.1)
        W2 = jnp.asarray(rng.randn(Kdim, N).astype(np.float32) * 0.05)

        def fold(xx):  # (B, C, T) -> (B, S, r*C)
            return xx.reshape(B, C, S, r).transpose(0, 2, 3, 1).reshape(B, S, r * C)

        def im2col(xx):  # (B, S, rC) -> (B, S, 3rC)
            xpad = jnp.pad(xx, ((0, 0), (1, 1), (0, 0)))
            return jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(xpad, q, S, axis=1)
                 for q in range(3)], axis=2)

        def gemm(cc):
            return jax.lax.dot_general(cc, W2, (((2,), (0,)), ((), ())),
                                       precision=HP)

        def gemm_bf16(cc):
            return jax.lax.dot_general(cc.astype(jnp.bfloat16),
                                       W2.astype(jnp.bfloat16),
                                       (((2,), (0,)), ((), ())))

        def unfold(yy):  # (B, S, rC) -> (B, C, T)
            return yy.reshape(B, S, r, C).transpose(0, 3, 1, 2).reshape(B, C, T)

        gflop = 2 * B * S * Kdim * N / 1e9
        t_fold = timed(fold, x)
        t_col = timed(im2col, xf)
        t_gemm = timed(gemm, cols)
        t_gemmb = timed(gemm_bf16, cols)
        t_unf = timed(unfold, xf)
        print(f"C={C}: fold {t_fold*1e3:6.3f} ms  im2col {t_col*1e3:6.3f} ms  "
              f"gemm(M={B*S},K={Kdim},N={N}) {t_gemm*1e3:6.3f} ms "
              f"({gflop/t_gemm/1e3:5.1f} TF/s; bf16 {t_gemmb*1e3:6.3f} = "
              f"{gflop/t_gemmb/1e3:5.1f} TF/s)  unfold {t_unf*1e3:6.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
