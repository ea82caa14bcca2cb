"""Tap-stacked/-split conv formulations probe (ROADMAP perf item 1).

The lane-bound C<=192 encoder stages run XLA's conv emitter at 2.8-9 TF/s
because a (B*T, C_in) x (C_in, C_out) matmul formulation caps BOTH the MXU
contraction dim (K=C_in) and column dim (N=C_out) below 128. Two fixes:

  tapmm    — all k taps as matmul columns: X (B*T,C) @ W' (C, k*C_out),
             then a k-way shift-add. N = k*C_out fills lanes; K=C still low.
  tapsplit — factor k (padded to U*V) as U shifted input copies stacked into
             K and V tap-groups stacked into N:
               z_v[s] = sum_u x[s + U... ] — one matmul (B*T, U*C) @ (U*C, V*C_out)
               y[t]   = sum_v z_v[t + (v - k//2)*d ... shifted]
             For C=48, U=4,V=2: K=192, N=96 — both near/above 128.

FLOPs identical to the conv except tapsplit's pad-to-8 adds k/8 overhead.
All variants fp32 HIGHEST (conformance precision).

Usage: python scripts/probe_tapstack.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K_TAPS = 7


def build_variants(jax, jnp):
    HP = jax.lax.Precision.HIGHEST

    def conv_ref(x, w, d):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP)

    def tapmm(x, w, d):
        Bs, C, T = x.shape
        O = w.shape[0]
        xt = jnp.swapaxes(x, 1, 2)
        wp = jnp.transpose(w, (1, 2, 0)).reshape(C, K_TAPS * O)
        p = jax.lax.dot_general(xt, wp, (((2,), (0,)), ((), ())),
                                precision=HP).reshape(Bs, T, K_TAPS, O)
        pad = 3 * d
        pp = jnp.pad(p, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        y = jnp.zeros((Bs, T, O), x.dtype)
        for tap in range(K_TAPS):
            y = y + jax.lax.dynamic_slice_in_dim(pp[:, :, tap, :], tap * d, T,
                                                 axis=1)
        return jnp.swapaxes(y, 1, 2)

    def tapsplit(x, w, d, U=4, V=2):
        # taps j = V*u + v (j=7.. zero-padded to U*V); z lives on the
        # EXTENDED domain s in [-3d, T+extra) because y[t] needs z at
        # negative s whose x terms are still in range.
        Bs, C, T = x.shape
        O = w.shape[0]
        xt = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        extra = max(0, (V - 4) * d)
        L = T + 3 * d + extra
        # xe[i] = x[i - 3d]; slices xs_u[si] = xe[si + V*u*d] = x[s + V*u*d]
        xe = jnp.pad(xt, ((0, 0), (3 * d, extra + (U - 1) * V * d), (0, 0)))
        xs = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xe, V * u * d, L, axis=1)
             for u in range(U)], axis=2)  # (B, L, U*C)
        # weights: W2[(u,c), (v,o)] = w[o, c, V*u+v] (0 when tap >= 7)
        w8 = jnp.concatenate(
            [w, jnp.zeros((O, C, U * V - K_TAPS), w.dtype)], axis=2)
        # (O, C, U, V) -> (U, C, V, O) -> (U*C, V*O)
        w2 = jnp.transpose(w8.reshape(O, C, U, V), (2, 1, 3, 0)).reshape(
            U * C, V * O)
        z = jax.lax.dot_general(xs, w2, (((2,), (0,)), ((), ())),
                                precision=HP).reshape(Bs, L, V, O)
        # y[t] = sum_v z_v[s = t + (v-3)d] = sum_v z[t + v*d] (index = s+3d)
        y = jnp.zeros((Bs, T, O), x.dtype)
        for v in range(V):
            y = y + jax.lax.dynamic_slice_in_dim(z[:, :, v, :], v * d, T,
                                                 axis=1)
        return jnp.swapaxes(y, 1, 2)

    return conv_ref, tapmm, tapsplit


def main():
    import jax
    import jax.numpy as jnp

    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    conv_ref, tapmm, tapsplit = build_variants(jax, jnp)
    B, K = 32, 4
    stages = [(48, 16000), (96, 8000), (192, 4000), (384, 2000)]
    rng = np.random.RandomState(0)

    # Correctness is verified on CPU (see git history / test once integrated);
    # on the tunneled TPU every un-jitted primitive is a separate remote
    # compile, so this probe times jitted graphs ONLY.
    def timed(f, *args):
        jf = jax.jit(lambda *a: jax.lax.map(lambda x: f(x, *a[1:]), a[0]))
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
        w = jnp.asarray(rng.randn(C, C, K_TAPS).astype(np.float32) * 0.05)
        for d in (1, 9):
            flops = 2 * B * T * C * C * K_TAPS
            dt0 = timed(lambda xx: conv_ref(xx, w, d), x)
            dt1 = timed(lambda xx: tapmm(xx, w, d), x)
            dt2 = timed(lambda xx: tapsplit(xx, w, d), x)
            print(f"C={C:4d} d={d}: conv {dt0*1e3:7.3f} ms ({flops/dt0/1e12:5.2f} TF/s)"
                  f"  tapmm {dt1*1e3:7.3f} ({flops/dt1/1e12:5.2f}, {dt0/dt1:4.2f}x)"
                  f"  tapsplit {dt2*1e3:7.3f} ({flops/dt2/1e12:5.2f}, {dt0/dt2:4.2f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
