"""Snake backward cost: XLA recompute vs saved-residual custom VJP.

The train-step profile (profile_train_step.py) shows 47% of the step in
multiply_reduce_fusion ops producing per-channel [C] outputs from
[B,C,T] tensors — the snake alpha/beta gradient reduces, each of which
(hypothesis) recomputes sin/cos over the full activation. This probes:

  base   jax.grad through the stock snake_beta (XLA picks fusions)
  saved  custom_vjp saving s2=sin(2ax), c2=cos(2ax) from forward, so the
         backward is pure mul/add/reduce:
           sin^2(ax) = (1-c2)/2 ;  sin(ax)cos(ax) = s2/2
           dx = ct*(1 + (a/b)*s2)
           da_log = sum(ct*x*s2/b)*a ... (chain through exp)
           db_log = -sum(ct*(1-c2)/(2b))  (d(1/b)/db_log = -1/b)

Per-stage at the codec's (C, T) schedule, bf16 inputs (train precision),
offset-canceled lax.map timing, on-device data.

Usage: python scripts/probe_snake_bwd.py
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

    B, K1, K2 = 32, 4, 16
    EPS = 1e-9

    def devgen(key, shape, dtype=jnp.bfloat16, scale=0.5):
        return jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)
                                  * scale).astype(dtype))(jax.random.key(key))

    def timed_at(jf, *xs):
        np.asarray(jnp.ravel(jf(*xs))[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*xs)
            np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timed(f, xs, args):
        jf = jax.jit(lambda a, *p: jax.lax.map(lambda w: f(w, *p), a))
        return (timed_at(jf, xs, *args) - timed_at(jf, xs[:K1], *args)) / (K2 - K1)

    # --- stock implementation
    def snake_base(x, alpha, beta):
        a = jnp.exp(alpha)[None, :, None].astype(x.dtype)
        b = jnp.exp(beta)[None, :, None].astype(x.dtype)
        s = jnp.sin(x * a)
        return x + (1.0 / (b + EPS)) * (s * s)

    # --- saved-residual custom VJP
    @jax.custom_vjp
    def snake_saved(x, alpha, beta):
        return _snake_fwd(x, alpha, beta)[0]

    def _snake_fwd(x, alpha, beta):
        a = jnp.exp(alpha)[None, :, None].astype(x.dtype)
        b = jnp.exp(beta)[None, :, None].astype(x.dtype)
        ax = x * a
        s2 = jnp.sin(2.0 * ax)
        c2 = jnp.cos(2.0 * ax)
        y = x + (1.0 / (b + EPS)) * (0.5 * (1.0 - c2))
        return y, (x, s2, c2, alpha, beta)

    def _snake_bwd(res, ct):
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

    snake_saved.defvjp(_snake_fwd, _snake_bwd)

    # numeric sanity (CPU-friendly, tiny)
    xs_t = devgen(99, (2, 4, 64), jnp.float32)
    al = jnp.linspace(-0.1, 0.2, 4)
    be = jnp.linspace(0.1, -0.2, 4)
    g1 = jax.grad(lambda *p: jnp.sum(snake_base(*p).astype(jnp.float32)), (0, 1, 2))(xs_t, al, be)
    g2 = jax.grad(lambda *p: jnp.sum(snake_saved(*p).astype(jnp.float32)), (0, 1, 2))(xs_t, al, be)
    for u, v in zip(g1, g2):
        err = float(jnp.max(jnp.abs(u - v)))
        assert err < 2e-2, err
    print("gradients agree", flush=True)

    stage_T = {48: 16000, 96: 8000, 192: 4000, 384: 2000, 768: 400}
    for C, T in stage_T.items():
        x = devgen(C, (K2, B, C, T))
        al = devgen(1000 + C, (C,), jnp.float32, 0.1)
        be = devgen(2000 + C, (C,), jnp.float32, 0.1)

        def g_base(w, a_, b_):
            g = jax.grad(lambda *p: jnp.sum(snake_base(*p).astype(jnp.float32)),
                         (0, 1, 2))(w, a_, b_)
            return g[0].astype(jnp.float32).sum() + g[1].sum() + g[2].sum()

        def g_saved(w, a_, b_):
            g = jax.grad(lambda *p: jnp.sum(snake_saved(*p).astype(jnp.float32)),
                         (0, 1, 2))(w, a_, b_)
            return g[0].astype(jnp.float32).sum() + g[1].sum() + g[2].sum()

        def fwd_only(w, a_, b_):
            return jnp.sum(snake_base(w, a_, b_).astype(jnp.float32))

        tf_ = timed(fwd_only, x, (al, be))
        tb = timed(g_base, x, (al, be))
        ts = timed(g_saved, x, (al, be))
        print(f"C={C:4d} T={T:6d}: fwd {tf_*1e3:6.2f} ms | fwd+bwd base "
              f"{tb*1e3:6.2f} ms | fwd+bwd saved {ts*1e3:6.2f} ms | "
              f"saved/base {tb/ts:4.2f}x", flush=True)
        x.delete()


if __name__ == "__main__":
    main()
