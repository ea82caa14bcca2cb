"""Space-to-depth conv probe (ROADMAP perf item 1, round 2).

The C<=192 encoder/decoder stages are lane-bound: XLA's conv emitter fills
only C/128 lanes. probe_tapstack showed matmul reformulations cap out too
(MXU columns = C_out). Space-to-depth is the one transform that RAISES the
channel count: reshape (B, C, T) -> (B, C*r, T/r) and rewrite the k=7 conv
as an equivalent k'=3 conv over the folded axis — 3r/7 = 1.71x FLOPs (r=4)
at the much better C*r conv rate.

Dilated convs first get a polyphase split: a dilation-d conv never mixes
phases t mod d, so (B, C, T) -> (B*d, C, T/d) phase streams each see a
dilation-1 conv, then s2d applies per stream. Combined inflation stays
3r/7 for every dilation.

Exactness: same 7C-term dot products, only reassociated => fp32-rounding
equal to the direct conv (checked on CPU here; ~1e-6).

Usage: python scripts/probe_s2d.py [cpu]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K_TAPS = 7


def build(jax, jnp):
    HP = jax.lax.Precision.HIGHEST

    def conv_ref(x, w, d):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(3 * d, 3 * d)], rhs_dilation=(d,),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP)

    def s2d_taps(r):
        # q = floor((i + tau - 3)/r), i in [0,r), tau in [0,7)
        q_lo = -((3 + r - 1) // r)
        q_hi = (r - 1 + K_TAPS - 1 - 3) // r
        return q_lo, q_hi

    def s2d_weights(w, r):
        """(O, C, 7) dilation-1 kernel -> (O*r, C*r, k') folded kernel."""
        O, C, _ = w.shape
        q_lo, q_hi = s2d_taps(r)
        kk = q_hi - q_lo + 1
        Wt = jnp.zeros((O, r, C, r, kk), w.dtype)
        for q in range(q_lo, q_hi + 1):
            for i in range(r):
                for j in range(r):
                    tau = q * r + j - i + 3
                    if 0 <= tau < K_TAPS:
                        Wt = Wt.at[:, i, :, j, q - q_lo].set(w[:, :, tau])
        return Wt.reshape(O * r, C * r, kk)

    def s2d_conv(x, w, d, r):
        """Exact k7 'same' dilated conv via phase split + space-to-depth."""
        B, C, T = x.shape
        O = w.shape[0]
        if d > 1:
            Tp = -(-T // d) * d
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
            # (B, C, U, d) -> (B, d, C, U) -> (B*d, C, U): stream p holds x[.., u*d+p]
            xp = xp.reshape(B, C, Tp // d, d).transpose(0, 3, 1, 2).reshape(B * d, C, Tp // d)
            y = s2d_conv(xp, w, 1, r)
            y = y.reshape(B, d, O, Tp // d).transpose(0, 2, 3, 1).reshape(B, O, Tp)
            return y[:, :, :T]
        Tp = -(-T // r) * r
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
        # channel (c, j) holds x[c, s*r + j]
        xp = xp.reshape(B, C, Tp // r, r).transpose(0, 1, 3, 2).reshape(B, C * r, Tp // r)
        Wt = s2d_weights(w, r)
        q_lo, q_hi = s2d_taps(r)
        y = jax.lax.conv_general_dilated(
            xp, Wt, (1,), [(-q_lo, q_hi)], dimension_numbers=("NCH", "OIH", "NCH"),
            precision=HP)
        y = y.reshape(B, O, r, Tp // r).transpose(0, 1, 3, 2).reshape(B, O, Tp)
        return y[:, :, :T]

    def s2d_gemm(x, w, d, r):
        """Same math, but the folded conv becomes an explicit im2col GEMM:
        rows = folded positions s (M = B*T/(d*r)), K = k'*C*r stacked shifted
        blocks, N = r*C_out output-phase columns. Trades the abundant M dim
        into the scarce lane dim N — the transform no conv/matmul
        reformulation in the ORIGINAL domain can do (probe_tapstack)."""
        B, C, T = x.shape
        O = w.shape[0]
        if d > 1:
            Tp = -(-T // d) * d
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
            xp = xp.reshape(B, C, Tp // d, d).transpose(0, 3, 1, 2).reshape(B * d, C, Tp // d)
            y = s2d_gemm(xp, w, 1, r)
            y = y.reshape(B, d, O, Tp // d).transpose(0, 2, 3, 1).reshape(B, O, Tp)
            return y[:, :, :T]
        Tp = -(-T // r) * r
        S = Tp // r
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
        # (B, S, r*C): position-major folding; lane axis holds (j, c)
        xf = xp.reshape(B, C, S, r).transpose(0, 2, 3, 1).reshape(B, S, r * C)
        q_lo, q_hi = s2d_taps(r)
        kk = q_hi - q_lo + 1
        xpad = jnp.pad(xf, ((0, 0), (-q_lo, q_hi), (0, 0)))
        cols = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xpad, q - q_lo, S, axis=1)
             for q in range(q_lo, q_hi + 1)], axis=2)  # (B, S, kk*r*C)
        # W2[(q, j, c), (i, o)] = w[o, c, q*r + j - i + 3]
        W2 = np.zeros((kk, r, C, r, O), np.float32)
        wn = np.asarray(w)
        for q in range(q_lo, q_hi + 1):
            for i in range(r):
                for j in range(r):
                    tau = q * r + j - i + 3
                    if 0 <= tau < K_TAPS:
                        W2[q - q_lo, j, :, i, :] = wn[:, :, tau].T
        W2 = jnp.asarray(W2.reshape(kk * r * C, r * O))
        y = jax.lax.dot_general(cols, W2, (((2,), (0,)), ((), ())),
                                precision=HP)  # (B, S, r*O)
        y = y.reshape(B, S, r, O).transpose(0, 3, 1, 2).reshape(B, O, Tp)
        return y[:, :, :T]

    return conv_ref, s2d_conv, s2d_gemm


def main():
    cpu = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from audiotokenization_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    conv_ref, s2d_conv, s2d_gemm = build(jax, jnp)
    rng = np.random.RandomState(0)

    if cpu:
        for C, T in [(8, 64), (48, 400)]:
            x = jnp.asarray(rng.randn(2, C, T).astype(np.float32))
            w = jnp.asarray(rng.randn(C, C, 7).astype(np.float32) * 0.1)
            for d in (1, 3, 9):
                for r in (2, 4):
                    y0 = conv_ref(x, w, d)
                    for name, f in (("s2d", s2d_conv), ("gemm", s2d_gemm)):
                        y1 = f(x, w, d, r)
                        err = float(jnp.abs(y1 - y0).max() / jnp.abs(y0).max())
                        print(f"C={C} T={T} d={d} r={r} {name}: relerr {err:.2e}")
                        assert err < 1e-5, "MISMATCH"
        print("CPU exactness OK")
        return

    B, K = 32, 4

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

    # (C, T) as in encoder blocks 1-3; decoder mirrors them.
    for C, T in [(48, 16000), (96, 8000), (192, 4000)]:
        x = jnp.asarray(rng.randn(K, B, C, T).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(C, C, K_TAPS).astype(np.float32) * 0.05)
        for d in (1, 3, 9):
            flops = 2 * B * T * C * C * K_TAPS
            dt0 = timed(lambda xx: conv_ref(xx, w, d), x)
            line = (f"C={C:4d} d={d}: conv {dt0*1e3:7.3f} ms "
                    f"({flops/dt0/1e12:5.2f} TF/s)")
            for r in (2, 4):
                dt1 = timed(lambda xx: s2d_gemm(xx, w, d, r), x)
                line += (f"  gemm[r{r}] {dt1*1e3:7.3f} ({flops/dt1/1e12:5.2f},"
                         f" {dt0/dt1:4.2f}x)")
            print(line, flush=True)


if __name__ == "__main__":
    main()
