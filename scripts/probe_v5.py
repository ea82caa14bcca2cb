"""Probe + time T-major fused ResidualUnit variants on the TPU.

Finding so far: lane-axis jnp.concatenate inside a kernel crashes the remote
Mosaic compile (HTTP 500) for every C/tile tested; the 7-separate-dots
T-major form compiles. This script times the compiling variants against the
XLA oracle at the real encoder stage shapes, and probes a scratch-buffer
im2col (stores into lane ranges) as an alternative to concatenate.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HP = jax.lax.Precision.HIGHEST
    B, K = 32, 8
    rng = np.random.RandomState(0)

    def make_call(C, tile_t, mode, dilation=3):
        pad = 3 * dilation

        def kernel(cur_ref, nxt_ref, w7_ref, w1_ref, out_ref, tail_buf, *maybe_cols):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                tail_buf[:, :] = jnp.zeros_like(tail_buf)

            win = jnp.concatenate(
                [tail_buf[:, :], cur_ref[0], nxt_ref[0, :pad, :]], axis=0)
            s1 = jnp.sin(win)
            if mode == "7dots":
                y = jnp.zeros((tile_t, C), jnp.float32)
                for k in range(7):
                    y += jax.lax.dot_general(
                        s1[k * dilation:k * dilation + tile_t, :],
                        w7_ref[k * C:(k + 1) * C, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HP)
            elif mode == "scratch_im2col":
                cols = maybe_cols[0]
                for k in range(7):
                    cols[:, k * C:(k + 1) * C] = s1[k * dilation:k * dilation + tile_t, :]
                y = jax.lax.dot_general(
                    cols[:, :], w7_ref[:, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HP)
            z = jax.lax.dot_general(
                jnp.sin(y), w1_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP)
            out_ref[0] = cur_ref[0] + z
            tail_buf[:, :] = cur_ref[0, tile_t - pad:, :]

        @jax.jit
        def call(x, w7, w1):
            Bx, T, _ = x.shape
            t_pad = -(-T // tile_t) * tile_t
            nt = t_pad // tile_t
            xp = jnp.pad(x, ((0, 0), (0, t_pad - T + tile_t), (0, 0)))
            xp2 = jax.lax.optimization_barrier(xp + 0.0)
            scratch = [pltpu.VMEM((pad, C), jnp.float32)]
            if mode == "scratch_im2col":
                scratch.append(pltpu.VMEM((tile_t, 7 * C), jnp.float32))
            return pl.pallas_call(
                kernel,
                grid=(Bx, nt),
                in_specs=[
                    pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t + 1, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((7 * C, C), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, C), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Bx, t_pad, C), jnp.float32),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(xp, xp2, w7, w1)

        return call

    def xla_unit(x, w7o, w1o, dilation=3):
        # same math in NCH XLA ops (x is (B, C, T) here)
        y = jnp.sin(x)
        y = jax.lax.conv_general_dilated(
            y, w7o, (1,), [(3 * dilation, 3 * dilation)], rhs_dilation=(dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP)
        y = jnp.sin(y)
        y = jax.lax.conv_general_dilated(
            y, w1o, (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"), precision=HP)
        return x + y

    def timed(jf, *args):
        np.asarray(jf(*args)[0, 0, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*args)
            np.asarray(out[0, 0, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    stage_T = {48: 16000, 96: 8000, 192: 4000}
    for C in (48, 96, 192):
        T = stage_T[C]
        x_nch = jnp.asarray(rng.randn(K, B, C, T).astype(np.float32) * 0.1)
        x_tmj = jnp.swapaxes(x_nch, 2, 3).copy()
        w7o = jnp.asarray(rng.randn(C, C, 7).astype(np.float32) * 0.05)
        w1o = jnp.asarray(rng.randn(C, C, 1).astype(np.float32) * 0.05)
        w7t = jnp.transpose(w7o, (2, 1, 0)).reshape(7 * C, C)
        w1t = w1o[:, :, 0].T

        jf_xla = jax.jit(lambda xs, a=w7o, b=w1o: jax.lax.map(
            lambda x: xla_unit(x, a, b), xs))
        dt_xla = timed(lambda xs: jf_xla(xs)[:, :, 0], x_nch)
        print(f"C={C:4d} XLA             {dt_xla*1e3:8.3f} ms", flush=True)

        for mode in ("7dots", "scratch_im2col"):
            for tile in (512, 2048):
                try:
                    call = make_call(C, tile, mode)
                    jf = jax.jit(lambda xs, a=w7t, b=w1t, c=call: jax.lax.map(
                        lambda x: c(x, a, b), xs))
                    dt = timed(lambda xs: jf(xs)[:, :, 0], x_tmj)
                    print(f"C={C:4d} {mode:15s} tile={tile:5d} {dt*1e3:8.3f} ms  "
                          f"{dt_xla/dt:5.2f}x XLA", flush=True)
                except Exception as e:
                    msg = str(e).split("\n")[0][:110]
                    print(f"C={C:4d} {mode:15s} tile={tile:5d} FAIL: {msg}", flush=True)


if __name__ == "__main__":
    main()
