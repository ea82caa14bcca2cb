"""Probe which feature of the v5 kernel crashes the remote Mosaic compile.

Tries small variations (tile size, with/without lane-concat im2col, padded C)
at one stage shape and reports compile+run success for each. Run standalone
on the TPU (each attempt costs a remote compile).
"""
import functools
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HP = jax.lax.Precision.HIGHEST

    def make_call(C, tile_t, im2col, semantics):
        pad = 9

        def kernel(cur_ref, nxt_ref, w7_ref, w1_ref, out_ref, tail_buf):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                tail_buf[:, :] = jnp.zeros_like(tail_buf)

            win = jnp.concatenate(
                [tail_buf[:, :], cur_ref[0], nxt_ref[0, :pad, :]], axis=0)
            s1 = jnp.sin(win)
            if im2col:
                cols = jnp.concatenate(
                    [s1[k * 3:k * 3 + tile_t, :] for k in range(7)], axis=1)
                y = jax.lax.dot_general(
                    cols, w7_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HP)
            else:
                y = jnp.zeros((tile_t, C), jnp.float32)
                for k in range(7):
                    y += jax.lax.dot_general(
                        s1[k * 3:k * 3 + tile_t, :], w7_ref[k * C:(k + 1) * C, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=HP)
            z = jax.lax.dot_general(
                jnp.sin(y), w1_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP)
            out_ref[0] = cur_ref[0] + z
            tail_buf[:, :] = cur_ref[0, tile_t - pad:, :]

        @jax.jit
        def call(x, w7, w1):
            B, T, _ = x.shape
            t_pad = -(-T // tile_t) * tile_t
            nt = t_pad // tile_t
            xp = jnp.pad(x, ((0, 0), (0, t_pad - T + tile_t), (0, 0)))
            xp2 = jax.lax.optimization_barrier(xp + 0.0)
            cp = {}
            if semantics:
                cp["compiler_params"] = pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"))
            return pl.pallas_call(
                kernel,
                grid=(B, nt),
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
                out_shape=jax.ShapeDtypeStruct((B, t_pad, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((pad, C), jnp.float32)],
                **cp,
            )(xp, xp2, w7, w1)

        return call

    rng = np.random.RandomState(0)
    cases = [
        ("C=96 tile=512 7dots sem", 96, 512, False, True),
        ("C=96 tile=512 im2col sem", 96, 512, True, True),
        ("C=96 tile=2048 im2col sem", 96, 2048, True, True),
        ("C=96 tile=512 im2col nosem", 96, 512, True, False),
        ("C=128 tile=512 im2col sem", 128, 512, True, True),
        ("C=48 tile=512 7dots sem", 48, 512, False, True),
    ]
    for name, C, tile_t, im2col, sem in cases:
        try:
            call = make_call(C, tile_t, im2col, sem)
            x = jnp.asarray(rng.randn(4, 4096, C).astype(np.float32))
            w7 = jnp.asarray(rng.randn(7 * C, C).astype(np.float32) * 0.05)
            w1 = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
            out = call(x, w7, w1)
            np.asarray(out[0, 0, :1])
            print(f"OK    {name}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL  {name}: {msg}", flush=True)


if __name__ == "__main__":
    main()
