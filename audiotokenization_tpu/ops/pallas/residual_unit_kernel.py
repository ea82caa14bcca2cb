"""Pallas TPU kernel: fused BigCodec ResidualUnit.

The encoder/decoder hot loop is a stack of ResidualUnits
(reference: BigCodec_SSL/vq/module.py:74-89):

    out = x + W1 @ snake2( W7 *d snake1(x) ) + biases

Unfused, that's 4 HBM round trips of the (B, C, T) activation per unit
(snake -> conv7 -> snake -> conv1 -> add). This kernel keeps one (C, TILE_T)
window (plus the dilated-conv halo) and both weight tensors resident in VMEM
and performs the whole unit in a single pass: the k=7 dilated conv is 7
shifted (C,C)x(C,TILE_T) MXU matmuls accumulated in fp32, the snakes run on
the VPU between them, and only the final residual output is written back.

The overlapping halo window is DMA'd from HBM per grid step (double-buffered
by the pipeline); the weights' BlockSpecs have constant index maps, so they
are fetched once per launch and stay in VMEM across the whole (B x T) grid.
Supported for C <= 512 (VMEM budget: 7*C^2*4B for W7); the 768-channel stage
falls back to the XLA path, which is compute-bound there anyway
(conv-as-matmul measured at identical fp32 throughput to XLA's own lowering).

Numerics: fp32 with HIGHEST-precision dots — matches the XLA oracle to float
roundoff (tested in interpret mode and on device), safe for the token-parity
path. Inference/tokenize only (no custom VJP yet); training uses XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 512
_EPS = 1e-9
_HP = jax.lax.Precision.HIGHEST


def _win_size(pad: int) -> int:
    """Halo window, rounded up to the 128-lane tile so HBM slices stay aligned."""
    return -(-(TILE_T + 2 * pad) // 128) * 128


def _unit_kernel(dilation, xc_ref, xpad_hbm, w7_ref, b7_ref, w1_ref, b1_ref,
                 a1_ref, be1_ref, a2_ref, be2_ref, out_ref, win_scratch, sem):
    pad = 3 * dilation
    b = pl.program_id(0)
    t = pl.program_id(1)
    # lane-aligned halo window from the padded input in HBM (starts are
    # multiples of TILE_T=512; size padded to a multiple of 128)
    dma = pltpu.make_async_copy(
        xpad_hbm.at[b, :, pl.ds(t * TILE_T, _win_size(pad))],
        win_scratch, sem)
    dma.start()
    dma.wait()

    win = win_scratch[:, :TILE_T + 2 * pad]
    a1 = jnp.exp(a1_ref[:])[:, None]
    b1s = jnp.exp(be1_ref[:])[:, None]
    s = jnp.sin(win * a1)
    s1 = win + (1.0 / (b1s + _EPS)) * (s * s)

    acc = jnp.zeros((w7_ref.shape[0], TILE_T), jnp.float32)
    for k in range(7):
        acc += jax.lax.dot_general(
            w7_ref[:, :, k], s1[:, k * dilation:k * dilation + TILE_T],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP)
    y = acc + b7_ref[:][:, None]

    a2 = jnp.exp(a2_ref[:])[:, None]
    b2s = jnp.exp(be2_ref[:])[:, None]
    s = jnp.sin(y * a2)
    s2 = y + (1.0 / (b2s + _EPS)) * (s * s)

    z = jax.lax.dot_general(
        w1_ref[:, :, 0], s2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP) + b1_ref[:][:, None]
    out_ref[0] = xc_ref[0] + z


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_call(x, w7, b7, w1, b1, a1, be1, a2, be2, *, dilation, interpret):
    B, C, T = x.shape
    pad = 3 * dilation
    t_pad = -(-T // TILE_T) * TILE_T
    win = _win_size(pad)
    # right-pad so the last tile's aligned window stays in bounds
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, win - pad + t_pad - T)))
    xc = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - T)))
    grid = (B, t_pad // TILE_T)
    const = lambda b, t: (0,)
    out = pl.pallas_call(
        functools.partial(_unit_kernel, dilation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input stays in HBM
            pl.BlockSpec((C, C, 7), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 1), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, t_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, _win_size(pad)), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xc, xp, w7, b7, w1, b1, a1, be1, a2, be2)
    return out[:, :, :T]


def _unit_kernel_v2(dilation, prev_ref, cur_ref, next_ref, w7_ref, b7_ref,
                    w1_ref, b1_ref, a1_ref, be1_ref, a2_ref, be2_ref, out_ref):
    """Pipelined variant: halo assembled from neighbor blocks loaded through
    standard (double-buffered) BlockSpecs — no manual DMA stall."""
    pad = 3 * dilation
    win = jnp.concatenate(
        [prev_ref[0, :, TILE_T - pad:], cur_ref[0], next_ref[0, :, :pad]], axis=1)
    a1 = jnp.exp(a1_ref[:])[:, None]
    b1s = jnp.exp(be1_ref[:])[:, None]
    s = jnp.sin(win * a1)
    s1 = win + (1.0 / (b1s + _EPS)) * (s * s)

    acc = jnp.zeros((w7_ref.shape[0], TILE_T), jnp.float32)
    for k in range(7):
        acc += jax.lax.dot_general(
            w7_ref[:, :, k], s1[:, k * dilation:k * dilation + TILE_T],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP)
    y = acc + b7_ref[:][:, None]

    a2 = jnp.exp(a2_ref[:])[:, None]
    b2s = jnp.exp(be2_ref[:])[:, None]
    s = jnp.sin(y * a2)
    s2 = y + (1.0 / (b2s + _EPS)) * (s * s)

    z = jax.lax.dot_general(
        w1_ref[:, :, 0], s2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP) + b1_ref[:][:, None]
    out_ref[0] = cur_ref[0] + z


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_call_v2(x, w7, b7, w1, b1, a1, be1, a2, be2, *, dilation, interpret):
    B, C, T = x.shape
    t_pad = -(-T // TILE_T) * TILE_T
    # one guard tile of zeros on each side so t-1 / t+1 block reads are in range
    xp = jnp.pad(x, ((0, 0), (0, 0), (TILE_T, TILE_T + t_pad - T)))
    grid = (B, t_pad // TILE_T)
    const = lambda b, t: (0,)
    blk = lambda off: pl.BlockSpec((1, C, TILE_T), lambda b, t, off=off: (b, 0, t + off),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_unit_kernel_v2, dilation),
        grid=grid,
        in_specs=[
            blk(0), blk(1), blk(2),
            pl.BlockSpec((C, C, 7), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 1), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, t_pad), jnp.float32),
        interpret=interpret,
    )(xp, xp, xp, w7, b7, w1, b1, a1, be1, a2, be2)
    return out[:, :, :T]


def _unit_kernel_v3(dilation, cur_ref, w7_ref, b7_ref, w1_ref, b1_ref,
                    a1_ref, be1_ref, a2_ref, be2_ref, out_ref,
                    prev_buf, tail_buf):
    """Stencil-with-lag: ONE pipelined input stream; VMEM scratch carries the
    previous tile and the tail of the tile before it across sequential grid
    steps. At step t we emit the output for tile t-1, whose halo is
    [tail(t-2) | tile(t-1) | head(t)] — no overlapping block reads, no manual
    DMA stalls, pipeline double-buffering handled by Pallas."""
    pad = 3 * dilation
    t = pl.program_id(1)

    @pl.when(t >= 1)
    def _():
        win = jnp.concatenate(
            [tail_buf[:, :], prev_buf[:, :], cur_ref[0, :, :pad]], axis=1)
        a1 = jnp.exp(a1_ref[:])[:, None]
        b1s = jnp.exp(be1_ref[:])[:, None]
        s = jnp.sin(win * a1)
        s1 = win + (1.0 / (b1s + _EPS)) * (s * s)

        acc = jnp.zeros((w7_ref.shape[0], TILE_T), jnp.float32)
        for k in range(7):
            acc += jax.lax.dot_general(
                w7_ref[:, :, k], s1[:, k * dilation:k * dilation + TILE_T],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HP)
        y = acc + b7_ref[:][:, None]

        a2 = jnp.exp(a2_ref[:])[:, None]
        b2s = jnp.exp(be2_ref[:])[:, None]
        s = jnp.sin(y * a2)
        s2 = y + (1.0 / (b2s + _EPS)) * (s * s)

        z = jax.lax.dot_general(
            w1_ref[:, :, 0], s2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP) + b1_ref[:][:, None]
        out_ref[0] = prev_buf[:, :] + z

    # roll the stencil: tail <- prev tail, prev <- current tile
    tail_buf[:, :] = jax.lax.select(
        t >= 1, prev_buf[:, TILE_T - pad:],
        jnp.zeros((prev_buf.shape[0], pad), jnp.float32))
    prev_buf[:, :] = cur_ref[0]


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_call_v3(x, w7, b7, w1, b1, a1, be1, a2, be2, *, dilation, interpret):
    B, C, T = x.shape
    pad = 3 * dilation
    t_pad = -(-T // TILE_T) * TILE_T
    nt = t_pad // TILE_T
    # one extra zero tile on the right so the flush step's head-halo is zeros
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - T + TILE_T)))
    grid = (B, nt + 1)
    const = lambda b, t: (0,)
    out = pl.pallas_call(
        functools.partial(_unit_kernel_v3, dilation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 7), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 1), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, TILE_T),
            lambda b, t: (b, 0, jnp.maximum(t - 1, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, t_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, TILE_T), jnp.float32),
                        pltpu.VMEM((C, 3 * dilation), jnp.float32)],
        interpret=interpret,
    )(xp, w7, b7, w1, b1, a1, be1, a2, be2)
    return out[:, :, :T]


def _unit_kernel_v4(dilation, cur_ref, nxt_ref, w7_ref, b7_ref, w1_ref, b1_ref,
                    a1_ref, be1_ref, a2_ref, be2_ref, out_ref, tail_buf):
    """All-affine variant: streams (t, t+1) + a zero-initialized tail scratch
    carrying the previous tile's last `pad` columns. Every index map is
    affine, so Mosaic pipelines blocks normally (the v3 max(t-1,0) output map
    forced conservative full-row VMEM allocation)."""
    pad = 3 * dilation
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        tail_buf[:, :] = jnp.zeros_like(tail_buf)

    win = jnp.concatenate(
        [tail_buf[:, :], cur_ref[0], nxt_ref[0, :, :pad]], axis=1)
    a1 = jnp.exp(a1_ref[:])[:, None]
    b1s = jnp.exp(be1_ref[:])[:, None]
    s = jnp.sin(win * a1)
    s1 = win + (1.0 / (b1s + _EPS)) * (s * s)

    acc = jnp.zeros((w7_ref.shape[0], TILE_T), jnp.float32)
    for k in range(7):
        acc += jax.lax.dot_general(
            w7_ref[:, :, k], s1[:, k * dilation:k * dilation + TILE_T],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP)
    y = acc + b7_ref[:][:, None]

    a2 = jnp.exp(a2_ref[:])[:, None]
    b2s = jnp.exp(be2_ref[:])[:, None]
    s = jnp.sin(y * a2)
    s2 = y + (1.0 / (b2s + _EPS)) * (s * s)

    z = jax.lax.dot_general(
        w1_ref[:, :, 0], s2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP) + b1_ref[:][:, None]
    out_ref[0] = cur_ref[0] + z
    tail_buf[:, :] = cur_ref[0, :, TILE_T - pad:]


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_call_v4(x, w7, b7, w1, b1, a1, be1, a2, be2, *, dilation, interpret):
    B, C, T = x.shape
    pad = 3 * dilation
    t_pad = -(-T // TILE_T) * TILE_T
    nt = t_pad // TILE_T
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - T + TILE_T)))  # right zero tile
    # distinct buffers for the two shifted streams: passing one aliased array
    # twice appears to defeat Mosaic's block windowing (whole rows staged)
    xp2 = jax.lax.optimization_barrier(xp + 0.0)
    grid = (B, nt)
    const = lambda b, t: (0,)
    out = pl.pallas_call(
        functools.partial(_unit_kernel_v4, dilation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 7), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C, 1), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE_T), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, t_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, 3 * dilation), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, xp2, w7, b7, w1, b1, a1, be1, a2, be2)
    return out[:, :, :T]


def _unit_kernel_v5(dilation, tile_t, cur_ref, nxt_ref, w7_ref, b7_ref,
                    w1_ref, b1_ref, a1_ref, be1_ref, a2_ref, be2_ref,
                    out_ref, tail_buf):
    """T-major (NHC) im2col variant. Activations are (T, C) tiles: the 7
    dilated taps become SUBLANE slices (cheap) instead of lane rotations, and
    they concatenate along lanes into an im2col block (TILE, 7C) so the k=7
    conv is ONE dot with contraction depth 7C — much better MXU utilization
    than seven K=C dots when C < 128. Streaming halo identical to v4:
    (t, t+1) input streams + zero-init tail scratch, all-affine index maps."""
    pad = 3 * dilation
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        tail_buf[:, :] = jnp.zeros_like(tail_buf)

    win = jnp.concatenate(
        [tail_buf[:, :], cur_ref[0], nxt_ref[0, :pad, :]], axis=0)
    a1 = jnp.exp(a1_ref[:])[None, :]
    b1s = jnp.exp(be1_ref[:])[None, :]
    s = jnp.sin(win * a1)
    s1 = win + (1.0 / (b1s + _EPS)) * (s * s)

    # im2col along lanes: (TILE, 7*C), k-major to match w7 (7*C, C) layout
    cols = jnp.concatenate(
        [s1[k * dilation:k * dilation + tile_t, :] for k in range(7)], axis=1)
    y = jax.lax.dot_general(
        cols, w7_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP) + b7_ref[:][None, :]

    a2 = jnp.exp(a2_ref[:])[None, :]
    b2s = jnp.exp(be2_ref[:])[None, :]
    s = jnp.sin(y * a2)
    s2 = y + (1.0 / (b2s + _EPS)) * (s * s)

    z = jax.lax.dot_general(
        s2, w1_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HP) + b1_ref[:][None, :]
    out_ref[0] = cur_ref[0] + z
    tail_buf[:, :] = cur_ref[0, tile_t - pad:, :]


@functools.partial(jax.jit, static_argnames=("dilation", "interpret", "tile_t"))
def _fused_call_v5(x, w7, b7, w1, b1, a1, be1, a2, be2, *, dilation, interpret,
                   tile_t=2048):
    """x: (B, C, T) in, (B, C, T) out; internally runs T-major."""
    B, C, T = x.shape
    pad = 3 * dilation
    t_pad = -(-T // tile_t) * tile_t
    nt = t_pad // tile_t
    xt = jnp.swapaxes(x, 1, 2)  # (B, T, C)
    xp = jnp.pad(xt, ((0, 0), (0, t_pad - T + tile_t), (0, 0)))
    xp2 = jax.lax.optimization_barrier(xp + 0.0)  # distinct buffer (see v4)
    # w7 (C_out, C_in, 7) -> (7*C_in, C_out), k-major rows to match the im2col
    w7t = jnp.transpose(w7, (2, 1, 0)).reshape(7 * C, C)
    w1t = w1[:, :, 0].T
    grid = (B, nt)
    const = lambda b, t: (0,)
    out = pl.pallas_call(
        functools.partial(_unit_kernel_v5, dilation, tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7 * C, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * dilation, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, xp2, w7t, b7, w1t, b1, a1, be1, a2, be2)
    return jnp.swapaxes(out[:, :T, :], 1, 2)


def fused_residual_unit(x, params, *, dilation: int, interpret: bool | None = None,
                        version: int = 1):
    """Fused ResidualUnit.

    Measured on one v5e chip (B=32, fp32-HIGHEST): XLA's unfused lowering
    already hits the fp32 matmul ceiling for C >= 192 (conv-as-matmul A/B is
    throughput-identical), so this kernel is an exact-numerics capability,
    not the default path — v1 (manual-DMA halo) runs ~0.45x XLA at C=96; v2
    (pipelined neighbor blocks) currently exceeds Mosaic's scoped-VMEM stack
    and needs tile tuning. models/bigcodec keeps the XLA path as default.
    """
    """Drop-in replacement for models.bigcodec.residual_unit (non-causal,
    non-antialiased, inference). x: (B, C, T) fp32."""
    from ..conv import get_weight

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w7 = get_weight(params["conv1"]).astype(jnp.float32)
    w1 = get_weight(params["conv2"]).astype(jnp.float32)
    call = {1: _fused_call, 2: _fused_call_v2, 3: _fused_call_v3,
            4: _fused_call_v4, 5: _fused_call_v5}[version]
    return call(
        x.astype(jnp.float32), w7, params["conv1"]["b"].astype(jnp.float32),
        w1, params["conv2"]["b"].astype(jnp.float32),
        params["snake1"]["alpha"].astype(jnp.float32),
        params["snake1"]["beta"].astype(jnp.float32),
        params["snake2"]["alpha"].astype(jnp.float32),
        params["snake2"]["beta"].astype(jnp.float32),
        dilation=dilation, interpret=interpret)


def fusable(params, x) -> bool:
    """Kernel applicability: non-causal k7 ResidualUnit with C <= 512 (VMEM)."""
    from ..conv import get_weight

    C = x.shape[1]
    return C <= 512 and get_weight(params["conv1"]).shape[-1] == 7
