"""Pallas TPU kernel: fused L2-normalize + distance + argmin codebook search.

The tokenizer's inner loop (reference: BigCodec_SSL/vq/
factorized_vector_quantize.py:93-108) computes, for every latent frame e and
codebook c (both L2-normalized), the expanded squared distance
``||e||^2 - 2 e.c + ||c||^2`` over all 8192 codes and takes argmax(-dist).

On TPU we fuse the whole search into one kernel: the (padded) codebook lives
in VMEM for the kernel's lifetime, each grid step streams a tile of frames,
normalizes them on the VPU, runs one (TILE_M x 128) x (128 x N) MXU matmul for
the cross terms and reduces to indices on-chip — the (M x N) distance matrix
never touches HBM. Distances are fp32 with the exact reference formula
(including the ~1.0 ``||e||^2`` / ``||c||^2`` terms, which matter for
bit-exact tie behavior), and ties resolve to the lowest index like torch.

The XLA path in models/quantizers/factorized_vq.py is the correctness oracle;
`test_pallas_vq.py` checks equivalence, and on non-TPU backends the wrapper
transparently falls back to it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
LANES = 128


def _vq_argmin_kernel(enc_ref, cbn_t_ref, sc_ref, idx_ref):
    enc = enc_ref[:].astype(jnp.float32)  # (TILE_M, D_pad)
    # L2 normalize rows: F.normalize = x / max(||x||, 1e-12)
    norm = jnp.sqrt(jnp.sum(enc * enc, axis=1, keepdims=True))
    enc_n = enc / jnp.maximum(norm, 1e-12)
    se = jnp.sum(enc_n * enc_n, axis=1, keepdims=True)  # (TILE_M, 1), ~1.0
    # fp32 inputs + HIGHEST: exact fp32 MXU accumulation, pinned explicitly so
    # the ambient jax.default_matmul_precision cannot change kernel numerics
    # (Mosaic also rejects the intermediate HIGH setting).
    cross = jnp.dot(enc_n, cbn_t_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    dist = se - 2.0 * cross + sc_ref[:]  # (TILE_M, N)
    idx_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vq_argmin_call(enc_pad, cbn_t, sc, *, interpret: bool):
    m_pad = enc_pad.shape[0]
    n = cbn_t.shape[1]
    grid = (m_pad // TILE_M,)
    return pl.pallas_call(
        _vq_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        interpret=interpret,
    )(enc_pad, cbn_t, sc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _vq_argmin_nondiff(enc, cbn_t, sc, interpret):
    return _vq_argmin_call(enc, cbn_t, sc, interpret=interpret)


def _vq_argmin_fwd(enc, cbn_t, sc, interpret):
    shapes = (enc.shape, cbn_t.shape, sc.shape)
    return _vq_argmin_nondiff(enc, cbn_t, sc, interpret), shapes


def _vq_argmin_bwd(interpret, shapes, g):
    # integer argmin output: zero cotangents (the surrounding VQ uses a
    # straight-through estimator; no gradient flows through the index search)
    import jax.numpy as _jnp

    return tuple(_jnp.zeros(s, _jnp.float32) for s in shapes)


_vq_argmin_nondiff.defvjp(_vq_argmin_fwd, _vq_argmin_bwd)


def vq_argmin(enc, codebook, *, interpret: bool | None = None):
    """enc: (M, D) fp32 latents; codebook: (N, D). Returns (M,) int32 indices.

    D is zero-padded to the 128-lane width (zeros don't perturb norms or dot
    products); M is padded to the tile size and trimmed after. Wrapped in a
    custom_vjp so the kernel is transparent to reverse-mode autodiff (the VQ
    straight-through estimator never differentiates the index search).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, d = enc.shape
    n = codebook.shape[0]
    if d > LANES or n % LANES != 0:
        # odd geometry — use the XLA oracle path
        from ...models.quantizers.factorized_vq import nearest_code_indices

        return nearest_code_indices(enc.T[None], codebook, use_pallas=False)[0]

    enc = enc.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    cb_norm = jnp.sqrt(jnp.sum(cb * cb, axis=1, keepdims=True))
    cb_n = cb / jnp.maximum(cb_norm, 1e-12)
    sc = jnp.sum(cb_n * cb_n, axis=1)[None, :]  # (1, N)
    cbn_t = jnp.pad(cb_n, ((0, 0), (0, LANES - d))).T  # (128, N)

    m_pad = -(-m // TILE_M) * TILE_M
    enc_pad = jnp.pad(enc, ((0, m_pad - m), (0, LANES - d)))
    idx = _vq_argmin_nondiff(enc_pad, cbn_t, sc, interpret)
    return idx[:m, 0]
