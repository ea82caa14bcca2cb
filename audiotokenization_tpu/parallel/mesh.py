"""Device mesh + sharding utilities.

The reference's only training parallelism is NCCL data-parallel via Lightning
DDP (BigCodec_SSL/train.py:34, SURVEY.md §2.8). The TPU-native equivalent is
a 1-D `Mesh(('data',))` spanning every chip (ICI within a slice, DCN across
hosts), the batch sharded along 'data', params/opt-state replicated, and the
gradient reductions emitted by XLA inside the single jitted step — no bucket
all-reduce machinery to own.

`initialize_distributed` wraps jax.distributed.initialize for multi-host
launches (same program on every host, torchrun equivalent).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host runtime init (no-op for single-process runs)."""
    if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()


def make_data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-resident batch dict onto the mesh, sharded on dim 0.

    Single-process: a plain device_put. Multi-process: each process holds
    only ITS stripe of the global batch (the loaders stripe the filelist),
    so the global array is assembled from per-process local shards — the
    jax-native equivalent of DDP's per-rank batches.
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def fsdp_sharding_for(mesh: Mesh, shape, *, axis: str = "data",
                      min_size: int = 2 ** 14) -> NamedSharding:
    """FSDP/ZeRO-3 placement rule for one parameter/optimizer leaf: shard the
    first axis divisible by the mesh size, replicate small or indivisible
    leaves. GSPMD then inserts the all-gather at each weight's use site and
    reduce-scatters its gradient — the XLA-native equivalent of
    FSDP/torch-ZeRO wrapper machinery (no wrapper needed).
    """
    n = mesh.shape[axis]
    size = int(np.prod(shape)) if shape else 0
    if size >= min_size:
        for i, d in enumerate(shape):
            if d % n == 0 and d >= n:
                spec = [None] * len(shape)
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_state_shardings(mesh: Mesh, abstract_state, *, axis: str = "data",
                         min_size: int = 2 ** 14):
    """Map a TrainState's abstract pytree (jax.eval_shape of
    init_train_state) to FSDP shardings; scalars/step stay replicated."""
    return jax.tree.map(
        lambda leaf: fsdp_sharding_for(mesh, getattr(leaf, "shape", ()),
                                       axis=axis, min_size=min_size),
        abstract_state)
