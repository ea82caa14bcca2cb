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
    """Place a host-resident batch dict onto the mesh, sharded on dim 0."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
