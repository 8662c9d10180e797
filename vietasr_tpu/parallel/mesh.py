"""Device mesh + sharding helpers.

The reference's one parallelism strategy is data parallelism via per-module
DDP over NCCL (/root/reference/nemo/backends/pytorch/actions.py:1188-1272).
Here DP is a 1-axis `jax.sharding.Mesh('data')`: the batch is sharded with
NamedSharding(P('data')), params are replicated, and jit emits the gradient
psum over ICI that DDP's allreduce did. A `model` axis is reserved for
tensor-parallel sharding of larger models (the Conformer upgrade); the 13M
QuartzNet replicates comfortably.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1- or 2-axis mesh ('data'[, 'model']) over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    if num_data * num_model != len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict with the leading axis sharded over 'data'."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh):
    """(state_sharding, batch_sharding) NamedShardings for jit in/out specs."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    return rep, dp
