"""Device mesh + sharding rules.

The reference's only training parallelism is data parallelism via
DeepSpeed-ZeRO stages (SURVEY §2.4); the TPU-native equivalent is a 1-D
``data`` mesh over ICI with the batch sharded and parameters replicated
(ZeRO-0/DDP), optimizer state sharded (ZeRO-1), or parameters also sharded
(ZeRO-3/FSDP analog).  XLA inserts the all-reduce / all-gather /
reduce-scatter collectives from the sharding annotations.

A second ``model`` axis is provisioned for tensor-parallel sharding of the
wide projector and vocab head at larger scales.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading dim = batch) on the mesh."""
    sh = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, batch)


def _shardable_axis(shape, n: int, min_size: int) -> Optional[int]:
    if int(np.prod(shape)) < min_size:
        return None
    for axis, dim in enumerate(shape):
        if dim % n == 0 and dim >= n:
            return axis
    return None


def zero_sharding(tree: Params, mesh: Mesh, min_size: int = 2**16):
    """ZeRO-style leaf sharding: split each large-enough leaf's first divisible
    axis across the data axis; small leaves stay replicated.

    Used for optimizer state (ZeRO-1) or parameters (ZeRO-3/FSDP analog).
    """
    n = mesh.shape["data"]

    def spec(x):
        if not hasattr(x, "shape"):
            return replicated(mesh)
        axis = _shardable_axis(x.shape, n, min_size)
        if axis is None:
            return replicated(mesh)
        parts: list = [None] * len(x.shape)
        parts[axis] = "data"
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, tree)


def replicated_sharding(tree: Params, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, tree)
