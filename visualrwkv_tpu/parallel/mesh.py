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


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_seq: int = 1) -> Mesh:
    """(data, seq, model) mesh; seq is the context-parallel axis
    (ops.wkv_sp) and defaults to 1 so 2-axis callers are unchanged."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    devs = np.asarray(devices[: n_data * n_seq * n_model]).reshape(
        n_data, n_seq, n_model
    )
    return Mesh(devs, ("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading dim = batch) on the mesh.

    Single-process: a plain device_put with the batch sharding.  Multi-host
    (``jax.process_count() > 1``): each process passes only its LOCAL shard
    of the global batch and the shards are assembled into one global
    jax.Array spanning all hosts' devices — the multi-controller analog of
    the reference's per-rank DataLoader under DeepSpeed DP.
    """
    sh = batch_sharding(mesh)
    # context parallelism: 2-D [B, T] token/label arrays also shard T over
    # the seq axis (other leaves — images etc. — stay batch-sharded only)
    sh_seq = NamedSharding(mesh, P("data", "seq"))
    seq_par = mesh.shape.get("seq", 1) > 1
    multiproc = jax.process_count() > 1

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return x
        s = sh_seq if (seq_par and x.ndim == 2) else sh
        if multiproc:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

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


def tensor_parallel_sharding(params: Params, mesh: Mesh):
    """Megatron-style tensor parallelism over the ``model`` axis for RWKV.

    Head-dim sharding: Tmix receptance/key/value/gate produce head-sharded
    activations (the WKV recurrence is independent per head, so it partitions
    cleanly as long as the model axis divides n_head), the output projection
    contracts the sharded dim back; ChannelMix shards its 4x hidden dim; the
    vocab head shards the vocabulary; the wide vision projector shards its
    input dim. Everything else stays replicated — GSPMD inserts the
    all-reduces.

    The fused Pallas WKV kernels are SPMD-partitioned per (batch, head) via
    shard_map (``ops.wkv7.wkv_spmd``, applied automatically by the trainer;
    tests/test_spmd_wkv.py) and stay fused under a model axis > 1 as long as
    the axis divides the head count; when it does not, fall back to
    ``ops.wkv7.set_wkv_impl("chunked")``.
    """
    n_model = mesh.shape["model"]

    def spec(path, x):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if getattr(x, "ndim", 0) != 2 or n_model == 1:
            return replicated(mesh)
        tail = keys[-2] if len(keys) >= 2 else ""
        shard_out = NamedSharding(mesh, P(None, "model"))
        shard_in = NamedSharding(mesh, P("model", None))
        if tail == "head" and x.shape[1] % n_model == 0:
            return shard_out
        if "att" in keys:
            if tail in ("receptance", "key", "value", "gate") and x.shape[1] % n_model == 0:
                return shard_out
            if tail == "output" and x.shape[0] % n_model == 0:
                return shard_in
        if "ffn" in keys or "ffn_v" in keys:
            if tail == "key" and x.shape[1] % n_model == 0:
                return shard_out
            if tail == "value" and x.shape[0] % n_model == 0:
                return shard_in
        if tail in ("o_proj", "gate") and keys[0] == "proj" and x.shape[0] % n_model == 0:
            return shard_in
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec, params)
