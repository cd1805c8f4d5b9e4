"""Multi-host (multi-process) training support.

The reference trains multi-node with PyTorch-Lightning/DeepSpeed data
parallelism: ``--num_nodes N`` spawns one NCCL rank per GPU and DeepSpeed
all-reduces gradients (reference VisualRWKV-v7/v7.00/train.py:75,98 and
scripts/train/*.sh).  The TPU-native equivalent is JAX's multi-controller
model: every host runs the SAME program, ``jax.distributed.initialize``
joins them into one runtime, the mesh spans all hosts' devices over
ICI/DCN, and each host feeds only its process-local shard of the global
batch — XLA's compiled collectives (the same ones single-host sharding
inserts) do the gradient all-reduce across hosts.

Single-process runs are the ``num_processes == 1`` degenerate case; every
helper here degrades to a no-op so the rest of the codebase can call them
unconditionally.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)

# Environment variables mirroring the reference's node flags (train.py:75:
# --num_nodes; rank/address come from the launcher there, here from env).
ENV_COORDINATOR = "VRWKV_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "VRWKV_NUM_PROCESSES"
ENV_PROCESS_ID = "VRWKV_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join this process into a multi-controller JAX runtime.

    Arguments fall back to ``VRWKV_COORDINATOR_ADDRESS`` /
    ``VRWKV_NUM_PROCESSES`` / ``VRWKV_PROCESS_ID`` env vars (and from there
    to JAX's own auto-detection on supported cluster environments).  Returns
    True if a multi-process runtime was initialized, False for the
    single-process no-op.  Must run before first backend use.
    """
    coordinator_address = coordinator_address or os.environ.get(ENV_COORDINATOR)
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    # NOTE: nothing here may touch the backend (jax.devices/process_count/
    # default_backend all initialize XLA) before jax.distributed.initialize.
    from jax._src import distributed as _jd

    if getattr(_jd.global_state, "client", None) is not None:
        return True  # already initialized
    platforms = str(jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in platforms:
        # cross-process CPU collectives need the gloo transport
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # flag name drift across jax versions
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_size(global_batch_size: int) -> int:
    """Per-host share of the global batch (reference real_bsz = nodes *
    devices * micro_bsz, train.py:98 — each host materializes only its own
    micro-batches)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process count {n}"
        )
    return global_batch_size // n
