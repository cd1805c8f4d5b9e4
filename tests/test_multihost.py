"""Multi-host training: 2 simulated processes vs single-process reference.

The reference trains multi-node via DeepSpeed data parallelism
(``--num_nodes``, VisualRWKV-v7/v7.00/train.py:75,98); our equivalent is
JAX's multi-controller runtime (jax.distributed.initialize + gloo CPU
collectives here) with each host feeding its process-local batch slice.
This test spawns 2 real OS processes with 2 virtual CPU devices each,
trains 2 steps over the joint 4-device mesh, and checks the loss matches a
single-process 4-device run on the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, nproc, port, outfile):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), outfile],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"loss_{i}.txt") for i in range(2)]
    procs = [_spawn(i, 2, port, outs[i]) for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-3000:]
    losses = [float(open(o).read()) for o in outs]
    # both controllers observe the same (replicated) global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    ref_out = str(tmp_path / "loss_ref.txt")
    proc = _spawn(0, 1, port, ref_out)
    lg = proc.communicate(timeout=600)[0].decode()
    assert proc.returncode == 0, lg[-3000:]
    ref = float(open(ref_out).read())
    assert np.isfinite(ref)
    # same global batch, same mesh size -> same training trajectory
    assert losses[0] == pytest.approx(ref, rel=2e-4), (losses, ref)
