"""Worker process for the multi-host training test.

Run as: python multihost_worker.py <process_id> <num_processes> <port> <outfile>

Each process exposes ``devices_per_proc`` virtual CPU devices, joins the
distributed runtime, and trains 2 steps of a tiny VLM over the GLOBAL mesh,
feeding only its process-local slice of a deterministic global batch — the
multi-controller analog of the reference's ``--num_nodes`` DeepSpeed DP
(VisualRWKV-v7/v7.00/train.py:75,98). Writes the final loss to <outfile>.
"""

import os
import sys

DEVICES_PER_PROC = 2
GLOBAL_BATCH = 4
T = 64
STEPS = 2


def main():
    pid, nproc, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    n_local = DEVICES_PER_PROC if nproc > 1 else GLOBAL_BATCH
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from visualrwkv_tpu.parallel import distributed

    if nproc > 1:
        assert distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
        assert jax.process_count() == nproc
        assert jax.device_count() == nproc * DEVICES_PER_PROC

    import numpy as np

    from __graft_entry__ import _tiny_vlm_cfg
    from visualrwkv_tpu.config import TrainConfig
    from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.parallel.mesh import make_mesh
    from visualrwkv_tpu.train.trainer import Trainer

    cfg = _tiny_vlm_cfg(n_layer=2, n_embd=128)
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(
        lr_init=1e-3, lr_final=1e-3, epoch_steps=STEPS, epoch_count=1,
        micro_bsz=1, grad_cp=True, zero_stage=1,
    )
    mesh = make_mesh(n_data=jax.device_count())
    trainer = Trainer(cfg, tcfg, params, mesh=mesh)

    # deterministic GLOBAL batch; this process feeds its contiguous row slice
    # (global device order = process order for the host-platform backend)
    rng = np.random.default_rng(0)
    ids_g = rng.integers(10, 1000, (GLOBAL_BATCH, T)).astype(np.int64)
    ids_g[:, : cfg.num_token_per_image] = IMAGE_TOKEN_INDEX
    labels_g = np.where(ids_g == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids_g)
    images_g = rng.integers(0, 255, (GLOBAL_BATCH, 64, 64, 3)).astype(np.uint8)
    local = distributed.local_batch_size(GLOBAL_BATCH)
    lo = jax.process_index() * local
    batch = {
        "input_ids": ids_g[lo : lo + local],
        "labels": labels_g[lo : lo + local],
        "images": {"dino": images_g[lo : lo + local]},
    }
    loss = trainer.run_epoch(lambda s: batch, epoch=0)
    with open(outfile, "w") as f:
        f.write(repr(float(loss)))


if __name__ == "__main__":
    main()
