"""Full-train-step A/B at 0B4/B8 T2048 (text-only): WKV impl / chunk / remat.

Reproduces the round-2 step-composition measurement protocol (PROGRESS.md):
bf16 params + fp32 masters, stacked-layer layout, per-block remat, one v5e
chip. Timing is an async chain of --x steps with ONE device sync so host
dispatch overlaps (the tunnel adds ~10 ms/dispatch otherwise).

Usage:
  python scripts/perf/step_ab.py --impl auto            # head-layout fused
  python scripts/perf/step_ab.py --impl packed          # packed-lane kernels
  python scripts/perf/step_ab.py --impl auto --chunk 32 # (diverges in real
                                                        #  training; timing only)
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="auto",
                   choices=["auto", "pallas", "chunked", "packed"])
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--embd", type=int, default=1024)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--T", type=int, default=2048)
    p.add_argument("--accum", type=int, default=1,
                   help="in-jit gradient accumulation (lax.scan over micro-batches)")
    p.add_argument("--x", type=int, default=32, help="async chain length")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--stacked", type=int, default=1)
    p.add_argument("--wkv_block", type=int, default=1,
                   help="grid-block factor for the fused WKV path")
    p.add_argument("--kchunk", type=int, default=32,
                   help="fused-path kernel-chunk ceiling (solve stays capped)")
    p.add_argument("--remat", default="full",
                   choices=["full", "none", "dots", "wkv"])
    args = p.parse_args()

    from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.ops.wkv7 import (
        set_wkv_block,
        set_wkv_impl,
        set_wkv_kernel_chunk,
    )
    from visualrwkv_tpu.train.trainer import Trainer

    set_wkv_impl(args.impl)
    set_wkv_block(args.wkv_block)
    set_wkv_kernel_chunk(args.kchunk)

    vlm_cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=args.layers, n_embd=args.embd,
                        ctx_len=args.T, chunk_len=args.chunk),
        vision=VisionConfig(towers=()),
    )
    grad_cp = {"full": True, "none": False, "dots": "dots",
               "wkv": "wkv"}[args.remat]
    cfg = TrainConfig(
        micro_bsz=args.bsz, param_dtype="bfloat16",
        accumulate_grad_batches=args.accum,
        stacked_layers=bool(args.stacked), grad_cp=grad_cp,
        epoch_steps=100, epoch_count=1,
    )

    params = init_visualrwkv_params(jax.random.PRNGKey(0), vlm_cfg)
    tr = Trainer(vlm_cfg, cfg, params, proj_dir="/tmp/step_ab_out", log_every=10**9)

    rng = np.random.default_rng(0)
    eff = args.bsz * args.accum
    ids = jnp.asarray(rng.integers(0, 65536, (eff, args.T)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 65536, (eff, args.T)), jnp.int32)
    batch = {"input_ids": ids, "labels": labels, "images": None}

    st = tr.state
    p_, o_, s_ = st.params, st.opt_state, st.step
    t0 = time.perf_counter()
    p_, o_, s_, loss = tr.train_step(p_, o_, s_, batch)
    jax.block_until_ready(loss)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={float(loss):.3f}",
          flush=True)

    tok = args.bsz * args.accum * args.T
    for r in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.x):
            p_, o_, s_, loss = tr.train_step(p_, o_, s_, batch)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.x
        print(f"round {r}: {dt*1e3:8.1f} ms/step  {tok/dt:10.1f} tok/s  "
              f"loss={float(loss):.3f}", flush=True)
    print(f"RESULT impl={args.impl} chunk={args.chunk} remat={args.remat} "
          f"stacked={args.stacked}: {dt*1e3:.1f} ms/step {tok/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
