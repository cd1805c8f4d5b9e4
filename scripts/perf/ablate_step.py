"""Train-step composition ablation at 0B4 shapes (profiler-free).

The axon tunnel exposes no device profiler, so composition is measured by
differencing jitted sub-programs:

  fwd        — training_loss value only (primal forward + CE)
  fwd_nohead — hidden-state forward only (CE+head ablated)
  grad       — value_and_clipped_grads (fwd + remat re-forward + backward)
  step       — full train step (grad + optimizer update)

Usage: python scripts/perf/ablate_step.py [--bsz 8 --layers 24 --embd 1024]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_fetch(f, *args, reps=8, warmup=2):
    """Chain reps dispatches (args constant, but each call's output is
    fetched once at the end via the LAST value) — per the verify skill's
    timing rules: one scalar fetch syncs the whole chain."""
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    # sync via scalar fetch (block_until_ready only acks on the tunnel)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--embd", type=int, default=1024)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--T", type=int, default=2048)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models import lm
    from visualrwkv_tpu.models.rwkv7 import stack_blocks
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params, training_loss
    from visualrwkv_tpu.train.optim import value_and_clipped_grads

    vlm_cfg = VLMConfig(
        rwkv=RWKVConfig(n_layer=args.layers, n_embd=args.embd, ctx_len=args.T),
        vision=VisionConfig(towers=()),
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), vlm_cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, params)
    params = dict(params)
    params["rwkv"] = stack_blocks(params["rwkv"])

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 65536, (args.bsz, args.T)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 65536, (args.bsz, args.T)), jnp.int32)
    tok = args.bsz * args.T

    fwd = jax.jit(lambda p: training_loss(p, vlm_cfg, ids, labels, None, grad_cp=True))

    def hidden_only(p):
        from visualrwkv_tpu.models.visualrwkv import vlm_forward

        h = vlm_forward(p, vlm_cfg, ids, None, grad_cp=True, return_hidden=True)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    fwd_nohead = jax.jit(hidden_only)

    def touch_all(grads):
        # reduce EVERY grad leaf into the output so XLA cannot dead-code-
        # eliminate any weight-grad branch of the backward
        return sum(
            jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads)
        )

    def grad_leg(p):
        loss, grads = value_and_clipped_grads(
            lambda pp, micro: training_loss(pp, vlm_cfg, micro["input_ids"],
                                            micro["labels"], None, grad_cp=True),
            p, {"input_ids": ids, "labels": labels}, 1, grad_clip=0.0,
        )
        # return both so the backward stays live (0.0*sum would fold away)
        return loss, touch_all(grads)

    grad = jax.jit(grad_leg)
    grad_nohead = jax.jit(lambda p: touch_all(jax.grad(hidden_only)(p)))

    for name, f in [("fwd(loss)", fwd), ("fwd(no head/CE)", fwd_nohead),
                    ("grad(loss)", grad), ("grad(no head/CE)", grad_nohead)]:
        try:
            dt = timeit_fetch(f, params, reps=args.reps)
            print(f"{name:<18} {dt:8.1f} ms  ({tok/dt*1e3:9.0f} tok/s)", flush=True)
        except Exception as e:
            print(f"{name:<18} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
