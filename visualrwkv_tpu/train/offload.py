"""Streamed host-offloaded optimizer (DeepSpeedCPUAdam analog, working at
model scales where the optimizer state exceeds HBM).

The reference offloads Adam to host RAM via DeepSpeedCPUAdam
(src/model.py:360-366). On TPU the equivalent must bound DEVICE residency:
a whole-tree in-jit ``device_put`` round-trip materializes the full fp32
masters+moments (~18 GB at 1B5) in HBM at once — measured HBM OOM — and XLA
buffers ``lax.scan`` outputs on device, so an in-jit scan cannot write the
updated state back to host incrementally (measured: 20 GB scan-ys to
pinned_host OOMs). What works is a HOST-LEVEL loop: optimizer state lives in
pinned host memory grouped per block; each step runs one jitted update per
group whose inputs/outputs carry host shardings, so only ONE block's
optimizer state (~0.8 GB at 1B5) is device-resident at a time. Blocks 1..L-1
share a pytree structure, so the whole loop needs three compilations
(block 0 / shared block / everything-else).

Gradient clipping is global: the grad step computes the fp32 global norm and
pre-scales gradients (clip_by_global_norm_f32 semantics) before the grouped
updates, whose optimizers are built with clipping disabled.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from visualrwkv_tpu.config import TrainConfig, VLMConfig
from visualrwkv_tpu.train.optim import make_optimizer, trainable_mask

Params = Any


def _split_groups(params: Params):
    """(block0, [block1..L-1], rest) — rest keeps the original tree shape with
    blocks removed so path-dependent masks still see real root names."""
    blocks = params["rwkv"]["blocks"]
    rest = {k: v for k, v in params.items() if k != "rwkv"}
    rest["rwkv"] = {k: v for k, v in params["rwkv"].items() if k != "blocks"}
    return blocks[0], list(blocks[1:]), rest


def _merge_groups(block0, blocks_rest, rest) -> Params:
    out = dict(rest)
    out["rwkv"] = dict(rest["rwkv"])
    out["rwkv"]["blocks"] = [block0, *blocks_rest]
    return out


class StreamedOffloadOptimizer:
    """Host-resident optimizer state + per-group streamed updates."""

    def __init__(self, cfg: TrainConfig, vlm_cfg: VLMConfig, params: Params,
                 total_steps: int, mesh):
        n_layer = vlm_cfg.rwkv.n_layer
        if "blocks" not in params.get("rwkv", {}):
            raise ValueError("streamed offload requires the list-of-blocks layout")
        self.mesh = mesh
        kind = "pinned_host" if jax.default_backend() == "tpu" else "device"
        self._host = NamedSharding(mesh, P(), memory_kind=kind)
        self._dev = NamedSharding(mesh, P())

        cfg_noclip = dataclasses.replace(cfg, grad_clip=0.0)
        full_mask = trainable_mask(params, cfg, n_layer)
        b0_m, bs_m, rest_m = _split_groups(full_mask)
        b0_p, bs_p, rest_p = _split_groups(params)

        # block groups: paths lose the rwkv/blocks prefix, so the sliced
        # global mask (extra_trainable_mask) carries ALL freezing decisions;
        # the rest group keeps real root names, so pass the real n_layer
        # (n_layer=0 would trip the freeze_rwkv_layers >= n_layer whole-model
        # freeze on its rwkv subtree)
        self.opt_b0 = make_optimizer(cfg_noclip, b0_p, total_steps, n_layer,
                                     extra_trainable_mask=b0_m)
        self.opt_blk = make_optimizer(cfg_noclip, bs_p[0], total_steps, n_layer,
                                      extra_trainable_mask=bs_m[0])
        self.opt_rest = make_optimizer(cfg_noclip, rest_p, total_steps, n_layer,
                                       extra_trainable_mask=rest_m)
        # per-layer masks may differ (freeze_rwkv_layers); require uniformity
        for m in bs_m[1:]:
            if jax.tree_util.tree_leaves(m) != jax.tree_util.tree_leaves(bs_m[0]):
                raise ValueError("streamed offload needs uniform block masks "
                                 "(partial layer freeze unsupported)")

        def host_init(opt, p):
            shape = jax.eval_shape(opt.init, p)
            shardings = jax.tree_util.tree_map(lambda _: self._host, shape)
            return jax.jit(opt.init, out_shardings=shardings)(p)

        self.state_b0 = host_init(self.opt_b0, b0_p)
        self.state_blocks = [host_init(self.opt_blk, b) for b in bs_p]
        self.state_rest = host_init(self.opt_rest, rest_p)

        def make_update(opt, params_template, opt_template):
            def upd(grads_g, opt_g, params_g):
                # host-space inputs can't mix with device operands: stream the
                # group's state in explicitly (out_shardings streams it back)
                opt_g = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self._dev) if hasattr(x, "shape") else x,
                    opt_g,
                )
                updates, new_opt = opt.update(grads_g, opt_g, params_g)
                return optax.apply_updates(params_g, updates), new_opt

            out_sh = (
                jax.tree_util.tree_map(lambda _: self._dev, params_template),
                jax.tree_util.tree_map(lambda _: self._host, opt_template),
            )
            # ONE jit per group structure (blocks 1..L-1 share it)
            return jax.jit(upd, out_shardings=out_sh, donate_argnums=(1, 2))

        self._upd_b0 = make_update(self.opt_b0, b0_p, self.state_b0)
        self._upd_blk = make_update(self.opt_blk, bs_p[0], self.state_blocks[0])
        self._upd_rest = make_update(self.opt_rest, rest_p, self.state_rest)

    def apply(self, grads: Params, params: Params) -> Params:
        """One optimizer step: per-group streamed updates; returns new params.
        Gradients must already be globally clipped/scaled."""
        g0, gbs, grest = _split_groups(grads)
        p0, pbs, prest = _split_groups(params)
        new_p0, self.state_b0 = self._upd_b0(g0, self.state_b0, p0)
        new_blocks = []
        for i, (g, p) in enumerate(zip(gbs, pbs)):
            np_, self.state_blocks[i] = self._upd_blk(g, self.state_blocks[i], p)
            new_blocks.append(np_)
        new_rest, self.state_rest = self._upd_rest(grest, self.state_rest, prest)
        return _merge_groups(new_p0, new_blocks, new_rest)

    # checkpoint payload (pytree)
    @property
    def opt_state(self):
        return {"block0": self.state_b0, "blocks": self.state_blocks,
                "rest": self.state_rest}

    @opt_state.setter
    def opt_state(self, value):
        self.state_b0 = value["block0"]
        self.state_blocks = list(value["blocks"])
        self.state_rest = value["rest"]


def make_offload_grad_step(cfg: TrainConfig, vlm_cfg: VLMConfig):
    """Jitted (loss, clipped grads) for the streamed path (shared accum+clip
    core: optim.value_and_clipped_grads). Supports the leftpad insertion
    mode through the same batch-static ``plan`` kwarg as the in-jit step
    (the step recompiles per distinct chunk-bucketed plan)."""
    import functools

    from visualrwkv_tpu.models.visualrwkv import training_loss
    from visualrwkv_tpu.train.optim import value_and_clipped_grads

    leftpad = getattr(vlm_cfg, "insertion_mode", "scatter") == "leftpad"

    def loss_fn(params, micro, plan=None):
        if leftpad:
            from visualrwkv_tpu.models.visualrwkv import training_loss_leftpad

            return training_loss_leftpad(
                params, vlm_cfg, micro["input_ids"], micro["labels"],
                micro.get("images"), plan=plan, grad_cp=cfg.grad_cp,
            )
        return training_loss(params, vlm_cfg, micro["input_ids"], micro["labels"],
                             micro.get("images"), grad_cp=cfg.grad_cp)

    def step(params, batch, plan=None):
        return value_and_clipped_grads(
            functools.partial(loss_fn, plan=plan), params, batch,
            cfg.accumulate_grad_batches, cfg.grad_clip,
        )

    return jax.jit(step, static_argnames=("plan",))
