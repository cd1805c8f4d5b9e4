"""pjit data-parallel trainer.

Train loop structure mirrors the reference flow (shell -> train.py -> PL
Trainer.fit with DeepSpeed ZeRO, SURVEY §3.1) re-expressed TPU-natively:

- one jitted ``train_step`` (loss + grad + optimizer update) over a
  ``(data, model)`` Mesh; the batch is sharded on ``data``, parameters are
  replicated (or FSDP-sharded), optimizer state is ZeRO-1-sharded;
  XLA inserts the gradient all-reduce;
- gradient accumulation happens inside the step via ``lax.scan`` over a
  leading accumulation axis (no Python-level per-microbatch dispatch);
- activation checkpointing per block (``grad_cp``);
- orbax checkpoints carry params + optimizer state + step (the reference only
  saved weights and could not resume optimizer state, SURVEY §5).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visualrwkv_tpu.config import TrainConfig, VLMConfig
from visualrwkv_tpu.models.visualrwkv import training_loss
from visualrwkv_tpu.ops.wkv7 import wkv_spmd
from visualrwkv_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    shard_batch,
    zero_sharding,
)
from visualrwkv_tpu.train.optim import make_optimizer

log = logging.getLogger(__name__)
Params = Any

# Host-synced arena flushes around the AOT split-step programs. Off by
# default: with full-params donation the back-to-back dispatch runs clean
# and ~13% faster (measured at 1B5: 5765 tok/s synced vs 6622 unsynced);
# VISUALRWKV_AOT_SYNC=1 re-arms the belt-and-suspenders mode if the
# serving runtime regresses again.
import os as _os

_AOT_SYNC = _os.environ.get("VISUALRWKV_AOT_SYNC", "0") == "1"


@dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    params: Params, cfg: TrainConfig, vlm_cfg: VLMConfig, total_steps: int
):
    opt = make_optimizer(cfg, params, total_steps, vlm_cfg.rwkv.n_layer)
    opt_state = opt.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)), opt


def _make_loss_fn(cfg: TrainConfig, vlm_cfg: VLMConfig, mesh) -> Callable:
    """Micro-batch loss closure shared by the fused and split train steps:
    dispatches between the scatter/leftpad insertion modes and the
    sequence-parallel shard_map path."""
    leftpad = getattr(vlm_cfg, "insertion_mode", "scatter") == "leftpad"
    seq_par = mesh is not None and mesh.shape.get("seq", 1) > 1
    if seq_par:
        # context parallelism: tokens sharded on T; the loss runs under an
        # explicit shard_map (halo token-shift + WKV ring need manual axes).
        # run_epoch pre-shifts labels so shard boundaries keep logit+label
        # together. Image batches: the embed + vision encode + projector +
        # scatter run OUTSIDE the shard_map (all per-position; GSPMD shards
        # them) and the shard_map takes the fused [B, T, C] embeddings.
        from jax.sharding import PartitionSpec as P

        from visualrwkv_tpu.models.visualrwkv import (
            prepare_embeddings,
            training_loss_seq,
        )

        if vlm_cfg.rwkv.version not in ("x070", "x060"):
            raise NotImplementedError(
                "sequence-parallel training supports RWKV-7/RWKV-6 "
                f"(x070/x060); got version={vlm_cfg.rwkv.version!r}"
            )
        # SP x TP 3-D meshes: the shard_map is manual over (data, seq) ONLY —
        # the halo/ring collectives name those axes — while the `model` axis
        # stays AUTOMATIC, so GSPMD partitions the projections/FFN/head over
        # the TP param shardings inside the manual region (partial-manual
        # shard_map, `axis_names`). Note the fused Pallas WKV custom call has
        # no partitioning rule on the auto axis and replicates its (per-shard
        # local) compute over `model`; the matmuls and head/CE — the dominant
        # terms — shard.
        manual = frozenset({"data", "seq"})
        _seq_loss = jax.shard_map(
            lambda p, ids, lbl: training_loss_seq(
                p, vlm_cfg, ids, lbl, grad_cp=cfg.grad_cp,
                ce_chunk_t=cfg.ce_chunk_t,
            ),
            mesh=mesh,
            in_specs=(P(), P("data", "seq"), P("data", "seq")),
            out_specs=P(),
            axis_names=manual,
        )
        _seq_loss_embeds = jax.shard_map(
            lambda p, emb, lbl: training_loss_seq(
                p, vlm_cfg, None, lbl, grad_cp=cfg.grad_cp, embeds=emb,
                ce_chunk_t=cfg.ce_chunk_t,
            ),
            mesh=mesh,
            in_specs=(P(), P("data", "seq", None), P("data", "seq")),
            out_specs=P(),
            axis_names=manual,
        )

    def loss_fn(params, micro, plan=None):
        if seq_par:
            if micro.get("images") is not None:
                if leftpad or vlm_cfg.bidirectional_image:
                    raise NotImplementedError(
                        "sequence-parallel image training supports the "
                        "default scatter insertion only (leftpad reshapes "
                        "T per batch; bidirectional needs the whole span)"
                    )
                emb = prepare_embeddings(
                    params, vlm_cfg, micro["input_ids"], micro["images"]
                )
                return _seq_loss_embeds(params, emb, micro["labels"])
            return _seq_loss(params, micro["input_ids"], micro["labels"])
        if leftpad:
            # v6.0 variable image-token-count mode: plan is batch-static
            # geometry computed host-side per batch (Trainer.run_epoch); the
            # step recompiles per distinct plan (T_out is chunk-bucketed to
            # bound the cache)
            from visualrwkv_tpu.models.visualrwkv import training_loss_leftpad

            return training_loss_leftpad(
                params, vlm_cfg, micro["input_ids"], micro["labels"],
                micro.get("images"), plan=plan, grad_cp=cfg.grad_cp,
            )
        return training_loss(
            params,
            vlm_cfg,
            micro["input_ids"],
            micro["labels"],
            micro.get("images"),
            grad_cp=cfg.grad_cp,
            ce_chunk_t=cfg.ce_chunk_t,
        )

    return loss_fn


def _apply_optimizer(cfg, opt, state_params, opt_state, step, grads):
    """Optimizer update + parameter application shared by the fused and
    split train steps (bf16_sr stochastic rounding keyed on `step`)."""
    updates, new_opt_state = opt.update(grads, opt_state, state_params)
    if cfg.optim_precision == "bf16_sr":
        # master-less bf16: apply the fp32 updates with stochastic
        # rounding (per-step key, deterministic in `step` for resume)
        from visualrwkv_tpu.train.optim import apply_updates_sr

        key = jax.random.fold_in(jax.random.PRNGKey(0x5A), step)
        new_params = apply_updates_sr(state_params, updates, key)
    else:
        new_params = optax.apply_updates(state_params, updates)
    return new_params, new_opt_state


def make_train_step(
    cfg: TrainConfig, vlm_cfg: VLMConfig, opt: optax.GradientTransformation, mesh,
    opt_host_shardings=None, opt_device_shardings=None,
) -> Callable:
    """Builds the jitted train step.

    batch: dict with 'input_ids' [A*B, T], 'labels' [A*B, T] and optional
    'images' (per-tower [A*N_img, H, W, 3]); A = accumulate_grad_batches.

    With host-offloaded optimizer state (opt_*_shardings given), the step
    streams the moments device->update->host via in-jit device_put
    annotations (the DeepSpeedCPUAdam analog: HBM holds params+grads only).
    """

    accum = max(1, cfg.accumulate_grad_batches)
    loss_fn = _make_loss_fn(cfg, vlm_cfg, mesh)

    def step_fn(state_params, opt_state, step, batch, plan=None):
        # clipping stays inside the optimizer chain (clip_by_global_norm_f32)
        import functools

        from visualrwkv_tpu.train.optim import value_and_clipped_grads

        loss, grads = value_and_clipped_grads(
            functools.partial(loss_fn, plan=plan), state_params, batch, accum,
            grad_clip=0.0,
        )

        if opt_device_shardings is not None:
            opt_state = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
                opt_state, opt_device_shardings,
            )
        new_params, new_opt_state = _apply_optimizer(
            cfg, opt, state_params, opt_state, step, grads
        )
        if opt_host_shardings is not None:
            new_opt_state = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
                new_opt_state, opt_host_shardings,
            )
        return new_params, new_opt_state, step + 1, loss

    return jax.jit(step_fn, donate_argnums=(0, 1), static_argnames=("plan",))


def make_split_train_step(
    cfg: TrainConfig, vlm_cfg: VLMConfig, opt: optax.GradientTransformation, mesh,
    aot_shapes=None,
) -> Callable:
    """Two-dispatch train step: a grad program, then an optimizer program.

    Same math as :func:`make_train_step`, different compilation boundary.
    Near the single-chip HBM edge (e.g. 1B5 bf16_sr: params+moments+grads
    ~12.4 GB of a 15.75 GB chip) the FUSED step forces XLA to buffer-assign
    the whole backward and the whole optimizer update as one program; the
    measured result was a ~25x runtime collapse (75 s/step, compute-
    independent — the scheduler serializes/spills under pressure). Split,
    each program's own peak is far from the edge — the grad program never
    sees optimizer transients and the optimizer program frees per-leaf fp32
    temps eagerly — and the same step runs at full speed. Costs one extra
    dispatch (~30 ms RTT on the remote-TPU tunnel, amortized to noise) and
    keeps the gradients' HBM alive between the two dispatches (they would be
    alive inside the fused program anyway).
    """
    import functools

    from visualrwkv_tpu.train.optim import value_and_clipped_grads

    accum = max(1, cfg.accumulate_grad_batches)
    loss_fn = _make_loss_fn(cfg, vlm_cfg, mesh)

    @functools.partial(jax.jit, static_argnames=("plan",))
    def grad_fn(state_params, batch, plan=None):
        # clipping stays inside the optimizer chain (clip_by_global_norm_f32)
        return value_and_clipped_grads(
            functools.partial(loss_fn, plan=plan), state_params, batch, accum,
            grad_clip=0.0,
        )

    # donate opt_state + grads only: XLA aliases grads->new_params and
    # opt_state->new_opt_state; donating params too just trips the "donated
    # buffers were not usable" warning (there are more donatable inputs than
    # outputs — the params buffers are the leftovers either way)
    from visualrwkv_tpu.train.optim import PartitionedOptimizer

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def opt_fn(state_params, opt_state, grads, step):
        if isinstance(opt, PartitionedOptimizer):
            # barrier-sequenced leaf groups: clip + adam + apply per ~128 MB
            # group so fp32 temps peak at O(group), not O(tree) — the fused
            # whole-tree update OOMs at 1B5 bf16_sr (see PartitionedOptimizer)
            new_params, new_opt_state = opt.update_and_apply(
                grads, opt_state, state_params, step
            )
        else:
            new_params, new_opt_state = _apply_optimizer(
                cfg, opt, state_params, opt_state, step, grads
            )
        return new_params, new_opt_state, step + 1

    # Pre-compile AND pre-load the opt executable while HBM is still mostly
    # empty (2026-08-20 regression): the serving environment's runtime began
    # refusing to load this executable (runtime ResourceExhausted from
    # compile_and_load) once params+moments+grads (~12.2 GB at 1B5 bf16_sr)
    # are resident, even though the loaded program then EXECUTES fine at
    # 15.07/15.75 GB peak (measured; the load path appears to transiently
    # need more than free-HBM-at-load). Lowering with abstract shapes at
    # Trainer init — before the optimizer state materializes — sidesteps the
    # squeeze entirely; the jit path stays for CPU/tests.
    opt_call = opt_fn
    grad_aot = None
    flush = None
    if aot_shapes is not None:
        p_sh, o_sh, g_sh = aot_shapes
        s_sh = jax.ShapeDtypeStruct((), jnp.int32)
        # grad program too: its load with params+moments resident (9.2 GB at
        # 1B5) fails the same transient check, so both executables load now
        eff = cfg.micro_bsz * accum
        ids_sh = jax.ShapeDtypeStruct((eff, vlm_cfg.rwkv.ctx_len), jnp.int32)
        batch_sh = {"input_ids": ids_sh, "labels": ids_sh, "images": None}
        grad_aot = grad_fn.lower(p_sh, batch_sh, plan=None).compile()
        # donate params TOO on this path (the jit path donates only
        # opt_state+grads): the old params buffer must be CONSUMED by the
        # opt execution rather than freed by an async client-side delete —
        # the 2026-08-20 runtime defers those deletes past the next
        # program's allocation, so every second grad execution saw an extra
        # 2.85 GB (old params) resident and died RESOURCE_EXHAUSTED at
        # ANY geometry (deterministic: warm-up step passed, loop step 1
        # failed, observed at T2048/T1024, B2a4/B1a8 alike).
        opt_aot_fn = jax.jit(
            opt_fn.__wrapped__, donate_argnums=(0, 1, 2)
        )
        opt_call = opt_aot_fn.lower(p_sh, o_sh, g_sh, s_sh).compile()
        # Arena flush (2026-08-20 runtime): the runtime keeps the most
        # recently executed program's temp arena resident until another
        # program runs, so back-to-back big programs see each other's arena
        # as occupied HBM (grad 3.4-3.7 GB + opt 2.7 GB + 11.4 GB of state
        # > 15.75 at 1B5). Executing this trivial program between them
        # swaps the big arena for a ~0-byte one; `step` is threaded through
        # so data dependencies pin the ordering (device queue is FIFO for
        # the flush-after-grad seam). Costs two ~30 ms dispatches per step
        # (~2% at 1B5's 2.5 s steps); measured: without the flushes the leg
        # RESOURCE_EXHAUSTs, with them it runs at round-4 throughput.
        flush = jax.jit(lambda s: s + jnp.int32(0)).lower(s_sh).compile()

    def train_step(state_params, opt_state, step, batch, plan=None):
        use_aot = (
            grad_aot is not None and plan is None
            and batch.get("images") is None
            and tuple(batch["input_ids"].shape)
            == (cfg.micro_bsz * accum, vlm_cfg.rwkv.ctx_len)
        )
        if use_aot:
            loss, grads = grad_aot(state_params, {
                "input_ids": batch["input_ids"],
                "labels": batch["labels"],
                "images": None,
            })
            if _AOT_SYNC:
                # synced arena flush between the two programs (and after the
                # opt) — only needed if plain back-to-back dispatch still
                # RESOURCE_EXHAUSTs; full-params donation removed the known
                # cause (deferred deletes), measured below
                jax.block_until_ready(loss)
                step = flush(step)
                jax.block_until_ready(step)
        else:
            loss, grads = grad_fn(state_params, batch, plan=plan)
        new_params, new_opt_state, step = opt_call(state_params, opt_state, grads, step)
        if use_aot and _AOT_SYNC:
            jax.block_until_ready(step)
            step = flush(step)
            jax.block_until_ready(step)
        return new_params, new_opt_state, step, loss

    return train_step


class Trainer:
    """Host-side training driver: data feeding, logging, checkpointing."""

    def __init__(
        self,
        vlm_cfg: VLMConfig,
        train_cfg: TrainConfig,
        params: Params,
        mesh=None,
        proj_dir: str = "out",
        log_every: int = 10,
    ):
        self.vlm_cfg = vlm_cfg
        self.cfg = train_cfg
        self.mesh = mesh or make_mesh()
        self._multi_device = int(np.prod(list(self.mesh.shape.values()))) > 1
        self.proj_dir = proj_dir
        self.log_every = log_every
        total_steps = (train_cfg.epoch_begin + train_cfg.epoch_count) * train_cfg.epoch_steps
        self.total_steps = total_steps

        # mixed precision: store params (and hence grads + all-reduces) in
        # bf16; make_optimizer detects low-precision trainable leaves and adds
        # fp32 master weights to the optimizer state
        pd = jnp.dtype(train_cfg.param_dtype)
        if pd != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(pd)
                if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
                else p,
                params,
            )

        # stacked-layer layout (lax.scan over depth): opt-in, x070-only.
        # Partial freezing works stacked (optim.stacked_layer_freeze zeroes
        # frozen rows on the stacked axis) and so does image-as-state/state
        # tuning (multimodal.image_as_state scans stacked blocks); only the
        # bidirectional image forward still addresses blocks as a list.
        # Memory note: stacked OOMs ~27 MB EARLIER than the list layout at
        # the 0B4/B8 HBM edge (the stacked tree's one-big-leaf gradients
        # allocate whole [L-1, ...] buffers where the list layout frees
        # per-layer) — at that edge prefer stacked_layers=0 (PROGRESS.md
        # round-1 measurement).
        self.stacked = bool(
            train_cfg.stacked_layers
            and vlm_cfg.rwkv.version == "x070"
            and self.mesh.shape.get("model", 1) == 1
            and self.mesh.shape.get("seq", 1) == 1  # forward_seq is list-only
            and not getattr(vlm_cfg, "bidirectional_image", False)
            and vlm_cfg.rwkv.n_layer >= 2
        )
        if self.stacked:
            from visualrwkv_tpu.models.rwkv7 import stack_blocks

            params = dict(params)
            params["rwkv"] = stack_blocks(params["rwkv"])

        # placement: params replicated, FSDP-sharded (zero_stage>=3), or
        # tensor-parallel over the model axis; optimizer state ZeRO-1 sharded
        if self.mesh.shape.get("model", 1) > 1:
            from visualrwkv_tpu.parallel.mesh import tensor_parallel_sharding

            p_shard = tensor_parallel_sharding(params, self.mesh)
        elif train_cfg.zero_stage >= 3:
            p_shard = zero_sharding(params, self.mesh)
        else:
            p_shard = replicated_sharding(params, self.mesh)
        self.params = jax.tree_util.tree_map(jax.device_put, params, p_shard)

        # streamed host-offloaded optimizer (DeepSpeedCPUAdam analog): state
        # in pinned host memory, ONE block's slice device-resident at a time
        # (the in-jit whole-tree round-trip OOMs at 1B5; see train/offload.py)
        if train_cfg.optim_precision == "bf16_sr" and train_cfg.offload_optimizer:
            raise NotImplementedError(
                "offload_optimizer keeps fp32 masters host-side by design; "
                "optim_precision='bf16_sr' targets the opposite regime "
                "(all-HBM lean state) — pick one"
            )
        self._streamed = None
        if (
            train_cfg.offload_optimizer
            and not self.stacked
            and "blocks" in self.params.get("rwkv", {})
            and not (0 < train_cfg.freeze_rwkv_layers < vlm_cfg.rwkv.n_layer)
        ):
            from visualrwkv_tpu.train.offload import (
                StreamedOffloadOptimizer,
                make_offload_grad_step,
            )

            self._streamed = StreamedOffloadOptimizer(
                train_cfg, vlm_cfg, self.params, total_steps, self.mesh
            )
            self._grad_step = make_offload_grad_step(train_cfg, vlm_cfg)
            self.opt = None
            self.state = TrainState(
                params=self.params,
                opt_state=self._streamed.opt_state,
                step=jnp.zeros((), jnp.int32),
            )
            self.train_step = None
            from visualrwkv_tpu.utils.observability import ThroughputMeter, TrainLogWriter

            self.meter = ThroughputMeter()
            self.train_log = TrainLogWriter(
                proj_dir,
                run_config={"train": vars(train_cfg) if hasattr(train_cfg, "__dict__") else str(train_cfg)},
                wandb_project=train_cfg.wandb_project,
            )
            self.history = []
            return

        self.opt = make_optimizer(train_cfg, self.params, total_steps, vlm_cfg.rwkv.n_layer)
        opt_shape = jax.eval_shape(self.opt.init, self.params)
        wants_host_offload = (
            train_cfg.offload_optimizer and jax.default_backend() == "tpu"
        )
        split = train_cfg.split_step
        if split and wants_host_offload:
            raise NotImplementedError(
                "split_step=True + offload_optimizer is not wired (the "
                "streamed offload path is already a multi-dispatch step)"
            )
        if split is None:
            # auto: split when the fused program's persistent working set
            # (params + grads + optimizer state) crowds one chip's HBM —
            # measured 25x pathology at 1B5 bf16_sr (see make_split_train_step)
            split = False
            if (
                not wants_host_offload
                and not self._multi_device
                and jax.default_backend() == "tpu"
            ):
                pb = sum(
                    getattr(l, "nbytes", 0)
                    for l in jax.tree_util.tree_leaves(self.params)
                )
                ob = sum(
                    int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
                    for l in jax.tree_util.tree_leaves(opt_shape)
                    if hasattr(l, "shape")
                )
                stats = jax.local_devices()[0].memory_stats() or {}
                limit = stats.get("bytes_limit", 16 * 1024**3)
                split = (2 * pb + ob) > 0.6 * limit
        self.split_step_enabled = bool(split)
        if self.split_step_enabled:
            # barrier-sequenced leaf-group optimizer: the split opt program's
            # whole-tree fp32 temps themselves OOM at 1B5 (PartitionedOptimizer)
            from visualrwkv_tpu.train.optim import make_partitioned_optimizer

            self.opt = make_partitioned_optimizer(
                train_cfg, self.params, total_steps, vlm_cfg.rwkv.n_layer,
                max_partition_bytes=train_cfg.opt_partition_mb * 1024 * 1024,
            )
            opt_shape = jax.eval_shape(self.opt.init, self.params)

        # Build the train step BEFORE materializing the optimizer state: the
        # split-step path AOT pre-loads its opt executable, which must happen
        # while HBM is still free (see make_split_train_step); the shardings
        # it needs are all derivable from eval_shape'd structures.
        opt_host = opt_dev = None
        o_shard = None
        if train_cfg.zero_stage >= 1 or train_cfg.offload_optimizer:
            o_shard = zero_sharding(opt_shape, self.mesh)
            if wants_host_offload:
                # DeepSpeedCPUAdam analog: optimizer moments live in pinned
                # host memory; the train step streams them through HBM
                opt_dev = o_shard
                opt_host = jax.tree_util.tree_map(
                    lambda s: s.with_memory_kind("pinned_host"), o_shard
                )
                o_shard = opt_host
        if self.split_step_enabled:
            aot = None
            # single-device TPU only: abstract lowering carries no shardings,
            # so a multi-device (sharded opt state) split step keeps the jit
            # path where shardings are inferred from the real arguments
            if jax.default_backend() == "tpu" and not self._multi_device:
                to_shape = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                p_sh = jax.tree_util.tree_map(to_shape, self.params)
                aot = (p_sh, opt_shape, p_sh)  # clipped grads are param-dtype
            self.train_step = make_split_train_step(
                train_cfg, vlm_cfg, self.opt, self.mesh, aot_shapes=aot
            )
        else:
            self.train_step = make_train_step(
                train_cfg, vlm_cfg, self.opt, self.mesh,
                opt_host_shardings=opt_host, opt_device_shardings=opt_dev,
            )
        if o_shard is not None:
            # initialize the optimizer state DIRECTLY into its target
            # shardings (jit out_shardings on the eval_shape'd structure):
            # materializing 12-18 GB of fp32 masters+moments in HBM first and
            # moving them after is itself an OOM at 1B5+ on one chip
            opt_state = jax.jit(self.opt.init, out_shardings=o_shard)(self.params)
        else:
            opt_state = jax.jit(self.opt.init)(self.params)
        self.state = TrainState(
            params=self.params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
        )
        self.history: list = []
        from visualrwkv_tpu.utils.observability import ThroughputMeter, TrainLogWriter

        self.meter = ThroughputMeter()
        self.train_log = TrainLogWriter(
            proj_dir, run_config={"train": vars(train_cfg) if hasattr(train_cfg, "__dict__") else str(train_cfg)},
            wandb_project=train_cfg.wandb_project,
        )

    def _streamed_step(self, params, batch, **step_kwargs):
        """Streamed-offload step: jitted grad on device, then per-group host
        round-trip optimizer updates (train/offload.py)."""
        loss, grads = self._grad_step(params, batch, **step_kwargs)
        new_params = self._streamed.apply(grads, params)
        return new_params, loss

    def run_epoch(self, batch_fn: Callable[[int], Dict], epoch: int) -> float:
        cfg = self.cfg
        params, opt_state, step = self.state.params, self.state.opt_state, self.state.step
        t0 = time.time()
        last_loss = float("nan")
        for s in range(cfg.epoch_steps):
            batch = batch_fn(s)
            batch = {
                k: v
                for k, v in batch.items()
                if k in ("input_ids", "labels", "images")
            }
            if self.mesh.shape.get("seq", 1) > 1:
                # context parallelism: pre-shift labels on host so each
                # shard holds its own logits' targets (labels_next[t] =
                # labels[t+1]); see models.visualrwkv.training_loss_seq
                from visualrwkv_tpu.data.conversation import IGNORE_INDEX

                lbl = np.asarray(batch["labels"])
                batch["labels"] = np.concatenate(
                    [lbl[:, 1:],
                     np.full((lbl.shape[0], 1), IGNORE_INDEX, lbl.dtype)],
                    axis=1,
                )
            # wkv_spmd: the fused Pallas WKV kernels are shard_map-partitioned
            # per (batch, head) inside the step — no collectives, and they stay
            # partitioned under both DP (batch on `data`) and TP (heads on
            # `model`) instead of being GSPMD-replicated as opaque custom calls
            step_kwargs = {}
            if getattr(self.vlm_cfg, "insertion_mode", "scatter") == "leftpad":
                from visualrwkv_tpu.multimodal.insertion import leftpad_plan

                step_kwargs["plan"] = leftpad_plan(
                    np.asarray(batch["input_ids"]),
                    self.vlm_cfg.num_token_per_image,
                    self.vlm_cfg.rwkv.ctx_len,
                )
            # under context parallelism the step already runs inside an
            # explicit shard_map (manual axes) — a nested wkv_spmd shard_map
            # over the same mesh is both unnecessary and rejected by JAX
            spmd_mesh = (
                self.mesh
                if self._multi_device and self.mesh.shape.get("seq", 1) == 1
                else None
            )
            with self.mesh, wkv_spmd(spmd_mesh):
                device_batch = shard_batch(batch, self.mesh)
                if self._streamed is not None:
                    params, loss = self._streamed_step(
                        params, device_batch, **step_kwargs
                    )
                    opt_state = self._streamed.opt_state
                    step = step + 1
                else:
                    params, opt_state, step, loss = self.train_step(
                        params, opt_state, step, device_batch, **step_kwargs
                    )
            tokens = int(np.prod(batch["input_ids"].shape))
            rates = self.meter.step(batch["input_ids"].shape[0], tokens)
            if s % self.log_every == 0 or s == cfg.epoch_steps - 1:
                last_loss = float(loss)
                log.info(
                    "epoch %d step %d/%d loss %.4f exp(loss) %.3f it/s %.2f tok/s %.0f",
                    epoch, s, cfg.epoch_steps, last_loss,
                    float(np.exp(min(last_loss, 20))), rates["it/s"], rates["token/s"],
                )
                self.history.append({"epoch": epoch, "step": s, "loss": last_loss})
                self.train_log.log_step({"loss": last_loss, **rates})
        self.state = TrainState(params=params, opt_state=opt_state, step=step)
        from visualrwkv_tpu.train.schedule import cosine_warmup_lr

        lr_now = float(
            cosine_warmup_lr(
                int(step), cfg.lr_init, cfg.lr_final, cfg.warmup_steps, self.total_steps
            )
        )
        self.train_log.log_epoch(epoch, last_loss, lr_now)
        return last_loss

    def save_checkpoint(self, path: str, with_optimizer: bool = True) -> None:
        """Orbax checkpoint with params + step and (unlike the reference's
        weight-only .pth saves, SURVEY §5) the optimizer state for true resume."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        save_params = self.state.params
        if self.stacked:  # checkpoints stay in the canonical list-of-blocks layout
            from visualrwkv_tpu.models.rwkv7 import unstack_blocks

            save_params = dict(save_params)
            save_params["rwkv"] = unstack_blocks(save_params["rwkv"])
        opt_state = self.state.opt_state if with_optimizer else None
        if jax.process_count() > 1:
            # multi-host: ZeRO-sharded leaves span hosts and are not fully
            # addressable; collectively gather them to per-host numpy before
            # the (host-local) payload is built
            from jax.experimental import multihost_utils

            save_params = multihost_utils.process_allgather(save_params, tiled=True)
            if opt_state is not None:
                opt_state = multihost_utils.process_allgather(opt_state, tiled=True)
        payload = {
            "params": jax.tree_util.tree_map(np.asarray, save_params),
            "step": int(self.state.step),
        }
        if opt_state is not None:
            payload["opt_state"] = jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                opt_state,
            )
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # restore against the live structure so optax NamedTuples round-trip.
        # params are checkpointed in the canonical list-of-blocks layout even
        # when training stacked (opt_state keeps the live layout: resume
        # implies the same run configuration).
        live_params = self.state.params
        if self.stacked:
            from visualrwkv_tpu.models.rwkv7 import stack_blocks, unstack_blocks

            live_params = dict(live_params)
            live_params["rwkv"] = unstack_blocks(live_params["rwkv"])
        template = {
            "params": jax.tree_util.tree_map(np.asarray, live_params),
            "step": int(self.state.step),
            "opt_state": jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.state.opt_state,
            ),
        }
        try:
            restored = ckptr.restore(path, template)
        except BaseException:
            template.pop("opt_state")  # weights-only checkpoint
            restored = ckptr.restore(path, template)
        restored_params = restored["params"]
        if self.stacked:
            restored_params = dict(restored_params)
            restored_params["rwkv"] = stack_blocks(restored_params["rwkv"])
        self.state.params = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b, a.dtype), self.state.params, restored_params
        )
        if "opt_state" in restored:
            if self._streamed is not None:
                # restore straight into the streamer's pinned-host shardings —
                # a leaf-wise jnp.asarray would materialize the full fp32
                # masters+moments (~18 GB at 1B5) in HBM, the exact OOM the
                # streamed design exists to avoid
                self._streamed.opt_state = jax.tree_util.tree_map(
                    lambda t, b: jax.device_put(
                        np.asarray(b, getattr(t, "dtype", None)), t.sharding
                    )
                    if hasattr(t, "sharding")
                    else b,
                    self._streamed.opt_state,
                    restored["opt_state"],
                )
                self.state.opt_state = self._streamed.opt_state
            else:
                self.state.opt_state = jax.tree_util.tree_map(
                    lambda a, b: jnp.asarray(b, a.dtype) if hasattr(a, "dtype") else b,
                    self.state.opt_state,
                    restored["opt_state"],
                )
        if "step" in restored:
            self.state.step = jnp.asarray(restored["step"], jnp.int32)
