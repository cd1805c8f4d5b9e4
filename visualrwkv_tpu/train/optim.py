"""Optimizer construction.

AdamW with the reference's two-group policy — weight decay only on parameters
whose squeezed shape has >= 2 dims (VisualRWKV-v7/v7.00/src/model.py:390-407) —
plus global-norm clipping, schedule injection, and freezing masks
(freeze_rwkv/emb/proj/vit, model.py:368-388).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from visualrwkv_tpu.config import TrainConfig
from visualrwkv_tpu.train.schedule import cosine_warmup_lr, wd_schedule

Params = Any


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip with the norm accumulated in fp32.

    ``optax.clip_by_global_norm`` squares leaves in their own dtype; with bf16
    gradients at the billion-parameter scale the sum of squares overflows to
    inf and the scale becomes nan.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(updates)
        )
        gnorm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
        # non-finite gradients (inf/nan anywhere shows up in the fp32 norm):
        # zero the step instead of feeding nan into the Adam moments — one
        # poisoned batch must not destroy the run (free here, the norm is
        # already computed; discovered via the chunk-32 divergence, see
        # docs/wkv_chunk_stability.md). where(), not multiply: inf * 0 = nan.
        finite = jnp.isfinite(gnorm)
        updates = jax.tree_util.tree_map(
            lambda x: jnp.where(
                finite, x.astype(jnp.float32) * scale, 0.0
            ).astype(x.dtype),
            updates,
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class MasterFP32State(NamedTuple):
    """State of :func:`with_fp32_master`: fp32 master weights + inner state."""

    master: Any
    inner: Any


def with_fp32_master(
    inner: optax.GradientTransformation, train_mask: Params
) -> optax.GradientTransformation:
    """Mixed-precision wrapper: fp32 master weights for low-precision params.

    The large-scale bf16 recipe (what DeepSpeed fp16/bf16 modes do around the
    reference's ZeRO optimizer): model parameters are stored in bf16 — halving
    param HBM and gradient all-reduce bytes — while the optimizer keeps an
    fp32 master copy of each trainable low-precision leaf.  Gradients are
    upcast to fp32 before the inner transformation, so Adam moments and weight
    decay also run in fp32; without this, per-step updates of magnitude
    ``lr << ulp(param)`` round to zero and training silently stalls.

    Masters are kept ONLY for trainable leaves whose dtype is not float32
    (frozen and fp32 leaves pass straight through), so the wrapper is a
    near-no-op for fp32 training.  Master leaves live in the optimizer state
    and therefore inherit ZeRO-1 sharding / pinned-host offload untouched.

    The emitted update is the fp32 delta that moves the low-precision param to
    ``cast(new_master)``; after ``optax.apply_updates`` the param matches the
    cast master to <= 1 ulp (the delta itself is rounded once), and the error
    does not accumulate because the master is the source of truth.
    """
    f32 = jnp.float32
    _node = optax.MaskedNode
    _is_node = lambda x: isinstance(x, _node)

    def _needs_master(trainable, p) -> bool:
        return bool(trainable) and jnp.asarray(p).dtype != f32

    def init_fn(params):
        master = jax.tree_util.tree_map(
            lambda t, p: p.astype(f32) if _needs_master(t, p) else _node(),
            train_mask,
            params,
        )
        # init the inner transform against fp32 shapes so Adam moments are fp32
        inner_state = inner.init(
            jax.tree_util.tree_map(lambda p: jax.ShapeDtypeStruct(jnp.shape(p), f32), params)
        )
        return MasterFP32State(master=master, inner=inner_state)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("with_fp32_master requires params")
        g32 = jax.tree_util.tree_map(lambda g: g.astype(f32), updates)
        full32 = jax.tree_util.tree_map(
            lambda m, p: p.astype(f32) if _is_node(m) else m,
            state.master,
            params,
            is_leaf=_is_node,
        )
        upd, new_inner = inner.update(g32, state.inner, full32)
        new_master = jax.tree_util.tree_map(
            lambda m, f, u: _node() if _is_node(m) else f + u,
            state.master,
            full32,
            upd,
            is_leaf=_is_node,
        )
        out = jax.tree_util.tree_map(
            lambda m, nm, p, u: u
            if _is_node(m)
            else nm.astype(p.dtype).astype(f32) - p.astype(f32),
            state.master,
            new_master,
            params,
            upd,
            is_leaf=_is_node,
        )
        return out, MasterFP32State(master=new_master, inner=new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdamLowMemState(NamedTuple):
    """State of :func:`scale_by_adam_lowmem`: bf16 moments + fp32 step count."""

    count: jnp.ndarray
    mu: Any
    nu: Any


class ChunkedLeafState(NamedTuple):
    """State of a :class:`PartitionedOptimizer` row-chunked big-leaf group:
    bf16 moments for the one leaf plus the two step counts the fused chain
    keeps (inject_hyperparams schedule count, adam bias-correction count)."""

    sched_count: jnp.ndarray
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_lowmem(
    b1: float, b2: float, eps: float, moment_dtype=jnp.bfloat16
) -> optax.GradientTransformation:
    """Adam moment scaling with moments STORED in ``moment_dtype`` (bf16).

    Per-step math (EMA update, bias correction, the m/(sqrt(v)+eps) ratio)
    runs in fp32; only the carried moments are rounded. Relative rounding
    noise on the second moment enters through sqrt() so the step-size error
    is ~2^-9 — far below Adam's own gradient noise. Emits fp32 updates
    regardless of gradient dtype so downstream weight decay / lr scaling and
    the stochastic-rounding application (:func:`apply_updates_sr`) stay fp32.
    """
    f32 = jnp.float32

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), moment_dtype)
        return ScaleByAdamLowMemState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(f32)
        c2 = 1.0 - b2 ** count.astype(f32)

        tm = jax.tree_util.tree_map
        mu32 = tm(
            lambda g, m: b1 * m.astype(f32) + (1.0 - b1) * g.astype(f32),
            updates, state.mu,
        )
        nu32 = tm(
            lambda g, v: b2 * v.astype(f32) + (1.0 - b2) * jnp.square(g.astype(f32)),
            updates, state.nu,
        )
        u = tm(lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        cast = lambda t: tm(lambda x: x.astype(moment_dtype), t)
        return u, ScaleByAdamLowMemState(count=count, mu=cast(mu32), nu=cast(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def sr_round_bf16(key, x32: jnp.ndarray) -> jnp.ndarray:
    """Stochastically round fp32 -> bf16: add uniform random bits below the
    bf16 truncation point, then truncate. Unbiased: E[sr(x)] = x (the carry
    into the kept mantissa fires with probability proportional to the
    discarded fraction). Non-finite inputs pass through deterministically."""
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    rnd = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    sbits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(sbits, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(jnp.isfinite(x32), out, x32.astype(jnp.bfloat16))


def apply_updates_sr(params: Params, updates: Params, key) -> Params:
    """``optax.apply_updates`` with stochastic rounding into bf16 params.

    bf16 leaves with fp32 updates take ``sr_round(p32 + u)`` — sub-ulp
    updates (lr << ulp(param)) advance in expectation instead of silently
    rounding to zero, which is what makes master-less bf16 training viable.
    Other leaves follow plain optax semantics.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ups = treedef.flatten_up_to(updates)
    keys = jax.random.split(key, max(len(leaves), 1))

    def one(p, u, k):
        if u is None:
            return p
        if (
            hasattr(p, "dtype")
            and p.dtype == jnp.bfloat16
            and jnp.asarray(u).dtype == jnp.float32
        ):
            return sr_round_bf16(k, p.astype(jnp.float32) + u)
        return (p + u.astype(jnp.asarray(p).dtype)).astype(jnp.asarray(p).dtype)

    return treedef.unflatten(one(p, u, k) for p, u, k in zip(leaves, ups, keys))


def value_and_clipped_grads(loss_fn, params, batch, accum: int, grad_clip: float):
    """Shared loss+grad core of the train steps: in-jit gradient accumulation
    over a leading axis plus fp32 global-norm clipping (the
    clip_by_global_norm_f32 semantics, applied to the grads directly)."""
    accum = max(1, accum)
    if accum == 1:
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    else:
        def sp(x):
            return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

        micro_batches = jax.tree_util.tree_map(sp, batch)

        def body(carry, micro):
            ls, gs = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, micro)
            return (ls + loss, jax.tree_util.tree_map(jnp.add, gs, grads)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros(()), zeros), micro_batches)
        loss = loss / accum
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

    if grad_clip > 0:
        sq = sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(grads)
        )
        gnorm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
        finite = jnp.isfinite(gnorm)  # skip poisoned steps (where, not *0: inf*0=nan)
        grads = jax.tree_util.tree_map(
            lambda x: jnp.where(
                finite, x.astype(jnp.float32) * scale, 0.0
            ).astype(x.dtype),
            grads,
        )
    return loss, grads


def weight_decay_mask(params: Params) -> Params:
    """True where the squeezed parameter has >= 2 dims (gets weight decay).

    Leaves under a ``blocks_stacked`` subtree (rwkv7.stack_blocks layout) carry
    a leading layer axis; the rule applies to the per-layer shape."""

    def decide(path, p) -> bool:
        shape = jnp.shape(p)
        if any(getattr(q, "key", None) == "blocks_stacked" for q in path):
            shape = shape[1:]
        return len([d for d in shape if d > 1]) >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def trainable_mask(params: Params, cfg: TrainConfig, n_layer: int) -> Params:
    """Boolean pytree: False = frozen.

    Supports the reference freezing controls: first-N-layer freeze, embedding,
    projector, and always-frozen vision towers.
    """
    def decide(path, _) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys and keys[0] == "vit":
            return False
        if keys and keys[0] == "proj" and cfg.freeze_proj:
            return False
        if "emb" in keys and cfg.freeze_emb:
            return False
        if keys and keys[0] == "rwkv" and "blocks" in keys:
            i = keys.index("blocks")
            layer = keys[i + 1]
            if isinstance(layer, int) and layer < cfg.freeze_rwkv_layers:
                return False
        # stacked layout: layer 0 lives under "block0"; layers 1..L-1 share
        # leaves under "blocks_stacked" and are frozen per-row by
        # stacked_layer_freeze instead of per-leaf here
        if keys and keys[0] == "rwkv" and "block0" in keys and cfg.freeze_rwkv_layers >= 1:
            return False
        if cfg.freeze_rwkv_layers >= n_layer and keys and keys[0] == "rwkv":
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def stacked_layer_freeze(freeze_first: int) -> "optax.GradientTransformation":
    """Zero the update rows of frozen layers inside the STACKED blocks tree.

    Per-leaf boolean freezing (multi_transform) cannot express "first N
    layers" once layers 1..L-1 share each leaf's leading axis; this
    transformation multiplies ``blocks_stacked`` updates by a per-layer 0/1
    vector instead (stacked row j holds layer j+1). Apply it at BOTH ends of
    the optimizer chain: before, so frozen rows contribute nothing to the
    global-norm clip or the Adam moments; after, so weight decay cannot
    reintroduce an update on frozen rows.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def f(path, u):
            keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
            if "blocks_stacked" in keys and hasattr(u, "ndim") and u.ndim >= 1:
                L1 = u.shape[0]
                layer_ids = jnp.arange(1, L1 + 1)
                m = (layer_ids >= freeze_first).astype(u.dtype)
                return u * m.reshape((L1,) + (1,) * (u.ndim - 1))
            return u

        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(init, update)


class PartitionedOptimizer:
    """The whole-tree optimizer chain re-cut into barrier-sequenced leaf groups.

    Same math as :func:`make_optimizer` + the train step's parameter
    application, different HBM profile.  At the single-chip edge (1B5 bf16_sr:
    bf16 params 3.1 GB + bf16 grads 3.1 GB + bf16 moments 6.2 GB resident) the
    fused whole-tree ``opt.update`` lets XLA schedule the ~700 independent
    per-leaf elementwise chains concurrently; each chain materializes fp32
    temps (mu32/nu32/update ≈ 6x the leaf's bf16 bytes), so the program's peak
    overshoots the chip (measured: 16.59G / 15.75G, 64.5% HLO-temp
    fragmentation).  Here the tree is greedily packed into ~128 MB leaf groups
    in flatten order (≈ per-block at 1B5); each group gets its own masked
    optax instance (out-of-group leaves are ``optax.MaskedNode`` — zero state
    bytes), and groups are chained through ``lax.optimization_barrier`` so a
    group's fp32 temps are dead before the next group starts: peak temp is
    O(one group), not O(tree).

    Cross-group couplings are factored out exactly:

    - **global-norm clip** runs once up front over all trainable leaves
      (fp32 accumulation, stacked frozen rows zeroed — bit-identical inputs
      to the fused chain's ``clip_by_global_norm_f32``, including the
      cast-back to the gradient dtype and the non-finite step skip);
    - **schedules** (``inject_hyperparams`` count, Adam count) tick
      identically in every group;
    - **stochastic rounding** splits the per-step key over the FULL params
      flatten order, so each leaf sees the same bits as the fused
      ``apply_updates_sr``.

    The optimizer state is a tuple of per-group states; checkpoints resume
    only under the same layout (the partitioning is deterministic in
    (params, cfg)), which matches the split-step trainer's scope: the same
    run that saved it.  DeepSpeed analog: ZeRO's round-robin per-group
    optimizer step (reference ``v7.00/src/trainer.py:8-9``), done here on one
    chip across time instead of across ranks.
    """

    # row-chunked update for oversized leaves (emb/head: 268 MB bf16 at 1B5,
    # 536 MB at 7B): the whole-leaf fp32 update materializes ~5 copies
    # (2.6 GB measured via compiled memory_analysis at 1B5 — invariant to
    # group size, it IS the one-big-leaf group), which since the 2026-08-20
    # runtime change no longer fits next to the grad program's arena. Leaves
    # above _CHUNK_LEAF_BYTES process in ~_CHUNK_TARGET_BYTES row slices,
    # barrier-sequenced like groups; same formulas (shared sr_round_bf16 /
    # schedule fns), but SR random bits come from per-chunk fold_in keys, so
    # chunked leaves are statistically — not bitwise — identical to the
    # fused path. bf16_sr mode only (master_fp32 big leaves carry masters).
    _CHUNK_LEAF_BYTES = 64 * 1024 * 1024
    _CHUNK_TARGET_BYTES = 16 * 1024 * 1024

    def __init__(self, cfg: TrainConfig, params: Params, total_steps: int,
                 n_layer: int, max_partition_bytes: int = 128 * 1024 * 1024):
        import dataclasses

        leaves, treedef = jax.tree_util.tree_flatten(params)
        self._treedef = treedef
        mask = trainable_mask(params, cfg, n_layer)
        mask_leaves = treedef.flatten_up_to(mask)
        self._train_idx = [i for i, t in enumerate(mask_leaves) if bool(t)]

        # stacked-row freeze participates in the clip norm exactly as the
        # in-chain stacked_layer_freeze would (guard before clip)
        paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
        is_stacked_tree = (
            isinstance(params.get("rwkv"), dict)
            and "blocks_stacked" in params["rwkv"]
        )
        self._guard_first = (
            cfg.freeze_rwkv_layers
            if is_stacked_tree and 0 < cfg.freeze_rwkv_layers < n_layer
            else 0
        )
        self._stacked_ids = {
            i
            for i, path in enumerate(paths)
            if any(getattr(q, "key", None) == "blocks_stacked" for q in path)
        }

        # greedy pack trainable leaves (flatten order ~ layer order) into
        # byte-bounded groups; a single oversized leaf (emb/head) gets its own
        total = sum(int(getattr(leaves[i], "nbytes", 0)) for i in self._train_idx)
        target = min(max_partition_bytes, max(total // 8, 1))
        self.parts_idx: list = []
        cur, cur_b = [], 0
        for i in self._train_idx:
            nb = int(getattr(leaves[i], "nbytes", 0))
            if cur and cur_b + nb > target:
                self.parts_idx.append(cur)
                cur, cur_b = [], 0
            cur.append(i)
            cur_b += nb
        if cur:
            self.parts_idx.append(cur)

        self.grad_clip = float(cfg.grad_clip)
        self.sr = cfg.optim_precision == "bf16_sr"
        self._cfg = cfg
        self._total_steps = total_steps
        # chunked big leaves: only single-leaf groups qualify (the greedy
        # packer already isolates any leaf above the partition bound)
        wd_leaves = treedef.flatten_up_to(weight_decay_mask(params))
        self._chunked: dict = {}
        if self.sr:
            for pid, idxs in enumerate(self.parts_idx):
                if len(idxs) != 1:
                    continue
                i = idxs[0]
                nb = int(getattr(leaves[i], "nbytes", 0))
                shape = jnp.shape(leaves[i])
                if nb > self._CHUNK_LEAF_BYTES and len(shape) >= 2:
                    k = min(
                        shape[0],
                        max(2, -(-nb // self._CHUNK_TARGET_BYTES)),
                    )
                    self._chunked[pid] = (k, bool(wd_leaves[i]))
        cfg_noclip = dataclasses.replace(cfg, grad_clip=0.0)
        self.opts = []
        for pid, idxs in enumerate(self.parts_idx):
            if pid in self._chunked:
                self.opts.append(None)
                continue
            sel = set(idxs)
            flags = [i in sel for i in range(len(leaves))]
            pmask = jax.tree_util.tree_unflatten(treedef, flags)
            self.opts.append(
                make_optimizer(cfg_noclip, params, total_steps, n_layer,
                               extra_trainable_mask=pmask)
            )

    def init(self, params: Params):
        leaves = jax.tree_util.tree_flatten(params)[0]
        out = []
        for pid, o in enumerate(self.opts):
            if o is None:
                p = leaves[self.parts_idx[pid][0]]
                out.append(ChunkedLeafState(
                    sched_count=jnp.zeros((), jnp.int32),
                    count=jnp.zeros((), jnp.int32),
                    mu=jnp.zeros(jnp.shape(p), jnp.bfloat16),
                    nu=jnp.zeros(jnp.shape(p), jnp.bfloat16),
                ))
            else:
                out.append(o.init(params))
        return tuple(out)

    def _chunked_group_update(self, pid, p, g, st, scale, finite, key):
        """Barrier-sequenced row-chunk update for one oversized leaf; same
        per-element math as the fused chain (clip round-trip, lowmem adam,
        decayed weights, lr scale, SR apply) with fp32 temps O(one chunk)."""
        k, wd_on = self._chunked[pid]
        cfg = self._cfg
        f32 = jnp.float32
        count = st.count + 1
        c1 = 1.0 - cfg.beta1 ** count.astype(f32)
        c2 = 1.0 - cfg.beta2 ** count.astype(f32)
        lr = cosine_warmup_lr(
            st.sched_count, cfg.lr_init, cfg.lr_final, cfg.warmup_steps,
            self._total_steps,
        )
        wd = wd_schedule(
            st.sched_count, cfg.weight_decay, cfg.weight_decay_final,
            cfg.warmup_steps, self._total_steps,
        ) if wd_on else 0.0

        n = p.shape[0]
        bounds = [round(c * n / k) for c in range(k + 1)]

        def one(c, args):
            p_c, g_c, mu_c, nu_c = args
            g32 = g_c.astype(f32)
            if scale is not None:
                # fused-path parity: the clip scales in fp32, casts back to
                # the gradient dtype, and adam re-casts to fp32
                g32 = jnp.where(finite, g32 * scale, 0.0).astype(
                    g_c.dtype).astype(f32)
            mu32 = cfg.beta1 * mu_c.astype(f32) + (1.0 - cfg.beta1) * g32
            nu32 = cfg.beta2 * nu_c.astype(f32) + (
                1.0 - cfg.beta2) * jnp.square(g32)
            u = (mu32 / c1) / (jnp.sqrt(nu32 / c2) + cfg.adam_eps)
            u = u + wd * p_c
            u = -lr * u
            if p_c.dtype == jnp.bfloat16:
                p_new = sr_round_bf16(
                    jax.random.fold_in(key, c), p_c.astype(f32) + u)
            else:
                p_new = jnp.asarray(p_c + u).astype(p_c.dtype)
            return (p_new, mu32.astype(jnp.bfloat16), nu32.astype(jnp.bfloat16))

        outs = []
        prev = None
        for c in range(k):
            sl = slice(bounds[c], bounds[c + 1])
            args = (p[sl], g[sl], st.mu[sl], st.nu[sl])
            if prev is not None:
                args, prev = jax.lax.optimization_barrier((args, prev))
                outs.append(prev)
            prev = one(c, args)
        outs.append(prev)
        p_new = jnp.concatenate([o[0] for o in outs], axis=0)
        mu_new = jnp.concatenate([o[1] for o in outs], axis=0)
        nu_new = jnp.concatenate([o[2] for o in outs], axis=0)
        return p_new, ChunkedLeafState(
            sched_count=st.sched_count + 1, count=count, mu=mu_new, nu=nu_new)

    def _row_mask(self, g32):
        L1 = g32.shape[0]
        ids = jnp.arange(1, L1 + 1)
        m = (ids >= self._guard_first).astype(g32.dtype)
        return g32 * m.reshape((L1,) + (1,) * (g32.ndim - 1))

    def update_and_apply(self, grads, states, params, step):
        """One optimizer step: clip + per-group (update, apply), sequenced.

        Returns ``(new_params, new_states)``; bit-matches the fused
        ``_apply_optimizer`` path (see class docstring for the factoring).
        """
        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        f32 = jnp.float32

        scale = None
        if self.grad_clip > 0:
            sq = jnp.zeros((), f32)
            for i in self._train_idx:
                g32 = leaves_g[i].astype(f32)
                if self._guard_first and i in self._stacked_ids:
                    g32 = self._row_mask(g32)
                sq = sq + jnp.sum(jnp.square(g32))
            gnorm = jnp.sqrt(sq)
            scale = jnp.minimum(1.0, self.grad_clip / jnp.maximum(gnorm, 1e-12))
            finite = jnp.isfinite(gnorm)

        keys = None
        if self.sr:
            key = jax.random.fold_in(jax.random.PRNGKey(0x5A), step)
            keys = jax.random.split(key, max(len(leaves_p), 1))

        def apply_one(i, u):
            p = leaves_p[i]
            if (
                self.sr
                and hasattr(p, "dtype")
                and p.dtype == jnp.bfloat16
                and jnp.asarray(u).dtype == f32
            ):
                return sr_round_bf16(keys[i], p.astype(f32) + u)
            # optax.apply_updates semantics: promote-add, cast back
            return jnp.asarray(p + u).astype(jnp.asarray(p).dtype)

        new_leaves = list(leaves_p)
        new_states: list = [None] * len(self.opts)
        pending = None  # (pid, idxs) whose values ride the next barrier
        pend_vals = None  # (out_leaves, new_state) of the pending group

        def flush(pend, vals):
            pid, idxs = pend
            out_leaves, st = vals
            for j, i in enumerate(idxs):
                new_leaves[i] = out_leaves[j]
            new_states[pid] = st

        for pid, idxs in enumerate(self.parts_idx):
            gsub = [leaves_g[i] for i in idxs]
            if pending is not None:
                # sequence point: this group's inputs become available only
                # once the previous group's outputs are computed, so XLA
                # cannot overlap (and co-allocate) the two groups' fp32 temps
                gsub, pend_vals = jax.lax.optimization_barrier(
                    (gsub, pend_vals)
                )
                flush(pending, pend_vals)
            if pid in self._chunked:
                # oversized leaf: row-chunked update, clip applied inside
                i = idxs[0]
                p_new, new_st = self._chunked_group_update(
                    pid, leaves_p[i], gsub[0], states[pid], scale,
                    finite if scale is not None else None,
                    keys[i] if self.sr else None,
                )
                pending, pend_vals = (pid, idxs), ([p_new], new_st)
                continue
            if scale is not None:
                gsub = [
                    jnp.where(finite, g.astype(f32) * scale, 0.0).astype(g.dtype)
                    for g in gsub
                ]
            gl = list(leaves_g)
            for j, i in enumerate(idxs):
                gl[i] = gsub[j]
            gtree = jax.tree_util.tree_unflatten(treedef, gl)
            upd, new_st = self.opts[pid].update(gtree, states[pid], params)
            upd_leaves = treedef.flatten_up_to(upd)
            out_leaves = [apply_one(i, upd_leaves[i]) for i in idxs]
            pending, pend_vals = (pid, idxs), (out_leaves, new_st)
        if pending is not None:
            flush(pending, pend_vals)

        new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return new_params, tuple(new_states)


def make_partitioned_optimizer(
    cfg: TrainConfig, params: Params, total_steps: int, n_layer: int,
    max_partition_bytes: int = 128 * 1024 * 1024,
) -> PartitionedOptimizer:
    """Build the barrier-sequenced split-step optimizer (see
    :class:`PartitionedOptimizer`)."""
    return PartitionedOptimizer(cfg, params, total_steps, n_layer,
                                max_partition_bytes)


def make_optimizer(
    cfg: TrainConfig,
    params: Params,
    total_steps: int,
    n_layer: int,
    extra_trainable_mask: Optional[Params] = None,
) -> optax.GradientTransformation:
    lr_fn: Callable = lambda step: cosine_warmup_lr(
        step, cfg.lr_init, cfg.lr_final, cfg.warmup_steps, total_steps
    )
    wd_fn: Callable = lambda step: wd_schedule(
        step, cfg.weight_decay, cfg.weight_decay_final, cfg.warmup_steps, total_steps
    )
    wd_mask = weight_decay_mask(params)

    is_stacked_tree = (
        isinstance(params.get("rwkv"), dict) and "blocks_stacked" in params["rwkv"]
    )
    stacked_guard = (
        stacked_layer_freeze(cfg.freeze_rwkv_layers)
        if is_stacked_tree and 0 < cfg.freeze_rwkv_layers < n_layer
        else optax.identity()
    )

    if cfg.optim_precision not in ("master_fp32", "bf16_sr"):
        raise ValueError(f"unknown optim_precision {cfg.optim_precision!r}")
    lean = cfg.optim_precision == "bf16_sr"
    adam = (
        scale_by_adam_lowmem(cfg.beta1, cfg.beta2, cfg.adam_eps)
        if lean
        else optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps)
    )

    @optax.inject_hyperparams
    def base(learning_rate, weight_decay):
        return optax.chain(
            stacked_guard,
            clip_by_global_norm_f32(cfg.grad_clip) if cfg.grad_clip > 0 else optax.identity(),
            adam,
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.scale_by_learning_rate(learning_rate),
            stacked_guard,
        )

    opt = base(learning_rate=lr_fn, weight_decay=wd_fn)

    mask = trainable_mask(params, cfg, n_layer)
    if extra_trainable_mask is not None:
        mask = jax.tree_util.tree_map(
            lambda a, b: bool(a) and bool(b), mask, extra_trainable_mask
        )
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform({"train": opt, "freeze": optax.set_to_zero()}, labels)

    # mixed precision: if any trainable leaf is stored below fp32, keep fp32
    # master weights in the optimizer state (DeepSpeed bf16-mode analog) —
    # unless optim_precision="bf16_sr", whose whole point is master-less
    # bf16 (the trainer then applies updates via apply_updates_sr)
    any_low = any(
        bool(t) and jnp.asarray(p).dtype != jnp.float32
        for t, p in zip(
            jax.tree_util.tree_leaves(mask), jax.tree_util.tree_leaves(params)
        )
    )
    if any_low and not lean:
        tx = with_fp32_master(tx, mask)
    return tx
