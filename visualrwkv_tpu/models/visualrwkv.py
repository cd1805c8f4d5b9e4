"""VisualRWKV: the multimodal assembly (vision ensemble -> projector -> token
scatter -> RWKV LM -> loss).

Mirrors the reference VisualRWKV LightningModule (VisualRWKV-v7/v7.00/
src/model.py:341-530) as pure functions over a combined parameter tree
``{"rwkv", "vit", "proj"}``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import VLMConfig
from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visualrwkv_tpu.models import lm, rwkv7
from visualrwkv_tpu.multimodal.projector import (
    adaptive_pool_tokens,
    apply_projector,
    init_projector_params,
    scatter_image_features,
)
from visualrwkv_tpu.vision.backbone import backbone_features, init_backbone_params

Array = jax.Array
Params = Dict[str, Any]


def init_visualrwkv_params(key: Array, cfg: VLMConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"rwkv": lm.init_lm_params(k1, cfg.rwkv)}
    if cfg.vision.towers:  # text-only configs skip the vision stack
        params["vit"] = init_backbone_params(k2, cfg.vision, cfg.rwkv.compute_dtype)
        params["proj"] = init_projector_params(
            k3, cfg.proj_type, cfg.projector_in_dim, cfg.rwkv.n_embd
        )
    return params


def encode_images(
    params: Params, cfg: VLMConfig, images: Dict[str, Array], normalized: bool = False
) -> Array:
    """images (per-tower pixel batches) -> [N_img, num_token_per_image, n_embd].

    Vision towers are frozen feature extractors (reference freeze_vit +
    ``.detach()`` in encode_images, model.py:368-369,449-471): gradients are
    stopped before the projector. The reference's minibatch-4 + empty_cache
    VRAM workaround is unnecessary under XLA's static allocator.

    Optional post-projection stages (configured, v7.03/v5.1):
    - visual token compressor when ``cfg.n_vtc_layer > 0`` and params carry
      a "vtc" subtree (replaces adaptive pooling, v7.03/train.py:62);
    - patch scanning reorders when ``cfg`` has ``image_scanning`` set.
    """
    if cfg.uhd_fusion:
        # UHD: images arrive as [N_img * 5, H, W, 3] per tower (global + 2x2
        # tiles); towers fuse spatially (multimodal.uhd) instead of per-patch
        from visualrwkv_tpu.multimodal.uhd import fuse_image_features
        from visualrwkv_tpu.vision.backbone import backbone_tower_features

        tower_feats = backbone_tower_features(
            params["vit"], cfg.vision, images, cfg.rwkv.compute_dtype, normalized
        )
        per_tower = []
        for t in cfg.vision.towers:
            f = tower_feats[t]
            L, D = f.shape[1], f.shape[2]
            per_tower.append(f.reshape(-1, 5, L, D))
        feats = fuse_image_features(per_tower)
    else:
        feats = backbone_features(
            params["vit"], cfg.vision, images, cfg.rwkv.compute_dtype, normalized
        )
    feats = jax.lax.stop_gradient(feats)
    use_vtc = cfg.n_vtc_layer > 0 and "vtc" in params
    if cfg.grid_size != -2:
        # v5/v6.0 CLIP-style grid pooling (expects a cls-keeping tower, e.g.
        # the CLIP config with keep_cls_feature)
        from visualrwkv_tpu.multimodal.projector import grid_pooling

        feats = grid_pooling(feats, cfg.grid_size)
    elif not use_vtc:
        feats = adaptive_pool_tokens(feats, cfg.num_token_per_image)
    feats = apply_projector(
        params["proj"], cfg.proj_type, feats, jnp.dtype(cfg.rwkv.compute_dtype)
    )
    if use_vtc:
        from visualrwkv_tpu.multimodal.vtc import vtc_forward

        feats = vtc_forward(params["vtc"], cfg.rwkv, feats)
        feats = adaptive_pool_tokens(feats, cfg.num_token_per_image)
    scanning = getattr(cfg, "image_scanning", None)
    if scanning and scanning != "unidirection":
        from visualrwkv_tpu.multimodal.scanning import apply_scanning

        feats = apply_scanning(feats, scanning)
    return feats


def prepare_embeddings(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    images: Optional[Dict[str, Array]] = None,
    image_features: Optional[Array] = None,
    normalized: bool = False,
) -> Array:
    """Token embeddings with image features scattered at image-token slots."""
    input_embeds = rwkv7.embed(params["rwkv"], jnp.clip(input_ids, 0, cfg.rwkv.vocab_size - 1))
    if image_features is None:
        if images is None:
            return input_embeds
        image_features = encode_images(params, cfg, images, normalized)
    return scatter_image_features(input_ids, input_embeds, image_features)


def image_token_span(input_ids: Array) -> Array:
    """Position of the first image token per batch row (0 when absent)."""
    mask = input_ids == IMAGE_TOKEN_INDEX
    return jnp.argmax(mask, axis=-1)


def _flip_span(x: Array, start: Array, length: int) -> Array:
    """Reverse x[:, start:start+length] (static length, traced start).

    ``start`` may be a scalar (shared span) or [B] (per-row spans — needed
    under leftpad tail-keep truncation, which shifts a row's image span)."""
    if getattr(start, "ndim", 0) == 0:
        span = jax.lax.dynamic_slice_in_dim(x, start, length, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            x, jnp.flip(span, axis=1), start, axis=1
        )

    def one(row, s):
        span = jax.lax.dynamic_slice_in_dim(row, s, length, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            row, jnp.flip(span, axis=0), s, axis=0
        )

    return jax.vmap(one)(x, start)


def bidirectional_forward(
    params: Params,
    cfg: VLMConfig,
    x: Array,
    img_start: Array,
    img_len: int,
    grad_cp: bool = False,
) -> Array:
    """Odd layers see the image-token span reversed (v6.0/HD/UHD
    bidirectional image scanning, v6.0/src/model.py:408-431).

    ``img_start`` is a traced scalar (same span across the batch — the
    reference aligns spans via left padding); ``img_len`` is static.
    """
    rcfg = cfg.rwkv
    B, T, C = x.shape
    pad = (-T) % rcfg.chunk_len
    if pad:
        eos = lm.embed(
            params["rwkv"], jnp.full((B, pad), rwkv7.STOP_TOKEN_INDEX, jnp.int32)
        )
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)
    start = img_start + pad

    v_first = None
    n_layers = len(params["rwkv"]["blocks"])
    for i in range(n_layers):
        blk = params["rwkv"]["blocks"][i]
        reverse = i % 2 == 1
        if reverse:
            x = _flip_span(x, start, img_len)
        if grad_cp:
            fn = jax.checkpoint(
                lambda p, xx, vf, i=i: lm.lm_block_forward(p, rcfg, i, xx, vf)
            )
            x, v_first, _ = fn(blk, x, v_first)
        else:
            x, v_first, _ = lm.lm_block_forward(blk, rcfg, i, x, v_first)
        if reverse:
            x = _flip_span(x, start, img_len)

    from visualrwkv_tpu.models.rwkv7 import layer_norm, linear

    x = layer_norm(params["rwkv"]["ln_out"], x)
    if pad:
        x = x[:, pad:]
    return linear(params["rwkv"]["head"], x, jnp.dtype(rcfg.compute_dtype))


def vlm_forward_leftpad(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    labels: Array,
    images: Optional[Dict[str, Array]] = None,
    image_features: Optional[Array] = None,
    plan=None,
    grad_cp: bool = False,
    return_hidden: bool = False,
):
    """v6.0 variable image-token-count forward (multimodal.insertion).

    Each sample carries at most ONE un-expanded image token; spans are
    aligned batch-wide via left padding and features inserted at embedding
    level (v6.0/src/model.py:487-570). Returns (out, new_labels, plan) —
    the sequence is rearranged, so labels are too.

    ``plan`` (a LeftpadPlan) is batch-static geometry; pass it when calling
    under jit (computed host-side via ``multimodal.insertion.leftpad_plan``),
    otherwise it is derived from the concrete input_ids here.
    """
    from visualrwkv_tpu.multimodal.insertion import leftpad_insert, leftpad_plan

    if image_features is None:
        if images is None:
            raise ValueError("leftpad insertion requires images or image_features")
        image_features = encode_images(params, cfg, images)
    if plan is None:
        import numpy as np

        plan = leftpad_plan(
            np.asarray(input_ids), int(image_features.shape[1]), cfg.rwkv.ctx_len
        )
    emb, new_labels, off = leftpad_insert(
        params["rwkv"]["emb"]["weight"], input_ids, labels, image_features, plan
    )
    if cfg.bidirectional_image:
        if return_hidden:
            raise ValueError("bidirectional path returns logits only")
        # tail-keep-truncated rows have their image span shifted left by off
        out = bidirectional_forward(
            params, cfg, emb, plan.max_idx - off, plan.flip_len, grad_cp
        )
    else:
        out, _ = lm.lm_forward(
            params["rwkv"], cfg.rwkv, emb, grad_cp=grad_cp, return_hidden=return_hidden
        )
    return out, new_labels, plan


def vlm_forward(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    images: Optional[Dict[str, Array]] = None,
    grad_cp: bool = False,
    return_hidden: bool = False,
) -> Array:
    x = prepare_embeddings(params, cfg, input_ids, images)
    if cfg.bidirectional_image and images is not None:
        if return_hidden:
            raise ValueError("bidirectional path returns logits only")
        start = image_token_span(input_ids)[0]
        return bidirectional_forward(
            params, cfg, x, start, cfg.num_token_per_image, grad_cp
        )
    out, _ = lm.lm_forward(
        params["rwkv"], cfg.rwkv, x, grad_cp=grad_cp, return_hidden=return_hidden
    )
    return out


# ---------------------------------------------------------------------------
# Loss (shifted CE, per-sample valid-length normalization, L2Wrap)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def l2wrap(loss: Array, logits: Array) -> Array:
    return loss


def _l2wrap_fwd(loss, logits):
    return loss, logits


def _l2wrap_bwd(logits, g):
    # reference L2Wrap (src/model.py:257-271): push the max logit toward 0.
    # Like the reference, the injected gradient is NOT scaled by the upstream
    # cotangent (upstream is 1.0 for a scalar loss).
    B, T, V = logits.shape
    factor = 1e-4 / (B * T)
    maxx = jnp.max(logits, axis=-1, keepdims=True)
    ids = jnp.argmax(logits, axis=-1)
    gy = jax.nn.one_hot(ids, V, dtype=logits.dtype) * (maxx * factor)
    return g, gy


l2wrap.defvjp(_l2wrap_fwd, _l2wrap_bwd)


# -- chunked head + CE + L2Wrap (memory-efficient large-vocab loss) ---------
#
# The dense loss materializes fp32 [B, T, 65536] logits several times (logits,
# softmax intermediates, the L2Wrap residual) — ~4.3 GB EACH at B8/T2048, the
# dominant training-memory term and an HBM OOM at 0B4+ scales on one v5e.
# This custom_vjp computes the head matmul + shifted CE + L2Wrap per T-chunk
# in both passes, so peak extra memory is one [B, chunk, V] block. Numerics
# match the dense loss (fp32 logsumexp/softmax; same per-sample
# normalization and the same unscaled L2Wrap gradient injection).


def _ce_chunk_stats(head_w, h_c, lbl_next_c, valid_c, dt):
    """Per-chunk fp32 (ce_sum [B], valid_cnt [B]) of the shifted CE."""
    logits = jnp.matmul(h_c.astype(dt), head_w.astype(dt), preferred_element_type=jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.where(valid_c, lbl_next_c, 0)
    # mode="clip": under jit the default OOB gather mode is "fill" (NaN), so
    # a label >= vocab_size (e.g. real tokenizer ids against a shrunken test
    # vocab) would silently poison the whole loss instead of being clamped
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1, mode="clip")[..., 0]
    ce = jnp.where(valid_c, logz - gold, 0.0)
    return ce.sum(axis=1), valid_c.sum(axis=1)


def _chunk_inputs(hidden, labels, chunk_t):
    """Slice hidden into T-chunks with the SHIFTED next-token labels/masks."""
    B, T, C = hidden.shape
    nc = T // chunk_t
    h = hidden.reshape(B, nc, chunk_t, C).swapaxes(0, 1)  # [nc, B, Tc, C]
    # labels for position t are labels[t+1]; final position has none
    lbl_next = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    valid = lbl_next != IGNORE_INDEX
    ln = lbl_next.reshape(B, nc, chunk_t).swapaxes(0, 1)
    vl = valid.reshape(B, nc, chunk_t).swapaxes(0, 1)
    return h, ln, vl


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_ce_l2wrap(chunk_t: int, head_w: Array, hidden: Array, labels: Array) -> Array:
    loss, _ = _chunked_ce_fwd_impl(chunk_t, head_w, hidden, labels)
    return loss


def _chunked_ce_fwd_impl(chunk_t, head_w, hidden, labels):
    dt = hidden.dtype
    h, ln, vl = _chunk_inputs(hidden, labels, chunk_t)

    def body(carry, xs):
        ce_sum, cnt = carry
        h_c, ln_c, vl_c = xs
        s, c = _ce_chunk_stats(head_w, h_c, ln_c, vl_c, dt)
        return (ce_sum + s, cnt + c), None

    B = hidden.shape[0]
    (ce_sum, cnt), _ = jax.lax.scan(
        body, (jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.int32)), (h, ln, vl)
    )
    loss = (ce_sum / jnp.maximum(cnt, 1)).mean()
    return loss, jnp.maximum(cnt, 1)


def _chunked_ce_fwd(chunk_t, head_w, hidden, labels):
    loss, cnt = _chunked_ce_fwd_impl(chunk_t, head_w, hidden, labels)
    return loss, (head_w, hidden, labels, cnt)


def _chunked_ce_bwd(chunk_t, residuals, g):
    head_w, hidden, labels, cnt = residuals
    dt = hidden.dtype
    B, T, C = hidden.shape
    h, ln, vl = _chunk_inputs(hidden, labels, chunk_t)
    scale = (g / (B * cnt.astype(jnp.float32)))[:, None]  # [B, 1]
    l2_factor = 1e-4 / (B * T)  # reference L2Wrap factor (src/model.py:264)
    V = head_w.shape[-1]

    def body(dw_acc, xs):
        h_c, ln_c, vl_c = xs
        logits = jnp.matmul(h_c.astype(dt), head_w.astype(dt), preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        safe = jnp.where(vl_c, ln_c, 0)
        onehot = jax.nn.one_hot(safe, V, dtype=jnp.float32) * vl_c[..., None]
        dlogits = (p * vl_c[..., None] - onehot) * scale[:, :, None]
        # L2Wrap: push the max logit toward 0 on EVERY position; like the
        # reference, NOT scaled by the upstream cotangent
        maxx = jnp.max(logits, axis=-1, keepdims=True)
        ids = jnp.argmax(logits, axis=-1)
        dlogits = dlogits + jax.nn.one_hot(ids, V, dtype=jnp.float32) * (maxx * l2_factor)
        dl16 = dlogits.astype(dt)
        dh_c = jnp.matmul(dl16, head_w.astype(dt).T, preferred_element_type=jnp.float32)
        dw_c = jnp.matmul(
            h_c.astype(dt).reshape(-1, C).T, dl16.reshape(-1, V),
            preferred_element_type=jnp.float32,
        )
        return dw_acc + dw_c, dh_c.astype(dt)

    dw, dh = jax.lax.scan(body, jnp.zeros(head_w.shape, jnp.float32), (h, ln, vl))
    dh = dh.swapaxes(0, 1).reshape(B, T, C)
    return dw.astype(head_w.dtype), dh.astype(hidden.dtype), None


chunked_ce_l2wrap.defvjp(_chunked_ce_fwd, _chunked_ce_bwd)


def _dense_ce_l2wrap(logits: Array, labels: Array) -> Array:
    """Shifted CE (per-sample valid-length normalized, batch mean) + L2Wrap."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    valid_lengths = jnp.maximum(valid.sum(axis=1), 1)
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    gold = jnp.take_along_axis(
        shift_logits, safe_labels[..., None], axis=-1, mode="clip"
    )[..., 0]
    ce = jnp.where(valid, logz - gold, 0.0)
    loss = (ce.sum(axis=1) / valid_lengths).mean()
    return l2wrap(loss, logits.astype(jnp.float32))


def training_loss_leftpad(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    labels: Array,
    images: Optional[Dict[str, Array]] = None,
    plan=None,
    grad_cp: bool = True,
) -> Array:
    """Training loss for the v6.0 leftpad insertion mode: the insertion
    rearranges the sequence, so the loss runs on the realigned labels.
    Under jit, pass the host-computed ``plan``."""
    logits, new_labels, _ = vlm_forward_leftpad(
        params, cfg, input_ids, labels, images, plan=plan, grad_cp=grad_cp
    )
    return _dense_ce_l2wrap(logits, new_labels)


# -- sequence-parallel training loss (context parallelism) ------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_ce_l2wrap_sp(spec, head_w: Array, hidden: Array,
                         labels_next: Array) -> Array:
    """Chunked CE + L2Wrap under sequence parallelism. Run INSIDE shard_map.

    ``spec`` = (chunk_t, seq_axis, data_axis): static. ``labels_next`` are
    PRE-SHIFTED (labels_next[t] targets logits[t]; host shifts so shard
    boundaries keep label and logit together). Per-sample valid counts and
    CE sums are psum'd over the seq axis (per-sample normalization spans the
    GLOBAL sequence); the returned value is the LOCAL batch-row mean — the
    caller psum-means it over the data axis, and the chain rule makes the
    CE gradient scaling come out globally correct. The L2Wrap injection is
    NOT cotangent-scaled (reference semantics), so its 1e-4/(B*T) factor is
    explicitly computed with the GLOBAL B and T.
    """
    loss, _ = _chunked_ce_sp_impl(spec, head_w, hidden, labels_next)
    return loss


from visualrwkv_tpu.ops.wkv_sp import vary_to_match as _vary


def _chunked_ce_sp_impl(spec, head_w, hidden, labels_next):
    chunk_t, seq_axis, _ = spec
    dt = hidden.dtype
    B, T, C = hidden.shape
    nc = T // chunk_t
    h = hidden.reshape(B, nc, chunk_t, C).swapaxes(0, 1)
    valid = labels_next != IGNORE_INDEX
    ln = labels_next.reshape(B, nc, chunk_t).swapaxes(0, 1)
    vl = valid.reshape(B, nc, chunk_t).swapaxes(0, 1)

    def body(carry, xs):
        ce_sum, cnt = carry
        s, c = _ce_chunk_stats(head_w, *xs, dt)
        return (ce_sum + s, cnt + c), None

    (ce_sum, cnt), _ = jax.lax.scan(
        body,
        (_vary(jnp.zeros((B,), jnp.float32), hidden),
         _vary(jnp.zeros((B,), jnp.int32), hidden)),
        (h, ln, vl),
    )
    ce_sum = jax.lax.psum(ce_sum, seq_axis)  # global per-sample sums
    cnt = jnp.maximum(jax.lax.psum(cnt, seq_axis), 1)
    return (ce_sum / cnt).mean(), cnt


def _chunked_ce_sp_fwd(spec, head_w, hidden, labels_next):
    loss, cnt = _chunked_ce_sp_impl(spec, head_w, hidden, labels_next)
    return loss, (head_w, hidden, labels_next, cnt)


def _chunked_ce_sp_bwd(spec, residuals, g):
    chunk_t, seq_axis, data_axis = spec
    head_w, hidden, labels_next, cnt = residuals
    dt = hidden.dtype
    B, T, C = hidden.shape
    nc = T // chunk_t
    V = head_w.shape[-1]
    h = hidden.reshape(B, nc, chunk_t, C).swapaxes(0, 1)
    valid = labels_next != IGNORE_INDEX
    ln = labels_next.reshape(B, nc, chunk_t).swapaxes(0, 1)
    vl = valid.reshape(B, nc, chunk_t).swapaxes(0, 1)
    # upstream g already carries the caller's 1/(data_size * B) from the
    # psum-mean over data rows; cnt is the GLOBAL per-sample count
    scale = (g / (B * cnt.astype(jnp.float32)))[:, None]
    B_g = B * jax.lax.axis_size(data_axis)
    T_g = T * jax.lax.axis_size(seq_axis)
    l2_factor = 1e-4 / (B_g * T_g)  # reference L2Wrap factor, GLOBAL shapes

    def body(dw_acc, xs):
        h_c, ln_c, vl_c = xs
        logits = jnp.matmul(h_c.astype(dt), head_w.astype(dt),
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        safe = jnp.where(vl_c, ln_c, 0)
        onehot = jax.nn.one_hot(safe, V, dtype=jnp.float32) * vl_c[..., None]
        dlogits = (p * vl_c[..., None] - onehot) * scale[:, :, None]
        maxx = jnp.max(logits, axis=-1, keepdims=True)
        ids = jnp.argmax(logits, axis=-1)
        dlogits = dlogits + jax.nn.one_hot(ids, V, dtype=jnp.float32) * (maxx * l2_factor)
        dl16 = dlogits.astype(dt)
        dh_c = jnp.matmul(dl16, head_w.astype(dt).T,
                          preferred_element_type=jnp.float32)
        dw_c = jnp.matmul(
            h_c.astype(dt).reshape(-1, C).T, dl16.reshape(-1, V),
            preferred_element_type=jnp.float32,
        )
        return dw_acc + dw_c, dh_c.astype(dt)

    dw, dh = jax.lax.scan(
        body, _vary(jnp.zeros(head_w.shape, jnp.float32), hidden),
        (h, ln, vl),
    )
    dh = dh.swapaxes(0, 1).reshape(B, T, C)
    # dw stays SHARD-LOCAL (varying): training_loss_seq wraps the params in
    # psum_cotangents_f32, which performs the one fp32 reduction over both
    # manual axes on the way out — reducing here too would double-count.
    dw = _vary(dw, hidden, extra_axes=(seq_axis, data_axis))
    return dw.astype(head_w.dtype), dh.astype(hidden.dtype), None


chunked_ce_l2wrap_sp.defvjp(_chunked_ce_sp_fwd, _chunked_ce_sp_bwd)


def training_loss_seq(
    params: Params,
    cfg: VLMConfig,
    input_ids: Optional[Array],
    labels_next: Array,
    grad_cp: bool = True,
    ce_chunk_t: int = 128,
    seq_axis: str = "seq",
    data_axis: str = "data",
    embeds: Optional[Array] = None,
) -> Array:
    """Training loss under context parallelism (run INSIDE shard_map over
    (data, seq); tokens sharded on BOTH batch and T). x070 and x060.

    ``labels_next`` must be pre-shifted on host (labels_next[t] targets
    logits[t]) so the shard boundary keeps each logit with its label.
    For image batches pass ``embeds`` — the already-scattered [B, T_local, C]
    embedding shard, computed OUTSIDE the shard_map (vision encode +
    projector + scatter are per-position, so GSPMD shards them; only the
    backbone needs the manual halo/ring treatment). Text-only callers pass
    ``input_ids`` and the embed lookup happens shard-locally.
    Returns the replicated global loss (psum-mean over the data axis).
    """
    from visualrwkv_tpu.models import rwkv6 as m6
    from visualrwkv_tpu.models import rwkv7 as m7
    from visualrwkv_tpu.parallel.collectives import psum_cotangents_f32

    rcfg = cfg.rwkv
    # Reduce parameter cotangents over the manual axes ourselves, in fp32:
    # better numerics than shard_map's boundary psum in the param dtype, and
    # it keeps bf16 all-reduces out of the graph entirely (XLA:CPU's
    # AllReducePromotion CHECK-crashes cloning them for some layouts — the
    # round-4 dryrun failure; see parallel/collectives.py).
    params = psum_cotangents_f32((data_axis, seq_axis), params)
    if embeds is None:
        embeds = m7.embed(params["rwkv"], input_ids)
    forward_seq = {
        "x070": m7.rwkv7_forward_seq,
        "x060": m6.rwkv6_forward_seq,
    }[rcfg.version]
    hidden = forward_seq(
        params["rwkv"], rcfg, embeds,
        axis=seq_axis, grad_cp=grad_cp, return_hidden=True,
    )
    T_local = embeds.shape[1]
    chunk = ce_chunk_t if T_local % ce_chunk_t == 0 else T_local
    local = chunked_ce_l2wrap_sp(
        (chunk, seq_axis, data_axis),
        params["rwkv"]["head"]["weight"], hidden, labels_next,
    )
    return jax.lax.psum(local, data_axis) / jax.lax.axis_size(data_axis)


def training_loss(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    labels: Array,
    images: Optional[Dict[str, Array]] = None,
    grad_cp: bool = True,
    chunked_ce: bool = True,
    ce_chunk_t: int = 128,
) -> Array:
    """Shifted cross-entropy, per-sample normalized by valid-label count, then
    batch mean, with the L2Wrap logit penalty (reference training_step,
    src/model.py:418-434).

    ``chunked_ce`` (default) computes head+CE+L2Wrap per T-chunk without ever
    materializing the full fp32 [B, T, vocab] logits (see chunked_ce_l2wrap);
    the dense path remains for variants that need whole-sequence logits
    (bidirectional image forward) and as the numerics oracle in tests.
    """
    use_chunked = (
        chunked_ce
        and not (cfg.bidirectional_image and images is not None)
        and input_ids.shape[1] % ce_chunk_t == 0
    )
    if use_chunked:
        hidden = vlm_forward(
            params, cfg, input_ids, images, grad_cp=grad_cp, return_hidden=True
        )
        return chunked_ce_l2wrap(
            ce_chunk_t, params["rwkv"]["head"]["weight"], hidden, labels
        )

    logits = vlm_forward(params, cfg, input_ids, images, grad_cp=grad_cp)
    return _dense_ce_l2wrap(logits, labels)
