"""VisualRWKV: the multimodal assembly (vision ensemble -> projector -> token
scatter -> RWKV LM -> loss).

Mirrors the reference VisualRWKV LightningModule (VisualRWKV-v7/v7.00/
src/model.py:341-530) as pure functions over a combined parameter tree
``{"rwkv", "vit", "proj"}``.
"""

from __future__ import annotations

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
    """Reverse x[:, start:start+length] (static length, traced start)."""
    span = jax.lax.dynamic_slice_in_dim(x, start, length, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        x, jnp.flip(span, axis=1), start, axis=1
    )


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


def vlm_forward(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    images: Optional[Dict[str, Array]] = None,
    grad_cp: bool = False,
) -> Array:
    x = prepare_embeddings(params, cfg, input_ids, images)
    if cfg.bidirectional_image and images is not None:
        start = image_token_span(input_ids)[0]
        return bidirectional_forward(
            params, cfg, x, start, cfg.num_token_per_image, grad_cp
        )
    logits, _ = lm.lm_forward(params["rwkv"], cfg.rwkv, x, grad_cp=grad_cp)
    return logits


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


def training_loss(
    params: Params,
    cfg: VLMConfig,
    input_ids: Array,
    labels: Array,
    images: Optional[Dict[str, Array]] = None,
    grad_cp: bool = True,
) -> Array:
    """Shifted cross-entropy, per-sample normalized by valid-label count, then
    batch mean, with the L2Wrap logit penalty (reference training_step,
    src/model.py:418-434)."""
    logits = vlm_forward(params, cfg, input_ids, images, grad_cp=grad_cp)
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    valid_lengths = jnp.maximum(valid.sum(axis=1), 1)
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    gold = jnp.take_along_axis(shift_logits, safe_labels[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, logz - gold, 0.0)
    loss = (ce.sum(axis=1) / valid_lengths).mean()
    return l2wrap(loss, logits.astype(jnp.float32))
