"""v7.10 branch: mixture-FFN blocks + trainable vision RWKV (VRWKV).

- Mixture-FFN: each LM block gains a second ChannelMix (``ffn_v``) + ``ln_v``;
  image-token positions route through ffn_v, text positions through ffn
  (reference VisualRWKV-v7/v7.10/src/model.py:233-262).  The where() is a
  position mask — on TPU both FFNs run and blend, which XLA fuses; at these
  widths the extra FLOPs are cheaper than gather/scatter.
- VRWKV: conv patch-embed + 6 standard RWKV-7 blocks + LayerNorm, producing
  patch features and an ImageNet-1k head over the mean-pooled tokens
  (:367-416).
- joint loss: length-normalized LM CE + classification CE (:473-493);
  pretrain mode trains VRWKV + ffn_v/ln_v only (:438-443).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models.rwkv7 import (
    STOP_TOKEN_INDEX,
    _ln_init,
    cmix_x070,
    init_cmix_x070,
    init_tmix_x070,
    layer_norm,
    linear,
    tmix_x070,
)

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Mixture-FFN LM blocks
# ---------------------------------------------------------------------------


def add_mixture_ffn(key: Array, lm_params: Params, cfg: RWKVConfig) -> Params:
    """Augment existing RWKV-7 LM params with per-block ffn_v + ln_v."""
    keys = jax.random.split(key, len(lm_params["blocks"]))
    for i, blk in enumerate(lm_params["blocks"]):
        blk["ffn_v"] = init_cmix_x070(keys[i], cfg, i)
        blk["ln_v"] = _ln_init(cfg.n_embd)
    return lm_params


def block_x070_mixffn(
    p: Params, cfg: RWKVConfig, layer_id: int, x: Array, mask: Array, v_first
) -> Tuple[Array, Array]:
    """mask [B, T, 1]: True -> image position (ffn_v), False -> text (ffn)."""
    if layer_id == 0:
        x = layer_norm(p["ln0"], x)
    xx, v_first, _, _ = tmix_x070(p["att"], cfg, layer_id, layer_norm(p["ln1"], x), v_first)
    x = x + xx
    ffn_t, _ = cmix_x070(p["ffn"], cfg, layer_norm(p["ln2"], x))
    ffn_v, _ = cmix_x070(p["ffn_v"], cfg, layer_norm(p["ln_v"], x))
    x = x + jnp.where(mask, ffn_v, ffn_t)
    return x, v_first


def rwkv7_mixffn_forward(
    params: Params, cfg: RWKVConfig, x: Array, mask: Array, grad_cp: bool = False
) -> Array:
    """LM forward with image/text FFN routing. x [B,T,C], mask [B,T] bool."""
    B, T, C = x.shape
    pad = (-T) % cfg.chunk_len
    if pad:
        eos = params["emb"]["weight"][
            jnp.full((B, pad), STOP_TOKEN_INDEX, jnp.int32)
        ]
        x = jnp.concatenate([eos.astype(x.dtype), x], axis=1)
        mask = jnp.concatenate([jnp.zeros((B, pad), bool), mask], axis=1)
    m = mask[..., None]

    v_first = None
    for i, blk in enumerate(params["blocks"]):
        if grad_cp:
            fn = jax.checkpoint(
                lambda p, xx, mm, vf, i=i: block_x070_mixffn(p, cfg, i, xx, mm, vf)
            )
            x, v_first = fn(blk, x, m, v_first)
        else:
            x, v_first = block_x070_mixffn(blk, cfg, i, x, m, v_first)
    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    return linear(params["head"], x, jnp.dtype(cfg.compute_dtype))


# ---------------------------------------------------------------------------
# VRWKV vision encoder (ImageNet pretraining branch)
# ---------------------------------------------------------------------------

VRWKV_DEPTH = 6
IMAGENET_CLASSES = 1000


def init_vrwkv_params(key: Array, cfg: RWKVConfig, patch_size: int = 14) -> Params:
    import dataclasses

    # init ratio formulas assume layer_id < n_layer; VRWKV always has
    # VRWKV_DEPTH blocks regardless of the LM depth
    cfg = dataclasses.replace(cfg, n_layer=max(cfg.n_layer, VRWKV_DEPTH))
    keys = jax.random.split(key, VRWKV_DEPTH * 2 + 2)
    C = cfg.n_embd
    blocks: List[Params] = []
    for i in range(VRWKV_DEPTH):
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "att": init_tmix_x070(keys[2 * i], cfg, i),
            "ffn": init_cmix_x070(keys[2 * i + 1], cfg, i),
        }
        if i == 0:
            blk["ln0"] = _ln_init(C)
        blocks.append(blk)
    return {
        "emb": {
            "weight": jax.random.normal(
                keys[-2], (patch_size * patch_size * 3, C), jnp.float32
            )
            * 0.02,
            "bias": jnp.zeros((C,), jnp.float32),
        },
        "blocks": blocks,
        "ln_out": _ln_init(C),
        "head": {
            "weight": jax.random.normal(keys[-1], (C, IMAGENET_CLASSES), jnp.float32)
            * 0.02,
            "bias": jnp.zeros((IMAGENET_CLASSES,), jnp.float32),
        },
    }


def vrwkv_forward(params: Params, cfg: RWKVConfig, pixels: Array,
                  patch_size: int = 14, grad_cp: bool = False):
    """pixels [B, H, W, 3] (normalized) -> (patch features [B, T, C],
    ImageNet logits [B, 1000])."""
    patch = patch_size
    dt = jnp.dtype(cfg.compute_dtype)
    B, H, W, _ = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, gh, patch, gw, patch, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, patch * patch * 3)
    x = jnp.matmul(x.astype(dt), params["emb"]["weight"].astype(dt),
                   preferred_element_type=jnp.float32) + params["emb"]["bias"]
    x = x.astype(dt)

    T = x.shape[1]
    pad = (-T) % cfg.chunk_len
    if pad:
        x = jnp.concatenate([jnp.zeros((B, pad, x.shape[-1]), x.dtype), x], axis=1)

    v_first = None
    for i, blk in enumerate(params["blocks"]):
        def body(p, xx, vf, i=i):
            if i == 0:
                xx = layer_norm(p["ln0"], xx)
            h, vf, _, _ = tmix_x070(p["att"], cfg, i, layer_norm(p["ln1"], xx), vf)
            xx = xx + h
            f, _ = cmix_x070(p["ffn"], cfg, layer_norm(p["ln2"], xx))
            return xx + f, vf

        if grad_cp:
            x, v_first = jax.checkpoint(body)(blk, x, v_first)
        else:
            x, v_first = body(blk, x, v_first)

    x = layer_norm(params["ln_out"], x)
    if pad:
        x = x[:, pad:]
    cls_logits = (
        jnp.matmul(
            x.mean(axis=1).astype(dt), params["head"]["weight"].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params["head"]["bias"]
    )
    return x, cls_logits


def imagenet_loss(cls_logits: Array, labels: Array) -> Array:
    logz = jax.nn.logsumexp(cls_logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(
        cls_logits.astype(jnp.float32), labels[:, None], axis=-1
    )[:, 0]
    return (logz - gold).mean()


def pretrain_mode_mask(params: Params) -> Params:
    """Trainable mask for enable_pretrain_mode: VRWKV + ffn_v/ln_v only
    (reference v7.10/src/model.py:438-443)."""
    def decide(path, _):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if keys and keys[0] == "vrwkv":
            return True
        return any(k in ("ffn_v", "ln_v") for k in keys)

    return jax.tree_util.tree_map_with_path(decide, params)
