"""Legacy v4 adapter: BLIP2-style query-token pretraining (ITC/ITM/LM).

The reference's VisualRWKV-v4 pretrains an adapter of learned task embeddings
that cross-attend to frozen ViT features, trained with image-text contrastive
(ITC), image-text matching (ITM), and language-modeling (LM) losses, feeding a
frozen RWKV-4 RNN at inference (VisualRWKV-v4/visualrwkv/components/
adapter.py:31-80, model.py:11-142).  The reference borrows a T5 decoder for
the adapter; here the adapter is cross-attention blocks over our own stack and
the LM loss runs through the (frozen) RWKV — the architecture the reference
family itself converged to in later versions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import RWKVConfig
from visualrwkv_tpu.models import lm
from visualrwkv_tpu.models.rwkv7 import _ln_init, layer_norm, linear
from visualrwkv_tpu.multimodal.contrastive import in_batch_contrastive_loss
from visualrwkv_tpu.multimodal.hybrid import cross_attention_block, init_cross_block_params

Array = jax.Array
Params = Dict[str, Any]


@dataclass(frozen=True)
class AdapterConfig:
    num_task_embeddings: int = 32
    feature_size: int = 256
    n_adapter_layers: int = 2
    temperature_init: float = 0.07


def init_adapter_params(key: Array, cfg: RWKVConfig, acfg: AdapterConfig) -> Params:
    C = cfg.n_embd
    ks = jax.random.split(key, acfg.n_adapter_layers + 4)
    return {
        "task_embs": jax.random.normal(
            ks[0], (acfg.num_task_embeddings, C), jnp.float32
        )
        * 1e-4,
        "blocks": [
            init_cross_block_params(k, cfg) for k in ks[1 : 1 + acfg.n_adapter_layers]
        ],
        "ln_vision": _ln_init(C),
        "vision_proj": {
            "weight": jax.random.normal(ks[-3], (C, acfg.feature_size)) * C**-0.5
        },
        "text_proj": {
            "weight": jax.random.normal(ks[-2], (C, acfg.feature_size)) * C**-0.5
        },
        "itm_head": {
            "weight": jax.random.normal(ks[-1], (C, 2)) * C**-0.5,
            "bias": jnp.zeros((2,), jnp.float32),
        },
        "temperature": jnp.asarray(AdapterConfig.temperature_init, jnp.float32),
    }


def adapter_queries(params: Params, cfg: RWKVConfig, vit_feats: Array) -> Array:
    """Task embeddings cross-attend to (ln'd) vision features -> [B, Q, C]."""
    B = vit_feats.shape[0]
    feats = layer_norm(params["ln_vision"], vit_feats)
    x = jnp.broadcast_to(
        params["task_embs"], (B,) + params["task_embs"].shape
    ).astype(feats.dtype)
    for blk in params["blocks"]:
        x = cross_attention_block(blk, cfg, x, feats)
    return x


def adapter_pretrain_losses(
    params: Params,
    lm_params: Params,
    cfg: RWKVConfig,
    vit_feats: Array,
    caption_ids: Array,
    caption_mask: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """ITC + ITM + LM losses (reference AdapterOutput fields).

    caption_ids: [B, T] caption tokens (0-padded); caption_mask: [B, T] bool.
    The LM loss conditions the FROZEN RWKV on the adapter queries as a prefix.
    """
    dt = jnp.dtype(cfg.compute_dtype)
    B, T = caption_ids.shape
    queries = adapter_queries(params, cfg, vit_feats)  # [B, Q, C]

    # ITC: pooled query vs pooled caption embedding, symmetric InfoNCE
    vision_feat = linear(params["vision_proj"], queries.mean(axis=1), dt)
    text_emb = lm.embed(lm_params, caption_ids)
    denom = jnp.maximum(caption_mask.sum(-1, keepdims=True), 1)
    text_pooled = (text_emb * caption_mask[..., None]).sum(axis=1) / denom
    text_feat = linear(params["text_proj"], text_pooled, dt)
    # learnable temperature (reference: nn.Parameter(0.07)); the shared helper
    # takes a static temperature, so inline the symmetric InfoNCE here
    temp = jnp.maximum(params["temperature"], 1e-3)
    tf = text_feat.astype(jnp.float32)
    vf = vision_feat.astype(jnp.float32)
    tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-8)
    vf = vf / jnp.maximum(jnp.linalg.norm(vf, axis=-1, keepdims=True), 1e-8)
    labels_itc = jnp.arange(B)

    def _ce(logits):
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels_itc[:, None], axis=-1)[:, 0]
        return (logz - gold).mean()

    loss_itc = (_ce(tf @ vf.T / temp) + _ce(vf @ tf.T / temp)) / 2

    # ITM: matched pairs vs in-batch shuffled negatives, binary head on queries
    neg_queries = jnp.roll(queries, 1, axis=0)
    pooled_pos = (queries.mean(axis=1) + text_pooled).astype(dt)
    pooled_neg = (neg_queries.mean(axis=1) + text_pooled).astype(dt)
    logits_pos = linear(params["itm_head"], pooled_pos, dt)
    logits_neg = linear(params["itm_head"], pooled_neg, dt)
    logits = jnp.concatenate([logits_pos, logits_neg]).astype(jnp.float32)
    labels = jnp.concatenate([jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32)])
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    loss_itm = (logz - gold).mean()

    # LM: frozen RWKV conditioned on the queries as a visual prefix
    x = jnp.concatenate([queries.astype(dt), text_emb.astype(dt)], axis=1)
    logits_lm, _ = lm.lm_forward(jax.lax.stop_gradient(lm_params), cfg, x)
    Q = queries.shape[1]
    pred = logits_lm[:, Q - 1 : Q - 1 + T].astype(jnp.float32)
    logz = jax.nn.logsumexp(pred, axis=-1)
    gold = jnp.take_along_axis(pred, caption_ids[..., None], axis=-1)[..., 0]
    ce = jnp.where(caption_mask, logz - gold, 0.0)
    loss_lm = ce.sum() / jnp.maximum(caption_mask.sum(), 1)

    total = loss_itc + loss_itm + loss_lm
    return total, {"loss_itc": loss_itc, "loss_itm": loss_itm, "loss_lm": loss_lm}
