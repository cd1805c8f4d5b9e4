"""Vision->language projectors and token-space utilities.

- linear / gated-MLP projector (reference MLPWithContextGating,
  VisualRWKV-v7/v7.00/src/model.py:328-338 and linear option :350-353)
- exact adaptive average pooling L -> num_token_per_image (:354,442-447)
- jit-friendly scatter of image features into IMAGE_TOKEN_INDEX positions
  (:473-494)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from visualrwkv_tpu.data.conversation import IMAGE_TOKEN_INDEX

Array = jax.Array
Params = Dict[str, Any]


def init_projector_params(key: Array, proj_type: str, in_dim: int, n_embd: int) -> Params:
    k1, k2 = jax.random.split(key)
    if proj_type == "linear":
        return {
            "weight": jax.random.normal(k1, (in_dim, n_embd), jnp.float32)
            * (in_dim**-0.5)
        }
    if proj_type == "mlp":  # gated MLP with context gating
        return {
            "gate": {
                "weight": jax.random.normal(k1, (in_dim, in_dim), jnp.float32)
                * (in_dim**-0.5)
            },
            "o_proj": {
                "weight": jax.random.normal(k2, (in_dim, n_embd), jnp.float32)
                * (in_dim**-0.5)
            },
            "ln_v": {
                "weight": jnp.ones((n_embd,), jnp.float32),
                "bias": jnp.zeros((n_embd,), jnp.float32),
            },
        }
    raise ValueError(f"unknown proj_type {proj_type}")


def apply_projector(p: Params, proj_type: str, x: Array, dtype=jnp.bfloat16) -> Array:
    dt = jnp.dtype(dtype)
    if proj_type == "linear":
        return jnp.matmul(x.astype(dt), p["weight"].astype(dt), preferred_element_type=jnp.float32).astype(dt)
    gating = jax.nn.sigmoid(
        jnp.matmul(x.astype(dt), p["gate"]["weight"].astype(dt), preferred_element_type=jnp.float32)
    )
    h = jnp.matmul(
        (x.astype(jnp.float32) * gating).astype(dt),
        p["o_proj"]["weight"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    out = (h - mean) * jax.lax.rsqrt(var + 1e-5) * p["ln_v"]["weight"] + p["ln_v"]["bias"]
    return out.astype(dt)


def adaptive_pool_tokens(x: Array, num_tokens: int) -> Array:
    """[N, L, D] -> [N, num_tokens, D] by exact 2-D average pooling.

    Matches ``nn.AdaptiveAvgPool2d(sqrt(num_tokens))`` for the supported cases
    where sqrt(num_tokens) divides sqrt(L) (16/64/256/1024 over a 32x32 grid).
    """
    N, L, D = x.shape
    src = int(round(L**0.5))
    dst = int(round(num_tokens**0.5))
    assert src * src == L and dst * dst == num_tokens, (L, num_tokens)
    if src == dst:
        return x
    assert src % dst == 0, f"adaptive pool requires {dst} | {src}"
    f = src // dst
    xf = x.astype(jnp.float32).reshape(N, dst, f, dst, f, D)
    return xf.mean(axis=(2, 4)).reshape(N, num_tokens, D).astype(x.dtype)


def grid_pooling(image_features: Array, grid_size: int) -> Array:
    """CLIP-style pooling with a CLS token at position 0 (v5/v6.0 grid pooling,
    v6.0/src/model.py:467-485 and the demo's modeling_vision.py:30-48).

    grid_size: -1 = no pooling (patches + cls appended), 0 = cls only,
    1 = global avg + cls, N = NxN average pooling + cls.
    """
    cls_features = image_features[:, 0:1]
    patches = image_features[:, 1:]
    if grid_size == -1:
        return jnp.concatenate([patches, cls_features], axis=1)
    if grid_size == 0:
        return cls_features
    if grid_size == 1:
        return jnp.concatenate(
            [patches.mean(axis=1, keepdims=True), cls_features], axis=1
        )
    B, L, D = patches.shape
    hw = int(round(L**0.5))
    assert hw * hw == L and hw % grid_size == 0, (L, grid_size)
    stride = hw // grid_size
    xf = patches.astype(jnp.float32).reshape(B, grid_size, stride, grid_size, stride, D)
    pooled = xf.mean(axis=(2, 4)).reshape(B, grid_size * grid_size, D)
    return jnp.concatenate([pooled.astype(image_features.dtype), cls_features], axis=1)


def scatter_image_features(
    input_ids: Array, input_embeds: Array, image_features: Array
) -> Array:
    """Place flattened image features at IMAGE_TOKEN_INDEX positions, in order.

    jit-friendly equivalent of ``input_embeds[ids == IMG] = feats`` (reference
    src/model.py:481-493). The k-th image token (in flattened batch-major
    order) receives the k-th feature row; if there are more image tokens than
    features the last feature row repeats (the reference truncates features on
    the mismatch path and warns — shape mismatches should be prevented
    upstream by the dataset).
    """
    B, T = input_ids.shape
    D = input_embeds.shape[-1]
    flat_ids = input_ids.reshape(B * T)
    flat_emb = input_embeds.reshape(B * T, D)
    feats = image_features.reshape(-1, D).astype(flat_emb.dtype)
    mask = flat_ids == IMAGE_TOKEN_INDEX
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1
    order = jnp.clip(order, 0, feats.shape[0] - 1)
    gathered = feats[order]
    out = jnp.where(mask[:, None], gathered, flat_emb)
    return out.reshape(B, T, D)
