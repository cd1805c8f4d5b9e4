"""Generic ViT encoder core (covers DINOv2-with-registers and SigLIP towers).

One configurable implementation replaces the reference's two timm featurizers
(VisualRWKV-v7/v7.00/src/vision.py:58-81):

- ``vit_large_patch14_reg4_dinov2``: cls token + 4 register tokens, LayerScale,
  exact GELU, pos-embed over cls+patches;
- ``vit_so400m_patch14_siglip_384``: no cls, tanh-approximate GELU, conv bias.

Both are consumed through second-to-last-layer patch features (the reference's
``get_intermediate_layers(n={depth-2})`` monkey-patch, vision.py:76-81), so
:func:`vit_features` runs only the blocks it needs and never materializes the
final norm/head.

TPU notes: patchify is a space-to-depth + matmul (MXU) instead of a conv;
softmax/LN run fp32; all matmuls bf16 with fp32 accumulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 448
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    act: str = "gelu"  # "gelu" | "gelu_tanh" | "quick_gelu"
    use_cls: bool = True
    num_reg: int = 0
    layerscale: bool = False
    pre_ln: bool = False  # CLIP-style LayerNorm after embeddings
    patch_bias: bool = True
    keep_cls_feature: bool = False  # CLIP grid pooling wants [cls, patches]
    ln_eps: float = 1e-6
    feature_layer: int = -2  # which block's output to return (negative ok)
    compute_dtype: str = "bfloat16"

    @property
    def grid(self) -> int:
        assert self.img_size % self.patch_size == 0
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


DINOV2_L_REG4 = ViTConfig(
    img_size=448, patch_size=14, width=1024, depth=24, heads=16, mlp_dim=4096,
    act="gelu", use_cls=True, num_reg=4, layerscale=True,
)
SIGLIP_SO400M = ViTConfig(
    img_size=448, patch_size=14, width=1152, depth=27, heads=16, mlp_dim=4304,
    act="gelu_tanh", use_cls=False, num_reg=0, layerscale=False,
)
CLIP_L_336 = ViTConfig(
    img_size=336, patch_size=14, width=1024, depth=24, heads=16, mlp_dim=4096,
    act="quick_gelu", use_cls=True, num_reg=0, layerscale=False,
    pre_ln=True, patch_bias=False, keep_cls_feature=True,
    ln_eps=1e-5,
)


def _ln_init(C: int) -> Params:
    return {"weight": jnp.ones((C,), jnp.float32), "bias": jnp.zeros((C,), jnp.float32)}


def _linear_init(key, din, dout, std=0.02) -> Params:
    return {
        "weight": jax.random.normal(key, (din, dout), jnp.float32) * std,
        "bias": jnp.zeros((dout,), jnp.float32),
    }


def init_vit_params(key: Array, cfg: ViTConfig) -> Params:
    keys = jax.random.split(key, cfg.depth * 4 + 4)
    C = cfg.width
    p: Params = {
        "patch_embed": {
            "weight": jax.random.normal(
                keys[0], (cfg.patch_size * cfg.patch_size * 3, C), jnp.float32
            )
            * 0.02,
        },
        "pos_embed": jax.random.normal(
            keys[1], (cfg.num_patches + (1 if cfg.use_cls else 0), C), jnp.float32
        )
        * 0.02,
        "blocks": [],
    }
    if cfg.patch_bias:
        p["patch_embed"]["bias"] = jnp.zeros((C,), jnp.float32)
    if cfg.pre_ln:
        p["pre_ln"] = _ln_init(C)
    if cfg.use_cls:
        p["cls_token"] = jnp.zeros((C,), jnp.float32)
    if cfg.num_reg:
        p["reg_tokens"] = jax.random.normal(keys[2], (cfg.num_reg, C), jnp.float32) * 0.02
    for i in range(cfg.depth):
        k = keys[4 + i * 4 : 8 + i * 4]
        blk = {
            "ln1": _ln_init(C),
            "ln2": _ln_init(C),
            "attn": {
                "qkv": _linear_init(k[0], C, 3 * C),
                "proj": _linear_init(k[1], C, C),
            },
            "mlp": {
                "fc1": _linear_init(k[2], C, cfg.mlp_dim),
                "fc2": _linear_init(k[3], cfg.mlp_dim, C),
            },
        }
        if cfg.layerscale:
            blk["ls1"] = jnp.full((C,), 1e-5, jnp.float32)
            blk["ls2"] = jnp.full((C,), 1e-5, jnp.float32)
        p["blocks"].append(blk)
    p["ln_out"] = _ln_init(C)
    return p


def layer_norm(p: Params, x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]).astype(x.dtype)


def _dense(p: Params, x: Array, dt) -> Array:
    y = jnp.matmul(x.astype(dt), p["weight"].astype(dt), preferred_element_type=jnp.float32)
    return y + p["bias"] if "bias" in p else y


def _act(x: Array, kind: str) -> Array:
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if kind == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


_FLASH_MIN_TOKENS = 256  # below this the N^2 logits fit VMEM anyway


def attention(p: Params, x: Array, heads: int, dt) -> Array:
    """Bidirectional MHA. On TPU at encoder-scale token counts the fused
    Pallas flash-attention kernel runs the softmax-matmul chain without
    materializing the [B, h, N, N] logits in HBM (BASELINE north star);
    small inputs / CPU use jax.nn.dot_product_attention (XLA fuses the
    chain; fp32 softmax internally)."""
    from visualrwkv_tpu.vision.flash import flash_enabled, flash_mha

    B, N, C = x.shape
    hd = C // heads
    qkv = _dense(p["qkv"], x, dt).reshape(B, N, 3, heads, hd)
    q, k, v = (qkv[:, :, i].astype(dt) for i in range(3))  # [B, N, h, hd]
    if N >= _FLASH_MIN_TOKENS and flash_enabled():
        out = flash_mha(q, k, v)
    else:
        out = jax.nn.dot_product_attention(q, k, v)
    out = out.reshape(B, N, C)
    return _dense(p["proj"], out, dt)


def patchify(p: Params, pixels: Array, patch: int, dt) -> Array:
    """[B, H, W, 3] -> [B, N, C] via space-to-depth + matmul (MXU-friendly).

    Weight layout is ``[patch*patch*3, C]`` with (ph, pw, c) raster order, the
    transpose-reshape of a torch ``Conv2d(3, C, patch, patch).weight``.
    """
    B, H, W, _ = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, gh, patch, gw, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch * patch * 3)
    return _dense(p, x, dt)


def vit_block(p: Params, cfg: ViTConfig, x: Array, dt) -> Array:
    h = attention(p["attn"], layer_norm(p["ln1"], x, cfg.ln_eps), cfg.heads, dt)
    if cfg.layerscale:
        h = h * p["ls1"]
    x = x + h.astype(x.dtype)
    h = _dense(p["mlp"]["fc2"], _act(_dense(p["mlp"]["fc1"], layer_norm(p["ln2"], x, cfg.ln_eps), dt), cfg.act).astype(dt), dt)
    if cfg.layerscale:
        h = h * p["ls2"]
    return x + h.astype(x.dtype)


def vit_features(
    params: Params, cfg: ViTConfig, pixels: Array, feature_layer: Optional[int] = None
) -> Array:
    """Patch features [B, num_patches, width] at `feature_layer` (default cfg's).

    Matches timm ``get_intermediate_layers``: prefix tokens stripped, no final
    norm applied.
    """
    dt = jnp.dtype(cfg.compute_dtype)
    fl = cfg.feature_layer if feature_layer is None else feature_layer
    fl = fl % cfg.depth
    x = patchify(params["patch_embed"], pixels, cfg.patch_size, dt)
    B = x.shape[0]
    n_prefix = 0
    if cfg.use_cls:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        n_prefix = 1
    x = x + params["pos_embed"].astype(x.dtype)
    if cfg.num_reg:
        reg = jnp.broadcast_to(
            params["reg_tokens"], (B, cfg.num_reg, cfg.width)
        ).astype(x.dtype)
        x = jnp.concatenate([x[:, :n_prefix], reg, x[:, n_prefix:]], axis=1)
        n_prefix += cfg.num_reg
    if cfg.pre_ln:
        x = layer_norm(params["pre_ln"], x, cfg.ln_eps)
    for i in range(fl + 1):
        x = vit_block(params["blocks"][i], cfg, x, dt)
    if cfg.keep_cls_feature:  # CLIP demo path: [cls, patches] for grid pooling
        return x
    return x[:, n_prefix:]
