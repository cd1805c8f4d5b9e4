"""Vision backbone ensembles.

The flagship triple ensemble concatenates per-patch features from DINOv2-L,
SigLIP-SO400M and SAM-B on the channel dim: D = 1024 + 1152 + 1024 = 3200
(reference SamDinoSigLIPViTBackbone, VisualRWKV-v7/v7.00/src/vision.py:123-145).
Single-tower variants (SigLIP-only v7.01-v7.04, CLIP v6.01) are configs of the
same interface.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from visualrwkv_tpu.config import VisionConfig
from visualrwkv_tpu.data.transforms import normalize_uint8
from visualrwkv_tpu.vision.sam import SAM_VIT_B, SAMConfig, init_sam_params, sam_features
from visualrwkv_tpu.vision.vit import (
    DINOV2_L_REG4,
    SIGLIP_SO400M,
    ViTConfig,
    init_vit_params,
    vit_features,
)

Array = jax.Array
Params = Dict[str, Any]


def tower_configs(cfg: VisionConfig, compute_dtype: str = "bfloat16") -> Dict[str, Any]:
    """Per-tower architecture configs for the enabled towers."""
    import dataclasses

    out: Dict[str, Any] = {}
    overrides = cfg.tower_config_overrides or {}
    for t in cfg.towers:
        if t in overrides:
            out[t] = dataclasses.replace(overrides[t], compute_dtype=compute_dtype)
        elif t == "dino":
            out[t] = dataclasses.replace(
                DINOV2_L_REG4, img_size=cfg.image_size, compute_dtype=compute_dtype
            )
        elif t == "siglip":
            out[t] = dataclasses.replace(
                SIGLIP_SO400M, img_size=cfg.image_size, compute_dtype=compute_dtype
            )
        elif t == "sam":
            out[t] = dataclasses.replace(
                SAM_VIT_B, img_size=cfg.sam_image_size, compute_dtype=compute_dtype
            )
        elif t == "clip":
            from visualrwkv_tpu.vision.vit import CLIP_L_336

            out[t] = dataclasses.replace(CLIP_L_336, compute_dtype=compute_dtype)
        else:
            raise ValueError(f"unknown tower {t}")
    return out


def init_backbone_params(key: Array, cfg: VisionConfig, compute_dtype="bfloat16") -> Params:
    cfgs = tower_configs(cfg, compute_dtype)
    keys = jax.random.split(key, len(cfgs))
    params: Params = {}
    for k, (name, tcfg) in zip(keys, cfgs.items()):
        if isinstance(tcfg, SAMConfig):
            params[name] = init_sam_params(k, tcfg)
        else:
            params[name] = init_vit_params(k, tcfg)
    return params


def backbone_tower_features(
    params: Params,
    cfg: VisionConfig,
    images: Dict[str, Array],
    compute_dtype: str = "bfloat16",
    normalized: bool = False,
) -> Dict[str, Array]:
    """Per-tower patch features (used by the UHD fusion path, which combines
    towers spatially instead of concatenating per patch)."""
    cfgs = tower_configs(cfg, compute_dtype)
    out: Dict[str, Array] = {}
    for name in cfg.towers:
        x = images[name]
        if not normalized:
            x = normalize_uint8(x, name, jnp.dtype(compute_dtype))
        tcfg = cfgs[name]
        if isinstance(tcfg, SAMConfig):
            out[name] = sam_features(params[name], tcfg, x)
        else:
            out[name] = vit_features(params[name], tcfg, x)
    return out


def backbone_features(
    params: Params,
    cfg: VisionConfig,
    images: Dict[str, Array],
    compute_dtype: str = "bfloat16",
    normalized: bool = False,
) -> Array:
    """Run enabled towers and concatenate patch features on the channel dim.

    images: per-tower pixel batches; uint8 [N, H, W, 3] (normalized on device,
    fused with the tower's first matmul) or pre-normalized when
    ``normalized=True``. All towers must yield the same token count (1024 at
    448px/14 and 1024px/16+s2d).
    Returns [N, L, sum(dims)].
    """
    cfgs = tower_configs(cfg, compute_dtype)
    feats = []
    for name in cfg.towers:
        x = images[name]
        if not normalized:
            x = normalize_uint8(x, name, jnp.dtype(compute_dtype))
        tcfg = cfgs[name]
        if isinstance(tcfg, SAMConfig):
            f = sam_features(params[name], tcfg, x)
        else:
            f = vit_features(params[name], tcfg, x)
        feats.append(f.astype(jnp.dtype(compute_dtype)))
    lens = {f.shape[1] for f in feats}
    assert len(lens) == 1, f"towers disagree on token count: {lens}"
    return jnp.concatenate(feats, axis=-1)
