"""Vision tower weight converters: HF-transformers checkpoints -> our pytrees.

The reference loads DINOv2/SigLIP through timm and SAM through its vendored
implementation (VisualRWKV-v7/v7.00/src/vision.py:58-70); the same pretrained
weights are published as HF-transformers checkpoints (Dinov2WithRegisters,
SiglipVisionModel, SamModel), whose state-dict layouts these converters map.

All converters take a flat ``{name: np.ndarray}`` state dict (use
``pth_import.load_pth`` or ``model.state_dict()``) and return parameter trees
for :mod:`visualrwkv_tpu.vision.vit` / :mod:`visualrwkv_tpu.vision.sam`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def _conv_to_patch_matrix(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [C, 3, p, p] -> [p*p*3, C] ((ph, pw, cin) raster)."""
    C = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, C)


def interpolate_pos_embed(pos: np.ndarray, src_grid: int, dst_grid: int) -> np.ndarray:
    """Bicubic 2-D interpolation of patch position embeddings [N, C]."""
    if src_grid == dst_grid:
        return pos
    import jax
    import jax.numpy as jnp

    C = pos.shape[-1]
    grid = jnp.asarray(pos, jnp.float32).reshape(1, src_grid, src_grid, C)
    out = jax.image.resize(grid, (1, dst_grid, dst_grid, C), "bicubic")
    return np.asarray(out).reshape(dst_grid * dst_grid, C)


def _fuse_qkv(sd: Mapping, prefix: str, q: str, k: str, v: str) -> Params:
    qkv_w = np.concatenate(
        [_np(sd[f"{prefix}.{n}.weight"]).T for n in (q, k, v)], axis=1
    )
    qkv_b = np.concatenate([_np(sd[f"{prefix}.{n}.bias"]) for n in (q, k, v)])
    return {"weight": qkv_w, "bias": qkv_b}


def import_siglip_vision(sd: Mapping, dst_grid: int) -> Params:
    """HF SiglipVisionModel state dict -> ViT params (no cls, no layerscale)."""
    pre = "vision_model"
    if not any(key.startswith(pre) for key in sd):
        pre = ""
    g = lambda name: _np(sd[f"{pre}.{name}" if pre else name])

    pos = g("embeddings.position_embedding.weight")
    src_grid = int(round(pos.shape[0] ** 0.5))
    p: Params = {
        "patch_embed": {
            "weight": _conv_to_patch_matrix(g("embeddings.patch_embedding.weight")),
            "bias": g("embeddings.patch_embedding.bias"),
        },
        "pos_embed": interpolate_pos_embed(pos, src_grid, dst_grid),
        "blocks": [],
        "ln_out": {"weight": g("post_layernorm.weight"), "bias": g("post_layernorm.bias")},
    }
    i = 0
    while f"{pre + '.' if pre else ''}encoder.layers.{i}.layer_norm1.weight" in sd:
        base = f"encoder.layers.{i}"
        p["blocks"].append(
            {
                "ln1": {"weight": g(f"{base}.layer_norm1.weight"), "bias": g(f"{base}.layer_norm1.bias")},
                "ln2": {"weight": g(f"{base}.layer_norm2.weight"), "bias": g(f"{base}.layer_norm2.bias")},
                "attn": {
                    "qkv": _fuse_qkv(
                        sd, f"{pre + '.' if pre else ''}{base}.self_attn", "q_proj", "k_proj", "v_proj"
                    ),
                    "proj": {
                        "weight": g(f"{base}.self_attn.out_proj.weight").T,
                        "bias": g(f"{base}.self_attn.out_proj.bias"),
                    },
                },
                "mlp": {
                    "fc1": {"weight": g(f"{base}.mlp.fc1.weight").T, "bias": g(f"{base}.mlp.fc1.bias")},
                    "fc2": {"weight": g(f"{base}.mlp.fc2.weight").T, "bias": g(f"{base}.mlp.fc2.bias")},
                },
            }
        )
        i += 1
    return p


def import_clip_vision(sd: Mapping, dst_grid: int) -> Params:
    """HF CLIPVisionModel state dict -> ViT params (cls, pre-LN, quick-gelu)."""
    pre = "vision_model"
    if not any(key.startswith(pre) for key in sd):
        pre = ""
    g = lambda name: _np(sd[f"{pre}.{name}" if pre else name])

    pos = g("embeddings.position_embedding.weight")  # [1+N, C]
    cls_pos, patch_pos = pos[:1], pos[1:]
    src_grid = int(round(patch_pos.shape[0] ** 0.5))
    patch_pos = interpolate_pos_embed(patch_pos, src_grid, dst_grid)
    p: Params = {
        "cls_token": g("embeddings.class_embedding").reshape(-1),
        "patch_embed": {
            "weight": _conv_to_patch_matrix(g("embeddings.patch_embedding.weight")),
        },
        "pos_embed": np.concatenate([cls_pos, patch_pos], axis=0),
        # note: HF spells it "pre_layrnorm"
        "pre_ln": {"weight": g("pre_layrnorm.weight"), "bias": g("pre_layrnorm.bias")},
        "blocks": [],
        "ln_out": {"weight": g("post_layernorm.weight"), "bias": g("post_layernorm.bias")},
    }
    i = 0
    while f"{pre + '.' if pre else ''}encoder.layers.{i}.layer_norm1.weight" in sd:
        base = f"encoder.layers.{i}"
        p["blocks"].append(
            {
                "ln1": {"weight": g(f"{base}.layer_norm1.weight"), "bias": g(f"{base}.layer_norm1.bias")},
                "ln2": {"weight": g(f"{base}.layer_norm2.weight"), "bias": g(f"{base}.layer_norm2.bias")},
                "attn": {
                    "qkv": _fuse_qkv(
                        sd, f"{pre + '.' if pre else ''}{base}.self_attn", "q_proj", "k_proj", "v_proj"
                    ),
                    "proj": {
                        "weight": g(f"{base}.self_attn.out_proj.weight").T,
                        "bias": g(f"{base}.self_attn.out_proj.bias"),
                    },
                },
                "mlp": {
                    "fc1": {"weight": g(f"{base}.mlp.fc1.weight").T, "bias": g(f"{base}.mlp.fc1.bias")},
                    "fc2": {"weight": g(f"{base}.mlp.fc2.weight").T, "bias": g(f"{base}.mlp.fc2.bias")},
                },
            }
        )
        i += 1
    return p


def import_dinov2_vision(sd: Mapping, dst_grid: int) -> Params:
    """HF Dinov2WithRegistersModel state dict -> ViT params (cls+reg, layerscale)."""
    g = lambda name: _np(sd[name])
    pos = g("embeddings.position_embeddings")[0]  # [1+N, C]
    cls_pos, patch_pos = pos[:1], pos[1:]
    src_grid = int(round(patch_pos.shape[0] ** 0.5))
    patch_pos = interpolate_pos_embed(patch_pos, src_grid, dst_grid)
    p: Params = {
        "cls_token": g("embeddings.cls_token").reshape(-1),
        "reg_tokens": g("embeddings.register_tokens")[0],
        "patch_embed": {
            "weight": _conv_to_patch_matrix(g("embeddings.patch_embeddings.projection.weight")),
            "bias": g("embeddings.patch_embeddings.projection.bias"),
        },
        "pos_embed": np.concatenate([cls_pos, patch_pos], axis=0),
        "blocks": [],
        "ln_out": {"weight": g("layernorm.weight"), "bias": g("layernorm.bias")},
    }
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        base = f"encoder.layer.{i}"
        p["blocks"].append(
            {
                "ln1": {"weight": g(f"{base}.norm1.weight"), "bias": g(f"{base}.norm1.bias")},
                "ln2": {"weight": g(f"{base}.norm2.weight"), "bias": g(f"{base}.norm2.bias")},
                "ls1": g(f"{base}.layer_scale1.lambda1"),
                "ls2": g(f"{base}.layer_scale2.lambda1"),
                "attn": {
                    "qkv": _fuse_qkv(sd, f"{base}.attention.attention", "query", "key", "value"),
                    "proj": {
                        "weight": g(f"{base}.attention.output.dense.weight").T,
                        "bias": g(f"{base}.attention.output.dense.bias"),
                    },
                },
                "mlp": {
                    "fc1": {"weight": g(f"{base}.mlp.fc1.weight").T, "bias": g(f"{base}.mlp.fc1.bias")},
                    "fc2": {"weight": g(f"{base}.mlp.fc2.weight").T, "bias": g(f"{base}.mlp.fc2.bias")},
                },
            }
        )
        i += 1
    return p


def import_sam_vision(sd: Mapping) -> Params:
    """HF SamModel (vision_encoder.*) or Meta SAM (image_encoder.*) -> sam params."""
    if any(k.startswith("vision_encoder.") for k in sd):
        pre, layers, lin1, lin2, qkvname = "vision_encoder", "layers", "lin1", "lin2", "qkv"
    else:  # Meta SAM checkpoint layout (reference sam.py:463-506 filter)
        pre, layers, lin1, lin2, qkvname = "image_encoder", "blocks", "lin1", "lin2", "qkv"
    g = lambda name: _np(sd[f"{pre}.{name}"])

    def patch_key(name):
        return f"patch_embed.projection.{name}" if f"{pre}.patch_embed.projection.weight" in sd else f"patch_embed.proj.{name}"

    p: Params = {
        "patch_embed": {
            "weight": _conv_to_patch_matrix(g(patch_key("weight"))),
            "bias": g(patch_key("bias")),
        },
        "pos_embed": g("pos_embed")[0],  # [64, 64, C]
        "blocks": [],
        "neck": {
            "conv1": {"weight": g("neck.conv1.weight").transpose(2, 3, 1, 0)},
            "ln1": {"weight": g("neck.layer_norm1.weight"), "bias": g("neck.layer_norm1.bias")}
            if f"{pre}.neck.layer_norm1.weight" in sd
            else {"weight": g("neck.ln1.weight"), "bias": g("neck.ln1.bias")},
            "conv2": {"weight": g("neck.conv2.weight").transpose(2, 3, 1, 0)},
            "ln2": {"weight": g("neck.layer_norm2.weight"), "bias": g("neck.layer_norm2.bias")}
            if f"{pre}.neck.layer_norm2.weight" in sd
            else {"weight": g("neck.ln2.weight"), "bias": g("neck.ln2.bias")},
        },
    }
    i = 0
    while f"{pre}.{layers}.{i}.layer_norm1.weight" in sd or f"{pre}.{layers}.{i}.norm1.weight" in sd:
        base = f"{layers}.{i}"
        ln = "layer_norm" if f"{pre}.{base}.layer_norm1.weight" in sd else "norm"
        p["blocks"].append(
            {
                "ln1": {"weight": g(f"{base}.{ln}1.weight"), "bias": g(f"{base}.{ln}1.bias")},
                "ln2": {"weight": g(f"{base}.{ln}2.weight"), "bias": g(f"{base}.{ln}2.bias")},
                "attn": {
                    "qkv": {
                        "weight": g(f"{base}.attn.qkv.weight").T,
                        "bias": g(f"{base}.attn.qkv.bias"),
                    },
                    "proj": {
                        "weight": g(f"{base}.attn.proj.weight").T,
                        "bias": g(f"{base}.attn.proj.bias"),
                    },
                    "rel_pos_h": g(f"{base}.attn.rel_pos_h"),
                    "rel_pos_w": g(f"{base}.attn.rel_pos_w"),
                },
                "mlp": {
                    "fc1": {"weight": g(f"{base}.mlp.{lin1}.weight").T, "bias": g(f"{base}.mlp.{lin1}.bias")},
                    "fc2": {"weight": g(f"{base}.mlp.{lin2}.weight").T, "bias": g(f"{base}.mlp.{lin2}.bias")},
                },
            }
        )
        i += 1
    return p
