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
    """SAM image encoder -> sam params.

    Layouts: HF SamModel (``vision_encoder.*``), Meta SAM checkpoints
    (``image_encoder.*``, Sequential neck ``neck.{0..3}``), or the reference's
    vendored encoder with no prefix — what ``vit.sam_featurizer.*`` inside a
    combined VisualRWKV checkpoint strips down to (reference sam.py:149-167).
    """
    if any(k.startswith("vision_encoder.") for k in sd):
        pre, layers = "vision_encoder", "layers"
    elif any(k.startswith("image_encoder.") for k in sd):
        pre, layers = "image_encoder", "blocks"
    else:
        pre, layers = "", "blocks"
    dot = f"{pre}." if pre else ""
    g = lambda name: _np(sd[f"{dot}{name}"])

    def patch_key(name):
        return f"patch_embed.projection.{name}" if f"{dot}patch_embed.projection.weight" in sd else f"patch_embed.proj.{name}"

    def neck_part(conv_key, seq_idx):
        # HF names the neck convs/LNs; Meta + vendored use nn.Sequential indices
        return conv_key if f"{dot}neck.{conv_key}.weight" in sd else str(seq_idx)

    p: Params = {
        "patch_embed": {
            "weight": _conv_to_patch_matrix(g(patch_key("weight"))),
            "bias": g(patch_key("bias")),
        },
        "pos_embed": g("pos_embed")[0],  # [64, 64, C]
        "blocks": [],
        "neck": {
            "conv1": {"weight": g(f"neck.{neck_part('conv1', 0)}.weight").transpose(2, 3, 1, 0)},
            "ln1": {
                "weight": g(f"neck.{neck_part('layer_norm1', 1)}.weight"),
                "bias": g(f"neck.{neck_part('layer_norm1', 1)}.bias"),
            },
            "conv2": {"weight": g(f"neck.{neck_part('conv2', 2)}.weight").transpose(2, 3, 1, 0)},
            "ln2": {
                "weight": g(f"neck.{neck_part('layer_norm2', 3)}.weight"),
                "bias": g(f"neck.{neck_part('layer_norm2', 3)}.bias"),
            },
        },
    }
    i = 0
    while f"{dot}{layers}.{i}.layer_norm1.weight" in sd or f"{dot}{layers}.{i}.norm1.weight" in sd:
        base = f"{layers}.{i}"
        ln = "layer_norm" if f"{dot}{base}.layer_norm1.weight" in sd else "norm"
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
                    "fc1": {"weight": g(f"{base}.mlp.lin1.weight").T, "bias": g(f"{base}.mlp.lin1.bias")},
                    "fc2": {"weight": g(f"{base}.mlp.lin2.weight").T, "bias": g(f"{base}.mlp.lin2.bias")},
                },
            }
        )
        i += 1
    return p


def import_timm_vit(sd: Mapping, dst_grid: int) -> Params:
    """timm VisionTransformer state dict -> ViT params.

    Covers the layouts inside released VisualRWKV checkpoints, whose towers
    are timm models saved under ``vit.{dino,siglip}_featurizer.*`` (reference
    vision.py:58-81): fused ``blocks.{i}.attn.qkv``, optional ``cls_token`` /
    ``reg_token`` / LayerScale ``ls{1,2}.gamma``; the SigLIP variant's unused
    ``attn_pool.*`` head is skipped (features are taken from the
    second-to-last layer). When the model has no positional row for the cls
    token (timm ``no_embed_class``), a zeros row is emitted — numerically
    identical to timm's "add pos to patches only".
    """
    g = lambda name: _np(sd[name])
    pos = g("pos_embed")[0]  # [N(+1), C]
    C = pos.shape[-1]
    has_cls = "cls_token" in sd
    n_pos = pos.shape[0]
    src_grid = int(round(n_pos**0.5))
    if has_cls and src_grid * src_grid != n_pos:  # pos covers cls + patches
        cls_pos, patch_pos = pos[:1], pos[1:]
        src_grid = int(round(patch_pos.shape[0] ** 0.5))
    else:  # patches only (no_embed_class) -> zero pos for cls
        cls_pos, patch_pos = np.zeros((1, C), pos.dtype), pos
    patch_pos = interpolate_pos_embed(patch_pos, src_grid, dst_grid)

    p: Params = {
        "patch_embed": {"weight": _conv_to_patch_matrix(g("patch_embed.proj.weight"))},
        "blocks": [],
        "ln_out": {"weight": g("norm.weight"), "bias": g("norm.bias")},
    }
    if "patch_embed.proj.bias" in sd:
        p["patch_embed"]["bias"] = g("patch_embed.proj.bias")
    if has_cls:
        p["cls_token"] = g("cls_token").reshape(-1)
        p["pos_embed"] = np.concatenate([cls_pos, patch_pos], axis=0)
    else:
        p["pos_embed"] = patch_pos
    if "reg_token" in sd:
        p["reg_tokens"] = g("reg_token")[0]

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        base = f"blocks.{i}"
        blk = {
            "ln1": {"weight": g(f"{base}.norm1.weight"), "bias": g(f"{base}.norm1.bias")},
            "ln2": {"weight": g(f"{base}.norm2.weight"), "bias": g(f"{base}.norm2.bias")},
            "attn": {
                "qkv": {
                    "weight": g(f"{base}.attn.qkv.weight").T,
                    "bias": g(f"{base}.attn.qkv.bias"),
                },
                "proj": {
                    "weight": g(f"{base}.attn.proj.weight").T,
                    "bias": g(f"{base}.attn.proj.bias"),
                },
            },
            "mlp": {
                "fc1": {"weight": g(f"{base}.mlp.fc1.weight").T, "bias": g(f"{base}.mlp.fc1.bias")},
                "fc2": {"weight": g(f"{base}.mlp.fc2.weight").T, "bias": g(f"{base}.mlp.fc2.bias")},
            },
        }
        if f"{base}.ls1.gamma" in sd:
            blk["ls1"] = g(f"{base}.ls1.gamma")
            blk["ls2"] = g(f"{base}.ls2.gamma")
        p["blocks"].append(blk)
        i += 1
    return p


def export_timm_vit(p: Params, patch_size: int = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_timm_vit`: ViT params -> timm state-dict
    layout (the layout inside released combined checkpoints). Used to
    synthesize reference-layout checkpoints for converter round-trip and
    golden-file tests; keys/shapes mirror timm VisionTransformer."""
    sd: Dict[str, np.ndarray] = {}
    pe = np.asarray(p["patch_embed"]["weight"])  # [p*p*3, C]
    C = pe.shape[1]
    if patch_size is None:
        patch_size = int(round((pe.shape[0] // 3) ** 0.5))
    sd["patch_embed.proj.weight"] = (
        pe.reshape(patch_size, patch_size, 3, C).transpose(3, 2, 0, 1)
    )
    if "bias" in p["patch_embed"]:
        sd["patch_embed.proj.bias"] = np.asarray(p["patch_embed"]["bias"])
    pos = np.asarray(p["pos_embed"])
    sd["pos_embed"] = pos[None]
    if "cls_token" in p:
        sd["cls_token"] = np.asarray(p["cls_token"]).reshape(1, 1, -1)
    if "reg_tokens" in p:
        sd["reg_token"] = np.asarray(p["reg_tokens"])[None]
    sd["norm.weight"] = np.asarray(p["ln_out"]["weight"])
    sd["norm.bias"] = np.asarray(p["ln_out"]["bias"])
    for i, blk in enumerate(p["blocks"]):
        base = f"blocks.{i}"
        sd[f"{base}.norm1.weight"] = np.asarray(blk["ln1"]["weight"])
        sd[f"{base}.norm1.bias"] = np.asarray(blk["ln1"]["bias"])
        sd[f"{base}.norm2.weight"] = np.asarray(blk["ln2"]["weight"])
        sd[f"{base}.norm2.bias"] = np.asarray(blk["ln2"]["bias"])
        sd[f"{base}.attn.qkv.weight"] = np.asarray(blk["attn"]["qkv"]["weight"]).T
        sd[f"{base}.attn.qkv.bias"] = np.asarray(blk["attn"]["qkv"]["bias"])
        sd[f"{base}.attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["weight"]).T
        sd[f"{base}.attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
        sd[f"{base}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["fc1"]["weight"]).T
        sd[f"{base}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["fc1"]["bias"])
        sd[f"{base}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["fc2"]["weight"]).T
        sd[f"{base}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["fc2"]["bias"])
        if "ls1" in blk:
            sd[f"{base}.ls1.gamma"] = np.asarray(blk["ls1"])
            sd[f"{base}.ls2.gamma"] = np.asarray(blk["ls2"])
    return sd
