"""Combined released-checkpoint import (reference export.py:14-27 layout:
rwkv.* / proj.* / vit.{dino,siglip,sam}_featurizer.* with timm / vendored-SAM
tower layouts). Validated by constructing the SAME weights in both the HF
layout (already parity-tested against real HF models in test_vision.py) and
the timm/vendored layout, and requiring identical imported trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.convert.pth_import import (
    export_rwkv_state_dict,
    import_visualrwkv_checkpoint,
)
from visualrwkv_tpu.convert.vision_import import (
    import_dinov2_vision,
    import_sam_vision,
    import_timm_vit,
)

rng = np.random.default_rng(0)


def _r(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def make_vit_weights(C=32, depth=2, mlp=64, n_patch=4, n_reg=2, patch=8):
    ws = {
        "cls_token": _r(C), "reg": _r(n_reg, C), "pos": _r(1 + n_patch, C),
        "patch_w": _r(C, 3, patch, patch), "patch_b": _r(C),
        "ln_out": (_r(C), _r(C)),
        "blocks": [
            {
                "ln1": (_r(C), _r(C)), "ln2": (_r(C), _r(C)),
                "q": _r(C, C), "k": _r(C, C), "v": _r(C, C), "qkv_b": _r(3 * C),
                "proj": (_r(C, C), _r(C)),
                "fc1": (_r(mlp, C), _r(mlp)), "fc2": (_r(C, mlp), _r(C)),
                "ls1": _r(C), "ls2": _r(C),
            }
            for _ in range(depth)
        ],
    }
    return ws


def to_hf_dinov2(w):
    sd = {
        "embeddings.cls_token": w["cls_token"].reshape(1, 1, -1),
        "embeddings.register_tokens": w["reg"][None],
        "embeddings.position_embeddings": w["pos"][None],
        "embeddings.patch_embeddings.projection.weight": w["patch_w"],
        "embeddings.patch_embeddings.projection.bias": w["patch_b"],
        "layernorm.weight": w["ln_out"][0], "layernorm.bias": w["ln_out"][1],
    }
    for i, b in enumerate(w["blocks"]):
        base = f"encoder.layer.{i}"
        sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"] = b["ln1"]
        sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"] = b["ln2"]
        C = b["q"].shape[0]
        for n, m in (("query", "q"), ("key", "k"), ("value", "v")):
            sd[f"{base}.attention.attention.{n}.weight"] = b[m]
        sd[f"{base}.attention.attention.query.bias"] = b["qkv_b"][:C]
        sd[f"{base}.attention.attention.key.bias"] = b["qkv_b"][C : 2 * C]
        sd[f"{base}.attention.attention.value.bias"] = b["qkv_b"][2 * C :]
        sd[f"{base}.attention.output.dense.weight"], sd[f"{base}.attention.output.dense.bias"] = b["proj"]
        sd[f"{base}.mlp.fc1.weight"], sd[f"{base}.mlp.fc1.bias"] = b["fc1"]
        sd[f"{base}.mlp.fc2.weight"], sd[f"{base}.mlp.fc2.bias"] = b["fc2"]
        sd[f"{base}.layer_scale1.lambda1"] = b["ls1"]
        sd[f"{base}.layer_scale2.lambda1"] = b["ls2"]
    return sd


def to_timm(w):
    sd = {
        "cls_token": w["cls_token"].reshape(1, 1, -1),
        "reg_token": w["reg"][None],
        "pos_embed": w["pos"][None],
        "patch_embed.proj.weight": w["patch_w"],
        "patch_embed.proj.bias": w["patch_b"],
        "norm.weight": w["ln_out"][0], "norm.bias": w["ln_out"][1],
    }
    for i, b in enumerate(w["blocks"]):
        base = f"blocks.{i}"
        sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"] = b["ln1"]
        sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"] = b["ln2"]
        sd[f"{base}.attn.qkv.weight"] = np.concatenate([b["q"], b["k"], b["v"]], axis=0)
        sd[f"{base}.attn.qkv.bias"] = b["qkv_b"]
        sd[f"{base}.attn.proj.weight"], sd[f"{base}.attn.proj.bias"] = b["proj"]
        sd[f"{base}.mlp.fc1.weight"], sd[f"{base}.mlp.fc1.bias"] = b["fc1"]
        sd[f"{base}.mlp.fc2.weight"], sd[f"{base}.mlp.fc2.bias"] = b["fc2"]
        sd[f"{base}.ls1.gamma"] = b["ls1"]
        sd[f"{base}.ls2.gamma"] = b["ls2"]
    return sd


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, v in la:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(lb[jax.tree_util.keystr(p)]), err_msg=str(p))


def test_timm_layout_matches_hf_layout():
    w = make_vit_weights()
    hf = import_dinov2_vision(to_hf_dinov2(w), dst_grid=2)
    tm = import_timm_vit(to_timm(w), dst_grid=2)
    assert_trees_equal(hf, tm)


def test_timm_no_cls_pos_gets_zero_row():
    w = make_vit_weights(n_patch=4)
    sd = to_timm(w)
    sd["pos_embed"] = w["pos"][None, 1:]  # patches only (no_embed_class)
    tm = import_timm_vit(sd, dst_grid=2)
    np.testing.assert_array_equal(tm["pos_embed"][0], np.zeros_like(tm["pos_embed"][0]))


def test_sam_vendored_sequential_neck():
    """Vendored/Meta layout (Sequential neck, mlp.lin1/lin2, reference
    sam.py:149-167) imports identically with and without the Meta prefix."""
    C, mlp, P = 16, 32, 8
    sd = {
        "patch_embed.proj.weight": _r(C, 3, P, P),
        "patch_embed.proj.bias": _r(C),
        "pos_embed": _r(1, 4, 4, C),
        "neck.0.weight": _r(8, C, 1, 1),
        "neck.1.weight": _r(8), "neck.1.bias": _r(8),
        "neck.2.weight": _r(8, 8, 3, 3),
        "neck.3.weight": _r(8), "neck.3.bias": _r(8),
    }
    for i in range(2):
        base = f"blocks.{i}"
        sd[f"{base}.norm1.weight"], sd[f"{base}.norm1.bias"] = _r(C), _r(C)
        sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"] = _r(C), _r(C)
        sd[f"{base}.attn.qkv.weight"], sd[f"{base}.attn.qkv.bias"] = _r(3 * C, C), _r(3 * C)
        sd[f"{base}.attn.proj.weight"], sd[f"{base}.attn.proj.bias"] = _r(C, C), _r(C)
        sd[f"{base}.attn.rel_pos_h"] = _r(7, C // 2)
        sd[f"{base}.attn.rel_pos_w"] = _r(7, C // 2)
        sd[f"{base}.mlp.lin1.weight"], sd[f"{base}.mlp.lin1.bias"] = _r(mlp, C), _r(mlp)
        sd[f"{base}.mlp.lin2.weight"], sd[f"{base}.mlp.lin2.bias"] = _r(C, mlp), _r(C)
    bare = import_sam_vision(sd)
    meta = import_sam_vision({f"image_encoder.{k}": v for k, v in sd.items()})
    assert_trees_equal(bare, meta)
    assert len(bare["blocks"]) == 2


@pytest.mark.slow
def test_combined_checkpoint_roundtrip_forward():
    """Synthetic combined checkpoint (reference key layout) -> import ->
    vlm_forward produces finite logits."""
    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.data.conversation import IMAGE_TOKEN_INDEX
    from visualrwkv_tpu.models.rwkv7 import init_rwkv7_params
    from visualrwkv_tpu.models.visualrwkv import vlm_forward
    from visualrwkv_tpu.vision.vit import ViTConfig

    C, in_dim = 32, 32
    rcfg = RWKVConfig(n_layer=2, n_embd=C, vocab_size=66000, head_size=16,
                      compute_dtype="float32", ctx_len=64)
    lm_params = init_rwkv7_params(jax.random.PRNGKey(0), rcfg)
    sd = {f"rwkv.{k}": v for k, v in export_rwkv_state_dict(lm_params).items()}
    for k, v in to_timm(make_vit_weights(C=in_dim, n_patch=4, n_reg=2)).items():
        sd[f"vit.dino_featurizer.{k}"] = v
    sd["proj.gate.weight"] = _r(in_dim, in_dim)
    sd["proj.o_proj.weight"] = _r(C, in_dim)
    sd["proj.ln_v.weight"], sd["proj.ln_v.bias"] = _r(C), _r(C)

    params = import_visualrwkv_checkpoint(sd, dst_grid=2)
    assert set(params) == {"rwkv", "proj", "vit"}

    tiny_vit = ViTConfig(img_size=16, patch_size=8, width=in_dim, depth=2,
                         heads=2, mlp_dim=64, use_cls=True, num_reg=2,
                         layerscale=True, compute_dtype="float32")
    cfg = VLMConfig(
        rwkv=rcfg,
        vision=VisionConfig(towers=("dino",), image_size=16, dino_dim=in_dim,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="mlp", num_token_per_image=4,
    )
    ids = np.full((1, 16), 7, np.int64)
    ids[:, :4] = IMAGE_TOKEN_INDEX
    logits = vlm_forward(params, cfg, jnp.asarray(ids),
                         {"dino": jnp.zeros((1, 16, 16, 3), jnp.uint8)})
    assert np.all(np.isfinite(np.asarray(logits)))
