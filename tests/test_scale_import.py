"""Weights-day rehearsal: import a KEY-COMPLETE random checkpoint at the
RELEASED models' real scales and run a forward.

Real released weights are environment-blocked (zero egress; MODEL_ZOO.md).
These slow tests lock what can be locked without them: the combined-layout
importer's shape/layout handling at 1B5 (triple DINOv2-L/SigLIP-SO400M/SAM-B)
and at 7B x060 — pos-embed grids, rel-pos tables, fused-qkv splits, LoRA
dims, head counts, projector fan-in — plus host/device memory headroom, so
real-checkpoint day is a download, not a debug session.

Reference layouts: export.py:14-27 combined split, MODEL_ZOO.md config map.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.convert.pth_import import (
    detect_rwkv_version,
    export_rwkv_state_dict,
    import_rwkv_state_dict,
    import_visualrwkv_checkpoint,
)

rng = np.random.default_rng(0)


def _r(*shape):
    # direct-fp32 uniform fill: these tests lock SHAPES/layout/memory, not
    # numerics (tiny parity tests cover those) — standard_normal's float64
    # ziggurat costs ~10x more (measured 554 s of a 690 s run at 1B5)
    return rng.random(shape, dtype=np.float32) * 0.04 - 0.02


def random_params_like(init_fn, cfg):
    """Key-complete random param tree at scale WITHOUT running the real
    initializer (whose per-layer orthogonal QRs take minutes at 4096^2 on
    one CPU core): eval_shape for the structure, cheap numpy fill."""
    shapes = jax.eval_shape(
        functools.partial(init_fn, cfg=cfg), jax.random.PRNGKey(0)
    )
    r2 = np.random.default_rng(1)
    return jax.tree_util.tree_map(
        lambda s: r2.random(s.shape, dtype=np.float32) * 0.04 - 0.02,
        shapes,
    )


def timm_vit_sd(prefix, C, depth, mlp, n_patch, patch, n_reg=0, cls=True,
                layerscale=False, pos_cls_row=False):
    """Key-complete timm VisionTransformer state dict at real scale.

    DINOv2-reg4/SigLIP are timm ``no_embed_class`` models: pos_embed covers
    PATCHES ONLY (no cls/register rows) even when cls_token/reg_token exist
    — mirror that (pos_cls_row=True adds the cls row for CLIP-style
    layouts)."""
    n_pos = n_patch + (1 if (cls and pos_cls_row) else 0)
    sd = {
        "pos_embed": _r(1, n_pos, C),
        "patch_embed.proj.weight": _r(C, 3, patch, patch),
        "patch_embed.proj.bias": _r(C),
        "norm.weight": _r(C), "norm.bias": _r(C),
    }
    if cls:
        sd["cls_token"] = _r(1, 1, C)
    if n_reg:
        sd["reg_token"] = _r(1, n_reg, C)
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"], sd[f"{b}.norm1.bias"] = _r(C), _r(C)
        sd[f"{b}.norm2.weight"], sd[f"{b}.norm2.bias"] = _r(C), _r(C)
        sd[f"{b}.attn.qkv.weight"] = _r(3 * C, C)
        sd[f"{b}.attn.qkv.bias"] = _r(3 * C)
        sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"] = _r(C, C), _r(C)
        sd[f"{b}.mlp.fc1.weight"], sd[f"{b}.mlp.fc1.bias"] = _r(mlp, C), _r(mlp)
        sd[f"{b}.mlp.fc2.weight"], sd[f"{b}.mlp.fc2.bias"] = _r(C, mlp), _r(C)
        if layerscale:
            sd[f"{b}.ls1.gamma"] = _r(C)
            sd[f"{b}.ls2.gamma"] = _r(C)
    return {f"{prefix}{k}": v for k, v in sd.items()}


def sam_b_sd(prefix):
    """Key-complete vendored/Meta SAM-B image-encoder state dict (width 768,
    depth 12, 1024px/16 -> 64x64 grid, window 14, global blocks 2/5/8/11,
    Sequential neck; reference sam.py:149-167)."""
    C, mlp, hd = 768, 3072, 64
    sd = {
        "patch_embed.proj.weight": _r(C, 3, 16, 16),
        "patch_embed.proj.bias": _r(C),
        "pos_embed": _r(1, 64, 64, C),
        "neck.0.weight": _r(256, C, 1, 1),
        "neck.1.weight": _r(256), "neck.1.bias": _r(256),
        "neck.2.weight": _r(256, 256, 3, 3),
        "neck.3.weight": _r(256), "neck.3.bias": _r(256),
    }
    for i in range(12):
        rel = 2 * (64 if i in (2, 5, 8, 11) else 14) - 1
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"], sd[f"{b}.norm1.bias"] = _r(C), _r(C)
        sd[f"{b}.norm2.weight"], sd[f"{b}.norm2.bias"] = _r(C), _r(C)
        sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"] = _r(3 * C, C), _r(3 * C)
        sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"] = _r(C, C), _r(C)
        sd[f"{b}.attn.rel_pos_h"] = _r(rel, hd)
        sd[f"{b}.attn.rel_pos_w"] = _r(rel, hd)
        sd[f"{b}.mlp.lin1.weight"], sd[f"{b}.mlp.lin1.bias"] = _r(mlp, C), _r(mlp)
        sd[f"{b}.mlp.lin2.weight"], sd[f"{b}.mlp.lin2.bias"] = _r(C, mlp), _r(C)
    return {f"{prefix}{k}": v for k, v in sd.items()}


@pytest.mark.slow
def test_scale_import_1b5_triple_tower():
    """Full-scale VisualRWKV-7 1B5 combined checkpoint (released layout) ->
    import -> encode one image + LM forward, all shapes at serving scale."""
    from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
    from visualrwkv_tpu.models.rwkv7 import init_rwkv7_params
    from visualrwkv_tpu.models.visualrwkv import encode_images
    from visualrwkv_tpu.models.lm import lm_forward_tokens

    rcfg = RWKVConfig(n_layer=24, n_embd=2048, vocab_size=65536, head_size=64,
                      compute_dtype="float32", ctx_len=2048)
    t0 = time.time()
    lm_params = random_params_like(init_rwkv7_params, rcfg)
    sd = {f"rwkv.{k}": v for k, v in export_rwkv_state_dict(lm_params).items()}
    del lm_params
    # DINOv2-L/14 @448 (timm: 1024/24/4096, 4 registers, layerscale)
    sd.update(timm_vit_sd("vit.dino_featurizer.", C=1024, depth=24, mlp=4096,
                          n_patch=1024, patch=14, n_reg=4, cls=True,
                          layerscale=True))
    # SigLIP-SO400M/14 @448 (timm: 1152/27/4304, no cls)
    sd.update(timm_vit_sd("vit.siglip_featurizer.", C=1152, depth=27, mlp=4304,
                          n_patch=1024, patch=14, cls=False))
    sd.update(sam_b_sd("vit.sam_featurizer."))
    in_dim = 1024 + 1152 + 1024  # dino + siglip + sam(neck 256 * s2d 4)
    sd["proj.gate.weight"] = _r(in_dim, in_dim)
    sd["proj.o_proj.weight"] = _r(2048, in_dim)
    sd["proj.ln_v.weight"], sd["proj.ln_v.bias"] = _r(2048), _r(2048)
    print(f"synth 1B5 sd: {len(sd)} keys, "
          f"{sum(v.nbytes for v in sd.values()) / 2**30:.1f} GiB, "
          f"{time.time() - t0:.0f}s")

    t0 = time.time()
    params = import_visualrwkv_checkpoint(sd, dst_grid=32)
    del sd
    print(f"import: {time.time() - t0:.0f}s")
    assert set(params) == {"rwkv", "proj", "vit"}
    assert set(params["vit"]) == {"dino", "siglip", "sam"}
    assert params["proj"]["o_proj"]["weight"].shape == (in_dim, 2048)
    assert len(params["vit"]["sam"]["blocks"]) == 12

    cfg = VLMConfig(rwkv=rcfg, vision=VisionConfig(), proj_type="mlp",
                    num_token_per_image=1024)
    # one 448/1024px image through the imported towers + projector
    images = {
        "dino": jnp.zeros((1, 448, 448, 3), jnp.uint8),
        "siglip": jnp.zeros((1, 448, 448, 3), jnp.uint8),
        "sam": jnp.zeros((1, 1024, 1024, 3), jnp.uint8),
    }
    t0 = time.time()
    feats = encode_images(params, cfg, images)
    assert feats.shape == (1, 1024, 2048), feats.shape
    assert np.isfinite(np.asarray(feats, np.float32)).all()
    print(f"encode: {time.time() - t0:.0f}s")

    # LM forward at scale (short T; the image path is covered above)
    ids = jnp.asarray(rng.integers(10, 60000, (1, 128)), jnp.int32)
    logits, _ = lm_forward_tokens(params["rwkv"], rcfg, ids)
    assert logits.shape == (1, 128, 65536)
    assert np.isfinite(np.asarray(logits[:, -1], np.float32)).all()


@pytest.mark.slow
def test_scale_import_7b_x060():
    """7B RWKV-6 LM (BASELINE configs[3] geometry: L32 D4096): export to the
    released key layout, auto-detect the version + geometry, re-import, and
    run a short forward."""
    from visualrwkv_tpu.config import RWKVConfig
    from visualrwkv_tpu.models.lm import lm_forward_tokens
    from visualrwkv_tpu.models.rwkv6 import init_rwkv6_params

    rcfg = RWKVConfig(n_layer=32, n_embd=4096, vocab_size=65536, head_size=64,
                      compute_dtype="float32", ctx_len=2048, version="x060")
    t0 = time.time()
    lm_params = random_params_like(init_rwkv6_params, rcfg)
    sd = export_rwkv_state_dict(lm_params)
    del lm_params
    print(f"synth 7B sd: {len(sd)} keys, "
          f"{sum(v.nbytes for v in sd.values()) / 2**30:.1f} GiB, "
          f"{time.time() - t0:.0f}s")

    meta = detect_rwkv_version(sd)
    assert meta["version"] == "x060", meta
    assert meta["n_layer"] == 32 and meta["n_embd"] == 4096, meta

    t0 = time.time()
    params = import_rwkv_state_dict(sd)
    del sd
    print(f"import: {time.time() - t0:.0f}s")
    assert len(params["blocks"]) == 32
    assert params["head"]["weight"].shape == (4096, 65536)

    ids = jnp.asarray(rng.integers(10, 60000, (1, 32)), jnp.int32)
    logits, _ = lm_forward_tokens(params, rcfg, ids)
    assert logits.shape == (1, 32, 65536)
    assert np.isfinite(np.asarray(logits[:, -1], np.float32)).all()
