"""Flash-attention parity: the vision-tower Pallas paths (stock kernel for
ViT MHA, custom decomposed-rel-pos kernel for SAM global attention) must
match the jnp reference paths bit-closely in fp32 interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.vision.flash import (
    flash_mha,
    sam_attend_reference,
    sam_flash_attention,
    sam_flash_supported,
    vision_flash,
)


def _rel(x, y):
    return float(jnp.linalg.norm(x - y) / (jnp.linalg.norm(y) + 1e-30))


@pytest.mark.parametrize("N", [256, 200])  # 200 exercises pad + segment mask
def test_flash_mha_matches_dot_product_attention(N):
    key = jax.random.PRNGKey(0)
    B, h, hd = 2, 2, 32
    q, k, v = (
        jax.random.normal(kk, (B, N, h, hd), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    ref = jax.nn.dot_product_attention(q, k, v)
    out = flash_mha(q, k, v)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 2e-6, _rel(out, ref)


def test_sam_flash_matches_reference():
    key = jax.random.PRNGKey(1)
    G, H, W, hd = 3, 16, 16, 32
    N = H * W
    assert sam_flash_supported(N, W)
    ks = jax.random.split(key, 5)
    q, k, v = (jax.random.normal(kk, (G, N, hd), jnp.float32) for kk in ks[:3])
    rel_h = jax.random.normal(ks[3], (G, N, H), jnp.float32)
    rel_w = jax.random.normal(ks[4], (G, N, W), jnp.float32)
    scale = hd**-0.5

    ref = sam_attend_reference(q, k, v, rel_h, rel_w, scale)
    out = sam_flash_attention(q, k, v, rel_h, rel_w, scale)
    assert _rel(out, ref) < 2e-6, _rel(out, ref)

    # bias actually matters: zeroing it must change the answer
    out0 = sam_flash_attention(q, k, v, jnp.zeros_like(rel_h),
                               jnp.zeros_like(rel_w), scale)
    assert _rel(out0, ref) > 1e-3


def test_sam_flash_gradients_match_reference():
    key = jax.random.PRNGKey(2)
    G, H, W, hd = 1, 16, 16, 16
    N = H * W
    ks = jax.random.split(key, 5)
    q, k, v = (jax.random.normal(kk, (G, N, hd), jnp.float32) for kk in ks[:3])
    rel_h = 0.1 * jax.random.normal(ks[3], (G, N, H), jnp.float32)
    rel_w = 0.1 * jax.random.normal(ks[4], (G, N, W), jnp.float32)
    scale = hd**-0.5

    def loss_flash(q, k, v, rh, rw):
        return jnp.sum(jnp.sin(sam_flash_attention(q, k, v, rh, rw, scale)))

    def loss_ref(q, k, v, rh, rw):
        return jnp.sum(jnp.sin(sam_attend_reference(q, k, v, rh, rw, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for gf, gr in zip(g_flash, g_ref):
        assert _rel(gf, gr) < 1e-5, _rel(gf, gr)


@pytest.mark.slow
def test_vit_attention_flash_equivalence():
    """vit.attention with flash forced on == the jnp path, through real
    qkv/proj weights (N=256 >= _FLASH_MIN_TOKENS so flash engages)."""
    from visualrwkv_tpu.vision import vit

    cfg = vit.ViTConfig(img_size=128, patch_size=8, width=64, depth=1, heads=2,
                        mlp_dim=128, use_cls=False, num_reg=0, layerscale=False)
    params = vit.init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = np.random.default_rng(0).integers(
        0, 255, (1, 128, 128, 3), np.uint8
    )
    px = jnp.asarray(pixels, jnp.float32) / 255.0
    with vision_flash("off"):
        ref = vit.vit_features(params, cfg, px)
    with vision_flash("on"):
        out = vit.vit_features(params, cfg, px)
    assert _rel(out, ref) < 1e-5, _rel(out, ref)


@pytest.mark.slow
def test_sam_tower_flash_equivalence():
    """Full SAM tower with a big-enough grid that attention_relpos takes the
    flash branch (grid 64x64 needs _MAX_DENSE_TOKENS < N; use a config whose
    global layer sees N=4096... too slow in interpret, so shrink
    _MAX_DENSE_TOKENS instead)."""
    from visualrwkv_tpu.vision import sam as sam_mod

    cfg = sam_mod.SAMConfig(img_size=128, patch_size=8, width=32, depth=2,
                            heads=2, mlp_dim=64, out_chans=16, window_size=4,
                            global_attn_indexes=(1,), compute_dtype="float32")
    params = sam_mod.init_sam_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (1, 128, 128, 3), np.uint8),
        jnp.float32,
    ) / 255.0

    old = sam_mod._MAX_DENSE_TOKENS
    try:
        with vision_flash("off"):
            ref = sam_mod.sam_features(params, cfg, px)
        sam_mod._MAX_DENSE_TOKENS = 128  # force the >dense branch (N=256)
        with vision_flash("on"):
            out = sam_mod.sam_features(params, cfg, px)
        with vision_flash("off"):
            chunked = sam_mod.sam_features(params, cfg, px)
    finally:
        sam_mod._MAX_DENSE_TOKENS = old
    assert _rel(out, ref) < 1e-5, _rel(out, ref)
    assert _rel(chunked, ref) < 1e-5


def test_sam_flash_gradients_multiblock():
    """Fused backward with MULTIPLE key/query blocks (N=1024 -> 2 blocks of
    512): exercises the cross-block accumulation of dq/drel (pass 1) and
    dk/dv (pass 2), which the N=256 single-block case cannot."""
    key = jax.random.PRNGKey(5)
    G, H, W, hd = 1, 32, 32, 16
    N = H * W
    ks = jax.random.split(key, 5)
    q, k, v = (jax.random.normal(kk, (G, N, hd), jnp.float32) for kk in ks[:3])
    rel_h = 0.1 * jax.random.normal(ks[3], (G, N, H), jnp.float32)
    rel_w = 0.1 * jax.random.normal(ks[4], (G, N, W), jnp.float32)
    scale = hd**-0.5
    assert sam_flash_supported(N, W)

    def loss_flash(*a):
        return jnp.sum(jnp.sin(sam_flash_attention(*a, scale)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(sam_attend_reference(*a, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for gf, gr in zip(g_flash, g_ref):
        assert _rel(gf, gr) < 1e-5, _rel(gf, gr)
