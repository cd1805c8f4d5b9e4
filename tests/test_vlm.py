"""VisualRWKV multimodal assembly tests: scatter semantics, adaptive pooling,
projector, end-to-end forward + loss, L2Wrap gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig, VisionConfig, VLMConfig
from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visualrwkv_tpu.models import visualrwkv as vlm
from visualrwkv_tpu.multimodal.projector import (
    adaptive_pool_tokens,
    scatter_image_features,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    from visualrwkv_tpu.vision.vit import ViTConfig

    tiny_vit = ViTConfig(
        img_size=32, patch_size=8, width=64, depth=2, heads=4, mlp_dim=128,
        act="gelu", use_cls=False, num_reg=0, layerscale=False,
    )
    return VLMConfig(
        rwkv=RWKVConfig(
            n_layer=2, n_embd=128, vocab_size=66000, head_size=64,
            compute_dtype="float32", ctx_len=64,
        ),
        vision=VisionConfig(
            towers=("dino",), image_size=32, dino_dim=64,
            tower_config_overrides={"dino": tiny_vit},
        ),
        proj_type="mlp",
        num_token_per_image=4,
    )


def test_adaptive_pool_exact():
    x = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    out = adaptive_pool_tokens(x, 4)
    assert out.shape == (2, 4, 3)
    grid = np.asarray(x).reshape(2, 4, 4, 3)
    expect = grid.reshape(2, 2, 2, 2, 2, 3).mean(axis=(2, 4)).reshape(2, 4, 3)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_scatter_orders_features():
    ids = jnp.array([[5, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 7],
                     [IMAGE_TOKEN_INDEX, 9, IMAGE_TOKEN_INDEX, 3]])
    emb = jnp.zeros((2, 4, 2))
    feats = jnp.arange(1, 9, dtype=jnp.float32).reshape(4, 2)
    out = scatter_image_features(ids, emb, feats)
    np.testing.assert_allclose(np.asarray(out[0, 1]), [1, 2])
    np.testing.assert_allclose(np.asarray(out[0, 2]), [3, 4])
    np.testing.assert_allclose(np.asarray(out[1, 0]), [5, 6])
    np.testing.assert_allclose(np.asarray(out[1, 2]), [7, 8])
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 0])  # text untouched


@pytest.mark.slow
def test_vlm_forward_and_loss(tiny_cfg):
    cfg = tiny_cfg
    params = vlm.init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 32
    key = jax.random.PRNGKey(1)
    ids = jax.random.randint(key, (B, T), 0, 1000)
    # one image per sample: 4 image tokens at the front
    ids = ids.at[:, :4].set(IMAGE_TOKEN_INDEX)
    labels = jnp.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    images = {
        "dino": jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32, 3), 0, 255).astype(jnp.uint8)
    }
    logits = vlm.vlm_forward(params, cfg, ids, images)
    assert logits.shape == (B, T, cfg.rwkv.vocab_size)
    loss = vlm.training_loss(params, cfg, ids, labels, images, grad_cp=False)
    assert jnp.isfinite(loss)
    assert float(loss) > 0


@pytest.mark.slow
def test_vision_tower_frozen(tiny_cfg):
    cfg = tiny_cfg
    params = vlm.init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.full((1, 8), IMAGE_TOKEN_INDEX, jnp.int32).at[:, 4:].set(11)
    labels = jnp.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    images = {"dino": jnp.zeros((1, 32, 32, 3), jnp.uint8)}
    grads = jax.grad(
        lambda p: vlm.training_loss(p, cfg, ids, labels, images, grad_cp=False)
    )(params)
    vit_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["vit"]))
    proj_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["proj"]))
    rwkv_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["rwkv"]))
    assert vit_norm == 0.0  # stop_gradient before the projector
    assert proj_norm > 0
    assert rwkv_norm > 0


def test_l2wrap_gradient():
    logits = jnp.array([[[1.0, 3.0, 2.0]]])

    def f(lg):
        return vlm.l2wrap(jnp.sum(lg) * 0.0, lg)

    g = jax.grad(f)(logits)
    expect = np.zeros((1, 1, 3))
    expect[0, 0, 1] = 3.0 * 1e-4 / 1
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6)


@pytest.mark.slow
def test_chunked_ce_matches_dense(tiny_cfg):
    """chunked_ce_l2wrap (never materializes full logits) must match the
    dense loss AND its gradients (incl. the L2Wrap injection) exactly."""
    import jax

    from visualrwkv_tpu.models.visualrwkv import training_loss

    cfg = tiny_cfg
    params = vlm.init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 32
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 300, (B, T))
    ids[:, :4] = IMAGE_TOKEN_INDEX
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    labels[0, -6:] = IGNORE_INDEX  # uneven valid counts across the batch
    images = {"dino": rng.integers(0, 255, (B, 32, 32, 3)).astype(np.uint8)}

    args = (jnp.asarray(ids), jnp.asarray(labels), {k: jnp.asarray(v) for k, v in images.items()})

    def loss_dense(p):
        return training_loss(p, cfg, *args, grad_cp=False, chunked_ce=False)

    def loss_chunked(p):
        return training_loss(p, cfg, *args, grad_cp=False, chunked_ce=True, ce_chunk_t=16)

    ld, gd = jax.value_and_grad(loss_dense)(params)
    lc, gc = jax.value_and_grad(loss_chunked)(params)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gd), jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_chunked_ce_falls_back_when_indivisible(tiny_cfg):
    import jax

    from visualrwkv_tpu.models.visualrwkv import training_loss

    cfg = tiny_cfg
    params = vlm.init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = np.full((1, 30), 7, np.int64)  # 30 % 128 != 0 -> dense path
    labels = ids.copy()
    l = training_loss(params, cfg, jnp.asarray(ids), jnp.asarray(labels), None,
                      grad_cp=False, chunked_ce=True)
    assert np.isfinite(float(l))
