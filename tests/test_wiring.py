"""Integration wiring tests: VTC inside encode_images, scanning option,
bucketed collate, gpt4v crops, checkpoint resume with optimizer state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
from visualrwkv_tpu.data.dataset import collate
from visualrwkv_tpu.data.tiling import gpt4v_crop
from visualrwkv_tpu.models.visualrwkv import encode_images, init_visualrwkv_params
from visualrwkv_tpu.vision.vit import ViTConfig


def tiny_cfg(**kw):
    tiny_vit = ViTConfig(img_size=16, patch_size=8, width=32, depth=1, heads=2,
                         mlp_dim=64, use_cls=False, num_reg=0, layerscale=False)
    return VLMConfig(
        rwkv=RWKVConfig(n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
                        compute_dtype="float32", ctx_len=64),
        vision=VisionConfig(towers=("dino",), image_size=16, dino_dim=32,
                            tower_config_overrides={"dino": tiny_vit}),
        proj_type="linear", num_token_per_image=4, **kw,
    )


@pytest.mark.slow
def test_vtc_in_encode_images():
    from visualrwkv_tpu.multimodal.vtc import init_vtc_params

    cfg = tiny_cfg(n_vtc_layer=1)
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    params["vtc"] = init_vtc_params(jax.random.PRNGKey(1), cfg.rwkv, 1)
    images = {"dino": np.zeros((2, 16, 16, 3), np.uint8)}
    feats = encode_images(params, cfg, images)
    assert feats.shape == (2, 4, 64)


def test_scanning_in_encode_images():
    cfg = tiny_cfg(image_scanning="bidirection")
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    images = {"dino": np.zeros((1, 16, 16, 3), np.uint8)}
    feats = encode_images(params, cfg, images)
    assert feats.shape == (1, 8, 64)  # bidirection doubles the token count


def test_bucketed_collate():
    def item(n_img, sid):
        return {
            "input_ids": np.zeros(8, np.int64), "labels": np.zeros(8, np.int64),
            "sample_id": sid, "input_text": "",
            "images": {"dino": np.ones((n_img, 4, 4, 3), np.uint8)},
        }

    b = collate([item(2, "a"), item(1, "b")], pad_images_to=6)
    assert b["images"]["dino"].shape == (6, 4, 4, 3)
    assert b["images"]["dino"][:3].sum() > 0  # real images first
    assert b["images"]["dino"][3:].sum() == 0  # zero padding at the end
    with pytest.raises(ValueError):
        collate([item(7, "c")], pad_images_to=6)


def test_gpt4v_crop():
    from PIL import Image

    wide = Image.new("RGB", (900, 500))
    crops = gpt4v_crop(wide, "high")
    assert len(crops) == 7  # full + 2x3
    assert gpt4v_crop(wide, "low") == [wide]
    tall = Image.new("RGB", (500, 900))
    assert len(gpt4v_crop(tall, "high")) == 7


@pytest.mark.slow
def test_checkpoint_resume_with_optimizer(tmp_path):
    from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from visualrwkv_tpu.parallel.mesh import make_mesh
    from visualrwkv_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    tcfg = TrainConfig(lr_init=1e-3, lr_final=1e-3, epoch_steps=2, epoch_count=1,
                       micro_bsz=2, grad_cp=False, zero_stage=0)
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=1)
    ids = np.full((2, 16), 7, np.int64)
    ids[:, :4] = IMAGE_TOKEN_INDEX
    batch = {
        "input_ids": ids,
        "labels": np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids),
        "images": {"dino": np.zeros((2, 16, 16, 3), np.uint8)},
    }
    t1 = Trainer(cfg, tcfg, params, mesh=mesh, proj_dir=str(tmp_path))
    t1.run_epoch(lambda s: batch, 0)
    ckpt = str(tmp_path / "ckpt")
    t1.save_checkpoint(ckpt)

    t2 = Trainer(cfg, tcfg, init_visualrwkv_params(jax.random.PRNGKey(1), cfg),
                 mesh=mesh, proj_dir=str(tmp_path))
    t2.load_checkpoint(ckpt)
    assert int(t2.state.step) == int(t1.state.step)
    a = jax.tree_util.tree_leaves(t1.state.params)[0]
    b = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments restored
    la = jax.tree_util.tree_leaves(t1.state.opt_state)
    lb = jax.tree_util.tree_leaves(t2.state.opt_state)
    restored_any = any(
        hasattr(x, "shape") and x.size > 1 and np.allclose(np.asarray(x), np.asarray(y))
        and float(np.abs(np.asarray(x)).sum()) > 0
        for x, y in zip(la, lb)
    )
    assert restored_any


@pytest.mark.slow
def test_uhd_fusion_in_encode_images():
    cfg = tiny_cfg(uhd_fusion=True)
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    # projector input dim doubled
    key0 = next(iter(params["proj"]))
    # 2 images x 5 tiles each, single tower
    images = {"dino": np.zeros((10, 16, 16, 3), np.uint8)}
    from visualrwkv_tpu.models.visualrwkv import encode_images

    feats = encode_images(params, cfg, images)
    assert feats.shape == (2, 4, 64)  # N_img=2, pooled to 4 tokens, n_embd


@pytest.mark.slow
def test_grid_pooling_in_encode_images():
    tiny_clip = ViTConfig(img_size=16, patch_size=8, width=32, depth=1, heads=2,
                          mlp_dim=64, use_cls=True, num_reg=0, layerscale=False,
                          pre_ln=True, patch_bias=False, keep_cls_feature=True)
    cfg = tiny_cfg(grid_size=1)
    cfg = cfg.replace(vision=VisionConfig(
        towers=("clip",), image_size=16, clip_dim=32,
        tower_config_overrides={"clip": tiny_clip}))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    images = {"clip": np.zeros((2, 16, 16, 3), np.uint8)}
    feats = encode_images(params, cfg, images)
    assert feats.shape == (2, 2, 64)  # global-avg + cls tokens


def test_image_to_regions():
    """v7.02 region splitting (reference v7.02/src/utils.py:100-117): resize
    to the best bucket, split row-major into region_size tiles."""
    from PIL import Image

    from visualrwkv_tpu.data.tiling import image_to_regions

    img = Image.new("RGB", (2000, 1000), (255, 0, 0))
    # paint the right half blue so region ordering is observable
    img.paste(Image.new("RGB", (1000, 1000), (0, 0, 255)), (1000, 0))

    regions = image_to_regions(img, region_size=448)
    # 2000x1000 fits the 896x448 bucket exactly -> 1 row x 2 cols, row-major
    assert len(regions) == 2
    assert all(r.size == (448, 448) for r in regions)
    r0 = np.asarray(regions[0]).reshape(-1, 3).mean(0)
    r1 = np.asarray(regions[1]).reshape(-1, 3).mean(0)
    assert r0[0] > 200 and r0[2] < 50   # left region red
    assert r1[2] > 200 and r1[0] < 50   # right region blue

    # a tall image picks the transposed bucket (448x896) -> 2 rows x 1 col
    tall = Image.new("RGB", (1000, 2000), (0, 255, 0))
    regions = image_to_regions(tall, region_size=448)
    assert len(regions) == 2
    assert all(r.size == (448, 448) for r in regions)
