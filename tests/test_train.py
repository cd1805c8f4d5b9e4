"""End-to-end training smoke tests on the 8-device virtual CPU mesh:
loss decreases, grad accumulation equivalence, freezing, ZeRO sharding."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig
from visualrwkv_tpu.data.conversation import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
from visualrwkv_tpu.parallel.mesh import make_mesh
from visualrwkv_tpu.train.optim import trainable_mask, weight_decay_mask
from visualrwkv_tpu.train.trainer import Trainer
from visualrwkv_tpu.vision.vit import ViTConfig


def tiny_vlm_cfg():
    tiny_vit = ViTConfig(
        img_size=16, patch_size=8, width=32, depth=1, heads=2, mlp_dim=64,
        use_cls=False, num_reg=0, layerscale=False,
    )
    return VLMConfig(
        rwkv=RWKVConfig(
            n_layer=2, n_embd=64, vocab_size=66000, head_size=32,
            compute_dtype="float32", ctx_len=32,
        ),
        vision=VisionConfig(
            towers=("dino",), image_size=16, dino_dim=32,
            tower_config_overrides={"dino": tiny_vit},
        ),
        proj_type="linear",
        num_token_per_image=4,
    )


def make_batch(key, bsz=8, T=32):
    k1, k2 = jax.random.split(key)
    ids = np.array(jax.random.randint(k1, (bsz, T), 0, 300))
    ids[:, :4] = IMAGE_TOKEN_INDEX
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    images = {
        "dino": np.asarray(
            jax.random.randint(k2, (bsz, 16, 16, 3), 0, 255), np.uint8
        )
    }
    return {"input_ids": ids, "labels": labels, "images": images}


def test_loss_decreases_on_mesh():
    cfg = tiny_vlm_cfg()
    tcfg = TrainConfig(
        lr_init=1e-2, lr_final=1e-2, epoch_steps=8, epoch_count=1,
        micro_bsz=8, grad_cp=True, zero_stage=1, grad_clip=1.0,
    )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()  # 8 virtual devices
    assert mesh.shape["data"] == 8
    trainer = Trainer(cfg, tcfg, params, mesh=mesh)

    fixed = make_batch(jax.random.PRNGKey(1))
    losses = []

    def batch_fn(step):
        return fixed

    trainer.run_epoch(batch_fn, epoch=0)
    losses = [h["loss"] for h in trainer.history]
    assert losses[-1] < losses[0], losses


def test_grad_accum_equivalence():
    """accum=2 over 8 samples ~= accum=1 over the same 8 samples."""
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(3))
    mesh = make_mesh(n_data=1)

    results = {}
    for accum in (1, 2):
        tcfg = TrainConfig(
            lr_init=1e-3, lr_final=1e-3, epoch_steps=1, epoch_count=1,
            accumulate_grad_batches=accum, grad_cp=False, zero_stage=0,
            grad_clip=0.0,
        )
        trainer = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        trainer.run_epoch(lambda s: batch, epoch=0)
        results[accum] = trainer.state.params

    l1 = jax.tree_util.tree_leaves(results[1])
    l2 = jax.tree_util.tree_leaves(results[2])
    # not bit-identical (loss is averaged per microbatch vs full batch), but close
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4)


def test_masks():
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(freeze_rwkv_layers=1, freeze_proj=True)
    mask = trainable_mask(params, tcfg, cfg.rwkv.n_layer)
    # vit always frozen; proj frozen; block 0 frozen; block 1 trainable
    assert not any(jax.tree_util.tree_leaves(mask["vit"]))
    assert not any(jax.tree_util.tree_leaves(mask["proj"]))
    assert not any(jax.tree_util.tree_leaves(mask["rwkv"]["blocks"][0]))
    assert all(jax.tree_util.tree_leaves(mask["rwkv"]["blocks"][1]))
    assert all(jax.tree_util.tree_leaves(mask["rwkv"]["emb"]))

    wd = weight_decay_mask(params)
    assert wd["rwkv"]["head"]["weight"]  # 2-D: decayed
    assert not wd["rwkv"]["blocks"][0]["ln1"]["weight"]  # 1-D: not decayed
