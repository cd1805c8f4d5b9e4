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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_fp32_master_accumulates_tiny_updates():
    """bf16 params alone stall when |update| << ulp(param); with fp32 masters
    the updates accumulate in the master and surface once they cross an ulp."""
    from visualrwkv_tpu.train.optim import MasterFP32State, make_optimizer

    import optax

    params = {"w": jnp.full((8, 128), 1.0, jnp.bfloat16)}
    grads = {"w": jnp.full((8, 128), 1.0, jnp.bfloat16)}
    tcfg = TrainConfig(lr_init=1e-4, lr_final=1e-4, warmup_steps=0, grad_clip=0.0)
    opt = make_optimizer(tcfg, params, total_steps=1000, n_layer=0)
    state = opt.init(params)
    assert isinstance(state, MasterFP32State)
    assert state.master["w"].dtype == jnp.float32
    # inner Adam moments must be fp32 even though params are bf16
    adam_leaves = [
        x for x in jax.tree_util.tree_leaves(state.inner) if hasattr(x, "dtype")
    ]
    assert all(x.dtype == jnp.float32 for x in adam_leaves if x.ndim == 2)

    p = params
    for _ in range(100):  # Adam update magnitude ~= lr = 1e-4; ulp@1.0 = 2^-8
        upd, state = opt.update(grads, state, p)
        p = optax.apply_updates(p, upd)
    # without masters: 1.0 - 1e-4 rounds back to 1.0 every step
    naive = jnp.bfloat16(1.0) - jnp.bfloat16(1e-4)
    assert float(naive) == 1.0
    # with masters the ~100 * 1e-4 drift is visible in the bf16 params
    assert float(p["w"][0, 0]) < 1.0 - 5e-3
    # bf16 params track the master to <= 1 ulp
    cast = state.master["w"].astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(cast), np.asarray(p["w"]))


@pytest.mark.slow
def test_bf16_param_training_matches_fp32():
    """Full trainer with param_dtype=bfloat16: loss decreases and tracks the
    fp32 run; optimizer state carries fp32 masters; checkpoint round-trips."""
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh()

    histories = {}
    trainers = {}
    for pd in ("float32", "bfloat16"):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=8, epoch_count=1,
            micro_bsz=8, grad_cp=True, zero_stage=1, grad_clip=1.0,
            param_dtype=pd,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: fixed, epoch=0)
        histories[pd] = [h["loss"] for h in tr.history]
        trainers[pd] = tr

    bf = histories["bfloat16"]
    assert bf[-1] < bf[0], bf
    assert abs(bf[-1] - histories["float32"][-1]) < 0.15, histories

    tr = trainers["bfloat16"]
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert leaf.dtype == jnp.bfloat16
    assert tr.state.opt_state.master["rwkv"]["head"]["weight"].dtype == jnp.float32

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "ckpt")
        tr.save_checkpoint(path)
        before = np.asarray(tr.state.opt_state.master["rwkv"]["head"]["weight"])
        tr.state.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
            tr.state.opt_state,
        )
        tr.load_checkpoint(path)
        after = np.asarray(tr.state.opt_state.master["rwkv"]["head"]["weight"])
        np.testing.assert_array_equal(before, after)


@pytest.mark.slow
def test_stacked_layers_training_matches_list_layout():
    """stacked_layers=True (blocks 1..L-1 in one lax.scan body) must produce
    the same losses and — after unstacking — the same parameters as the
    canonical list-of-blocks layout, and checkpoints must stay canonical."""
    from visualrwkv_tpu.models.rwkv7 import unstack_blocks

    cfg = tiny_vlm_cfg()
    assert cfg.rwkv.n_layer >= 2
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh(n_data=1)

    out = {}
    for stacked in (False, True):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=4, epoch_count=1,
            micro_bsz=8, grad_cp=True, zero_stage=0, grad_clip=1.0,
            stacked_layers=stacked,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        assert tr.stacked == stacked
        tr.run_epoch(lambda s: fixed, epoch=0)
        p = tr.state.params
        if stacked:
            assert "blocks_stacked" in p["rwkv"]
            p = dict(p)
            p["rwkv"] = unstack_blocks(p["rwkv"])
        out[stacked] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, p),
            tr,
        )

    losses_list, params_list, _ = out[False]
    losses_stk, params_stk, tr_stk = out[True]
    np.testing.assert_allclose(losses_stk, losses_list, rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_list), jax.tree_util.tree_leaves(params_stk)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    # checkpoint round-trip: saved canonical, reloadable into the stacked run
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "ckpt")
        tr_stk.save_checkpoint(path)
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(path)
        assert "blocks_stacked" not in raw["params"]["rwkv"]  # canonical layout
        before = np.asarray(
            jax.tree_util.tree_leaves(tr_stk.state.params["rwkv"]["blocks_stacked"])[0]
        )
        tr_stk.state.params = jax.tree_util.tree_map(
            jnp.zeros_like, tr_stk.state.params
        )
        tr_stk.load_checkpoint(path)
        after = np.asarray(
            jax.tree_util.tree_leaves(tr_stk.state.params["rwkv"]["blocks_stacked"])[0]
        )
        np.testing.assert_array_equal(before, after)


def test_stacked_layers_ineligible_configs_fall_back():
    # bidirectional image forward needs per-layer addressing -> list layout
    # (partial freeze is stacked-eligible since optim.stacked_layer_freeze)
    cfg = tiny_vlm_cfg().replace(bidirectional_image=True)
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(
        lr_init=1e-3, lr_final=1e-3, epoch_steps=1, epoch_count=1,
        stacked_layers=True,
    )
    tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=make_mesh(n_data=1))
    assert not tr.stacked
    assert "blocks" in tr.state.params["rwkv"]


@pytest.mark.slow
def test_streamed_offload_matches_regular():
    """offload_optimizer (streamed per-block host-resident optimizer,
    train/offload.py) must track the regular in-jit optimizer: same losses
    and near-identical parameters on the same data."""
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh(n_data=1)

    out = {}
    for offload in (False, True):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=4, epoch_count=1,
            micro_bsz=8, grad_cp=False, zero_stage=0, grad_clip=1.0,
            offload_optimizer=offload,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        assert (tr._streamed is not None) == offload
        tr.run_epoch(lambda s: fixed, epoch=0)
        out[offload] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, tr.state.params),
            tr,
        )

    losses_reg, params_reg, _ = out[False]
    losses_off, params_off, tr_off = out[True]
    np.testing.assert_allclose(losses_off, losses_reg, rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_reg), jax.tree_util.tree_leaves(params_off)
    ):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)

    # checkpoint round-trip through the streamer's host state
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "ckpt")
        tr_off.save_checkpoint(path)
        before = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr_off._streamed.opt_state)]
        tr_off._streamed.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
            tr_off._streamed.opt_state,
        )
        tr_off.state.opt_state = tr_off._streamed.opt_state
        tr_off.load_checkpoint(path)
        after = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr_off._streamed.opt_state)]
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_stacked_partial_freeze_matches_list():
    """Partial first-N-layer freezing must work under the stacked layout
    (optim.stacked_layer_freeze zeroes frozen rows of the stacked axis):
    same losses/params as the list layout, frozen layers bit-identical to
    their initial values, unfrozen layers actually trained."""
    import dataclasses

    from visualrwkv_tpu.models.rwkv7 import unstack_blocks

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(cfg.rwkv, n_layer=4))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    init_blocks = jax.tree_util.tree_map(np.asarray, params["rwkv"]["blocks"])
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh(n_data=1)

    out = {}
    for stacked in (False, True):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=8, grad_cp=True, zero_stage=0, grad_clip=1.0,
            weight_decay=0.01, stacked_layers=stacked, freeze_rwkv_layers=2,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        assert tr.stacked == stacked
        tr.run_epoch(lambda s: fixed, epoch=0)
        p = tr.state.params
        if stacked:
            p = dict(p)
            p["rwkv"] = unstack_blocks(p["rwkv"])
        out[stacked] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, p),
        )

    losses_list, params_list = out[False]
    losses_stk, params_stk = out[True]
    np.testing.assert_allclose(losses_stk, losses_list, rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_list), jax.tree_util.tree_leaves(params_stk)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    for layout in (params_list, params_stk):
        blocks = layout["rwkv"]["blocks"]
        for i in (0, 1):  # frozen: unchanged
            for a, b in zip(
                jax.tree_util.tree_leaves(init_blocks[i]),
                jax.tree_util.tree_leaves(blocks[i]),
            ):
                np.testing.assert_array_equal(a, b)
        moved = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for i in (2, 3)
            for a, b in zip(
                jax.tree_util.tree_leaves(init_blocks[i]),
                jax.tree_util.tree_leaves(blocks[i]),
            )
        )
        assert moved > 0  # unfrozen layers trained


@pytest.mark.slow
def test_trainer_leftpad_insertion_mode():
    """insertion_mode='leftpad' must actually train through the Trainer (the
    flag previously selected nothing): finite decreasing-capable loss, params
    updated, plan recomputed per batch (static-arg recompile path)."""
    cfg = tiny_vlm_cfg().replace(insertion_mode="leftpad")
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    before = np.asarray(
        jax.tree_util.tree_leaves(params["rwkv"]["blocks"])[0]
    ).copy()

    # leftpad batches carry ONE un-expanded image token per sample
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    bsz, T = 4, 32
    ids = np.array(jax.random.randint(k1, (bsz, T), 1, 300))
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    images = {"dino": np.asarray(
        jax.random.randint(k2, (bsz, 16, 16, 3), 0, 255), np.uint8)}
    batch = {"input_ids": ids, "labels": labels, "images": images}

    tcfg = TrainConfig(
        lr_init=1e-2, lr_final=1e-2, epoch_steps=2, epoch_count=1,
        micro_bsz=bsz, grad_cp=False, zero_stage=0,
    )
    tr = Trainer(cfg, tcfg, params, mesh=make_mesh(n_data=1))
    loss = tr.run_epoch(lambda s: batch, epoch=0)
    assert np.isfinite(loss)
    after = np.asarray(jax.tree_util.tree_leaves(tr.state.params["rwkv"]["blocks"])[0])
    assert not np.array_equal(before, after)


@pytest.mark.slow
def test_trainer_seq_parallel_matches_single_device():
    """Context-parallel training (mesh seq axis > 1): same losses and
    near-identical params as the single-device run on a text-only batch."""
    import dataclasses

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(cfg.rwkv, ctx_len=64, chunk_len=16))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = np.array(jax.random.randint(jax.random.PRNGKey(1), (4, 64), 1, 300))
    labels = ids.copy()
    labels[:, :8] = IGNORE_INDEX
    batch = {"input_ids": ids, "labels": labels}

    out = {}
    for tag, mesh in (
        ("single", make_mesh(n_data=1)),
        ("dp2xsp4", make_mesh(n_data=2, n_seq=4)),
    ):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=4, grad_cp=True, zero_stage=0, grad_clip=1.0,
            stacked_layers=False,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: batch, epoch=0)
        out[tag] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, tr.state.params["rwkv"]),
        )

    l_s, p_s = out["single"]
    l_m, p_m = out["dp2xsp4"]
    np.testing.assert_allclose(l_m, l_s, rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_training_loss_seq_images_matches_dense():
    """SP + images: embeddings (vision encode + projector + scatter) computed
    OUTSIDE the shard_map, backbone run seq-sharded inside — the loss must
    match the single-device dense path."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.models.visualrwkv import (
        prepare_embeddings,
        training_loss,
        training_loss_seq,
    )

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(
        cfg.rwkv, ctx_len=32, chunk_len=8, vocab_size=4096))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1), bsz=2, T=32)
    ids, labels = jnp.asarray(batch["input_ids"]), np.asarray(batch["labels"])
    images = {k: jnp.asarray(v) for k, v in batch["images"].items()}

    dense = training_loss(params, cfg, ids, jnp.asarray(labels), images,
                          grad_cp=False, chunked_ce=False)

    lbl_next = np.concatenate(
        [labels[:, 1:], np.full((labels.shape[0], 1), IGNORE_INDEX, labels.dtype)],
        axis=1,
    )
    mesh = make_mesh(n_data=2, n_seq=4)
    f = jax.jit(jax.shard_map(
        lambda p, e, l: training_loss_seq(
            p, cfg, None, l, grad_cp=False, embeds=e
        ),
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None), P("data", "seq")),
        out_specs=P(),
    ))
    emb = prepare_embeddings(params, cfg, ids, images)
    loss_sp = f(params, emb, jnp.asarray(lbl_next))
    np.testing.assert_allclose(float(loss_sp), float(dense), rtol=1e-5)


@pytest.mark.slow
def test_trainer_seq_parallel_images_matches_single_device():
    """Context-parallel training on an IMAGE batch (scatter insertion): the
    dp2xsp4 Trainer matches the single-device run — losses and params."""
    import dataclasses

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(cfg.rwkv, ctx_len=64, chunk_len=16))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1), bsz=4, T=64)

    out = {}
    for tag, mesh in (
        ("single", make_mesh(n_data=1)),
        ("dp2xsp4", make_mesh(n_data=2, n_seq=4)),
    ):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=4, grad_cp=True, zero_stage=0, grad_clip=1.0,
            stacked_layers=False,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: batch, epoch=0)
        out[tag] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, tr.state.params["rwkv"]),
        )

    l_s, p_s = out["single"]
    l_m, p_m = out["dp2xsp4"]
    np.testing.assert_allclose(l_m, l_s, rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_training_loss_seq_sp_tp_matches_dense():
    """SP x TP 3-D mesh (data=2, seq=2, model=2): the partial-manual
    shard_map (manual over data/seq, `model` left to GSPMD) must match the
    single-device loss AND gradients."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from visualrwkv_tpu.models.visualrwkv import training_loss, training_loss_seq

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(
        cfg.rwkv, ctx_len=32, chunk_len=8, vocab_size=4096))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = np.array(jax.random.randint(jax.random.PRNGKey(1), (4, 32), 1, 300))
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    lbl_next = np.concatenate(
        [labels[:, 1:], np.full((4, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )

    mesh = make_mesh(n_data=2, n_model=2, n_seq=2)
    f = jax.jit(jax.shard_map(
        lambda p, i, l: training_loss_seq(p, cfg, i, l, grad_cp=False),
        mesh=mesh,
        in_specs=(P(), P("data", "seq"), P("data", "seq")),
        out_specs=P(),
        axis_names=frozenset({"data", "seq"}),
    ))
    loss_sp = f(params, jnp.asarray(ids), jnp.asarray(lbl_next))
    ref = training_loss(params, cfg, jnp.asarray(ids), jnp.asarray(labels),
                        None, grad_cp=False)
    np.testing.assert_allclose(float(loss_sp), float(ref), rtol=1e-5)

    g_sp = jax.jit(jax.grad(
        lambda p: f(p, jnp.asarray(ids), jnp.asarray(lbl_next))))(params)
    g_ref = jax.jit(jax.grad(
        lambda p: training_loss(p, cfg, jnp.asarray(ids), jnp.asarray(labels),
                                None, grad_cp=False)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_sp_tp_matches_single_device():
    """Full Trainer on the 3-D (data=2, seq=2, model=2) mesh — TP param
    placement + partial-manual SP loss + ZeRO-1 — matches single-device."""
    import dataclasses

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(cfg.rwkv, ctx_len=64, chunk_len=16))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = np.array(jax.random.randint(jax.random.PRNGKey(1), (4, 64), 1, 300))
    labels = ids.copy()
    labels[:, :8] = IGNORE_INDEX
    batch = {"input_ids": ids, "labels": labels}

    out = {}
    for tag, mesh in (
        ("single", make_mesh(n_data=1)),
        ("dp2xsp2xtp2", make_mesh(n_data=2, n_model=2, n_seq=2)),
    ):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=4, grad_cp=True, zero_stage=0, grad_clip=1.0,
            stacked_layers=False,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: batch, epoch=0)
        out[tag] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, tr.state.params["rwkv"]),
        )

    l_s, p_s = out["single"]
    l_m, p_m = out["dp2xsp2xtp2"]
    np.testing.assert_allclose(l_m, l_s, rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=3e-4)


@pytest.mark.slow
def test_trainer_seq_parallel_x060_matches_single_device():
    """Context-parallel training with the x060 backbone (rwkv6_forward_seq):
    dp2xsp4 matches single-device on a text batch."""
    import dataclasses

    cfg = tiny_vlm_cfg()
    cfg = cfg.replace(rwkv=dataclasses.replace(
        cfg.rwkv, version="x060", ctx_len=64, chunk_len=16))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    ids = np.array(jax.random.randint(jax.random.PRNGKey(1), (4, 64), 1, 300))
    labels = ids.copy()
    labels[:, :8] = IGNORE_INDEX
    batch = {"input_ids": ids, "labels": labels}

    out = {}
    for tag, mesh in (
        ("single", make_mesh(n_data=1)),
        ("dp2xsp4", make_mesh(n_data=2, n_seq=4)),
    ):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=4, grad_cp=True, zero_stage=0, grad_clip=1.0,
            stacked_layers=False,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: batch, epoch=0)
        out[tag] = (
            [h["loss"] for h in tr.history],
            jax.tree_util.tree_map(np.asarray, tr.state.params["rwkv"]),
        )

    l_s, p_s = out["single"]
    l_m, p_m = out["dp2xsp4"]
    np.testing.assert_allclose(l_m, l_s, rtol=2e-4, atol=2e-4)
    # slightly wider atol than the x070 twin: the x060 decay LoRA
    # (exp-of-exp) amplifies ring-vs-sequential fp reassociation over the
    # 3 steps at lr 1e-2 (observed: 1/4096 elements at ~1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=3e-4)


def test_nonfinite_gradients_are_skipped():
    """A poisoned batch (inf/nan gradients) must produce a ZERO update, not
    feed nan into the Adam moments (clip_by_global_norm_f32 + the in-step
    clip both zero the scale on a non-finite fp32 norm)."""
    import optax

    from visualrwkv_tpu.train.optim import clip_by_global_norm_f32

    clip = clip_by_global_norm_f32(1.0)
    good = {"w": jnp.ones((4,)), "b": jnp.ones((2,))}
    state = clip.init(good)

    bad = {"w": jnp.full((4,), jnp.inf), "b": jnp.ones((2,))}
    upd, _ = clip.update(bad, state)
    assert all(np.array_equal(np.asarray(x), 0 * np.asarray(x))
               for x in jax.tree_util.tree_leaves(upd))

    nan_g = {"w": jnp.full((4,), jnp.nan), "b": jnp.ones((2,))}
    upd, _ = clip.update(nan_g, state)
    for x in jax.tree_util.tree_leaves(upd):
        assert np.isfinite(np.asarray(x)).all()
        assert (np.asarray(x) == 0).all()

    ok, _ = clip.update(good, state)
    assert float(jnp.abs(jax.tree_util.tree_leaves(ok)[0]).max()) > 0


def test_sr_round_bf16_unbiased():
    """Stochastic rounding is unbiased: the mean over many elements of a
    value exactly between two bf16 neighbours lands on the value, and
    non-finite inputs pass through."""
    from visualrwkv_tpu.train.optim import sr_round_bf16

    x = jnp.full((1 << 16,), 1.0 + 2.0**-10, jnp.float32)  # sub-ulp offset
    out = sr_round_bf16(jax.random.PRNGKey(0), x).astype(jnp.float32)
    vals = np.unique(np.asarray(out))
    # bf16 ulp at 1.0 is 2^-7 (7 explicit mantissa bits)
    assert set(vals).issubset({1.0, float(jnp.bfloat16(1.0 + 2.0**-7))}), vals
    # E[out] = 1 + 2^-10; up-round probability 1/8, sd of the mean ~
    # 2^-7 * sqrt(7/64) / 256 ~ 1e-5 -> ~10 sigma budget
    assert abs(float(out.mean()) - (1.0 + 2.0**-10)) < 1e-4
    bad = jnp.array([jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
    outb = np.asarray(sr_round_bf16(jax.random.PRNGKey(1), bad), np.float32)
    assert outb[0] == np.inf and outb[1] == -np.inf and np.isnan(outb[2])


def test_bf16_sr_accumulates_tiny_updates():
    """optim_precision='bf16_sr': no fp32 masters, bf16 Adam moments, and
    sub-ulp updates still advance in expectation via stochastic rounding."""
    from visualrwkv_tpu.train.optim import (
        MasterFP32State,
        apply_updates_sr,
        make_optimizer,
    )

    params = {"w": jnp.full((8, 128), 1.0, jnp.bfloat16)}
    grads = {"w": jnp.full((8, 128), 1.0, jnp.bfloat16)}
    tcfg = TrainConfig(lr_init=1e-4, lr_final=1e-4, warmup_steps=0,
                       grad_clip=0.0, optim_precision="bf16_sr")
    opt = make_optimizer(tcfg, params, total_steps=1000, n_layer=0)
    state = opt.init(params)
    assert not isinstance(state, MasterFP32State)
    moments = [
        x for x in jax.tree_util.tree_leaves(state) if hasattr(x, "ndim") and x.ndim == 2
    ]
    assert moments and all(x.dtype == jnp.bfloat16 for x in moments)

    p = params
    for i in range(100):  # per-step |update| ~ lr = 1e-4 << ulp@1.0 = 2^-8
        upd, state = opt.update(grads, state, p)
        assert upd["w"].dtype == jnp.float32
        p = apply_updates_sr(p, upd, jax.random.PRNGKey(i))
    # deterministic rounding would leave the param at exactly 1.0
    drift = 1.0 - float(jnp.mean(p["w"].astype(jnp.float32)))
    assert 5e-3 < drift < 2e-2, drift  # E[drift] ~ 100 * 1e-4 = 1e-2


@pytest.mark.slow
def test_bf16_sr_training_tracks_fp32():
    """Full trainer with the master-less bf16_sr mode: loss decreases and
    lands near the fp32 run (SR noise makes it approximate, not exact)."""
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh()

    final = {}
    for pd, mode in (("float32", "master_fp32"), ("bfloat16", "bf16_sr")):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=8, epoch_count=1,
            micro_bsz=8, grad_cp=True, zero_stage=1, grad_clip=1.0,
            param_dtype=pd, optim_precision=mode,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: fixed, epoch=0)
        final[mode] = [h["loss"] for h in tr.history]
        if mode == "bf16_sr":
            from visualrwkv_tpu.train.optim import MasterFP32State

            assert not isinstance(tr.state.opt_state, MasterFP32State)
            leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
            assert leaf.dtype == jnp.bfloat16

    sr = final["bf16_sr"]
    assert sr[-1] < sr[0], sr
    assert abs(sr[-1] - final["master_fp32"][-1]) < 0.25, final


def _run_split_vs_fused(optim_precision, param_dtype, rtol, atol):
    """Shared body: split_step=True (grad program + optimizer program, two
    dispatches) must track the fused one-jit step — same math, different
    compilation boundary (the 1B5 bf16_sr near-HBM-edge escape hatch)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_vlm_cfg(), vision=VisionConfig(towers=()))
    # 4k vocab: the 66k head/emb/optimizer leaves dominate compile+run time
    # on the 1-core CI box and prove nothing extra about the split boundary
    cfg = cfg.replace(rwkv=dataclasses.replace(cfg.rwkv, vocab_size=4096))
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 300, (4, 32)).astype(np.int32)
    batch = {"input_ids": ids, "labels": ids.copy(), "images": None}
    mesh = make_mesh(n_data=1)

    final = {}
    for split in (False, True):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=2, epoch_count=1,
            micro_bsz=2, accumulate_grad_batches=2, grad_cp=True,
            zero_stage=0, grad_clip=1.0, param_dtype=param_dtype,
            optim_precision=optim_precision, split_step=split,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params),
                     mesh=mesh)
        assert tr.split_step_enabled == split
        tr.run_epoch(lambda s: batch, epoch=0)
        final[split] = tr.state.params

    for a, b in zip(jax.tree_util.tree_leaves(final[False]),
                    jax.tree_util.tree_leaves(final[True])):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol, atol=atol,
        )


def test_split_step_matches_fused():
    # fp32/adamw: the split-boundary logic itself (the bf16_sr production
    # combo is the slow-marked twin below — CPU bf16 emulation costs ~60 s)
    _run_split_vs_fused("master_fp32", "float32", 1e-5, 1e-7)


@pytest.mark.slow
def test_split_step_bf16_sr_matches_fused():
    # the actual 1B5 escape-hatch combo: bf16 params + bf16_sr optimizer
    # (SR key deterministic in `step`, so split and fused stay comparable)
    _run_split_vs_fused("bf16_sr", "bfloat16", 2e-2, 2e-4)


@pytest.mark.slow
def test_zero3_param_sharded_step_matches_zero1():
    """zero_stage=3 (params FSDP-sharded over `data`) must produce the same
    losses as the replicated-param zero_stage=1 run — GSPMD all-gathers are
    numerics-neutral. DeepSpeed stage-3 analog (v7.00/train.py:153-154)."""
    cfg = tiny_vlm_cfg()
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)
    fixed = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh()

    hist = {}
    for stage in (1, 3):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=4, epoch_count=1,
            micro_bsz=8, grad_cp=True, zero_stage=stage, grad_clip=1.0,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params), mesh=mesh)
        tr.run_epoch(lambda s: fixed, epoch=0)
        hist[stage] = [h["loss"] for h in tr.history]
        if stage == 3:
            big = [
                x for x in jax.tree_util.tree_leaves(tr.state.params)
                if hasattr(x, "sharding") and x.size >= 2**16
            ]
            assert big and any(
                "data" in (x.sharding.spec or ()) for x in big
            ), "no parameter leaf actually sharded under zero_stage=3"
    np.testing.assert_allclose(hist[1], hist[3], rtol=2e-5)


@pytest.mark.slow
def test_offload_with_leftpad_insertion():
    """offload_optimizer + insertion_mode='leftpad' (previously a guarded
    NotImplementedError): the streamed grad step takes the same batch-static
    plan kwarg as the in-jit step and must track the in-jit optimizer's
    losses on the same leftpad batches."""
    cfg = tiny_vlm_cfg().replace(insertion_mode="leftpad")
    params = init_visualrwkv_params(jax.random.PRNGKey(0), cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    bsz, T = 4, 32
    ids = np.array(jax.random.randint(k1, (bsz, T), 1, 300))
    ids[:, 2] = IMAGE_TOKEN_INDEX
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    images = {"dino": np.asarray(
        jax.random.randint(k2, (bsz, 16, 16, 3), 0, 255), np.uint8)}
    batch = {"input_ids": ids, "labels": labels, "images": images}

    hist = {}
    for offload in (False, True):
        tcfg = TrainConfig(
            lr_init=1e-2, lr_final=1e-2, epoch_steps=3, epoch_count=1,
            micro_bsz=bsz, grad_cp=False, zero_stage=0, grad_clip=1.0,
            offload_optimizer=offload,
        )
        tr = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params),
                     mesh=make_mesh(n_data=1))
        assert (tr._streamed is not None) == offload
        tr.run_epoch(lambda s: batch, epoch=0)
        hist[offload] = [h["loss"] for h in tr.history]
    np.testing.assert_allclose(hist[True], hist[False], rtol=1e-4, atol=1e-5)
