"""Training CLI.

Mirrors the reference train.py flag surface (VisualRWKV-v7/v7.00/train.py:16-66)
over the pjit trainer: two-stage pretrain/finetune are the same invocation with
different freeze flags and --model_path chaining (stage 1 output feeds stage 2,
reference scripts/train/*.sh).

``--dummy`` runs the dummy-data smoke (the reference's scripts/train/dummy_run.sh
integration test): synthesizes a tiny dataset + random images on the fly.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("visualrwkv_tpu.train")
    p.add_argument("--data_file", default="", type=str)
    p.add_argument("--image_folder", default="", type=str)
    p.add_argument("--proj_dir", default="out", type=str)
    p.add_argument("--model_path", default="", type=str, help=".pth or orbax dir to load")
    p.add_argument("--vocab_size", default=65536, type=int)
    p.add_argument("--n_layer", default=12, type=int)
    p.add_argument("--n_embd", default=768, type=int)
    p.add_argument("--ctx_len", default=2048, type=int)
    p.add_argument("--head_size_a", default=64, type=int)
    p.add_argument("--proj_type", default="mlp", choices=["linear", "mlp"])
    p.add_argument("--num_token_per_image", default=1024, type=int)
    p.add_argument("--vision_towers", default="dino,siglip,sam", type=str)
    p.add_argument("--image_position", default="first", choices=["first", "middle", "last"])
    p.add_argument("--micro_bsz", default=2, type=int)
    p.add_argument("--accumulate_grad_batches", default=1, type=int)
    p.add_argument("--epoch_steps", default=1000, type=int)
    p.add_argument("--epoch_count", default=2, type=int)
    p.add_argument("--epoch_begin", default=0, type=int)
    p.add_argument("--epoch_save", default=1, type=int)
    p.add_argument("--lr_init", default=6e-4, type=float)
    p.add_argument("--lr_final", default=1e-5, type=float)
    p.add_argument("--warmup_steps", default=-1, type=int)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--beta2", default=0.99, type=float)
    p.add_argument("--adam_eps", default=1e-8, type=float)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--weight_decay_final", default=-1.0, type=float)
    p.add_argument("--grad_cp", default=1, type=int)
    p.add_argument("--remat", default="",
                   choices=["", "none", "full", "dots", "wkv"],
                   help="activation checkpointing policy (overrides --grad_cp): "
                   "dots saves MXU outputs and recomputes only elementwise; "
                   "wkv saves only the WKV kernel output/state stream so the "
                   "backward never re-runs the kernel")
    p.add_argument("--grad_clip", default=1.0, type=float)
    p.add_argument("--freeze_rwkv", default=0, type=int, help="freeze first N layers")
    p.add_argument("--freeze_emb", default=0, type=int)
    p.add_argument("--freeze_proj", default=0, type=int)
    p.add_argument("--zero_stage", default=1, type=int)
    p.add_argument("--n_data", default=None, type=int, help="data-parallel mesh size")
    p.add_argument("--n_seq", default=1, type=int,
                   help="context-parallel mesh size (tokens sharded on T; "
                        "x070/x060, scatter-insertion image batches "
                        "supported, see ops/wkv_sp.py)")
    # multi-host (reference train.py:75 --num_nodes under DeepSpeed DP):
    # every host runs this same CLI; jax.distributed joins them and each
    # host feeds its process-local slice of the global batch
    p.add_argument("--num_nodes", default=1, type=int,
                   help="number of host processes (multi-controller JAX)")
    p.add_argument("--coordinator_address", default="", type=str,
                   help="host:port of process 0 (or VRWKV_COORDINATOR_ADDRESS)")
    p.add_argument("--node_rank", default=-1, type=int,
                   help="this process's id (or VRWKV_PROCESS_ID)")
    p.add_argument("--dummy", action="store_true", help="dummy-data smoke run")
    p.add_argument("--dtype", default="bfloat16", type=str)
    p.add_argument(
        "--wkv_impl", default="auto", choices=["auto", "pallas", "chunked", "packed"],
        help="WKV kernel implementation (auto = fused Pallas on TPU; packed = "
        "packed-lane experimental pair; chunked = jnp fallback)",
    )
    p.add_argument(
        "--chunk_len", default=16, type=int,
        help="WKV chunk length (the fused path is stability-capped at 16; "
        "8 hardens the adversarial envelope at ~16%% step cost — see "
        "tests/test_wkv7_stability.py)",
    )
    p.add_argument(
        "--param_dtype", default="float32", choices=["float32", "bfloat16", "float16"],
        help="parameter storage dtype; below-fp32 keeps fp32 masters in opt state",
    )
    p.add_argument(
        "--optim_precision", default="master_fp32",
        choices=["master_fp32", "bf16_sr"],
        help="optimizer numerics for low-precision params: master_fp32 keeps "
        "fp32 masters + fp32 Adam moments (12 B/param); bf16_sr is "
        "master-less — bf16 moments + stochastic-rounding param updates "
        "(4 B/param; fits 1B5 full-Adam on one 16 GB chip)",
    )
    p.add_argument(
        "--stacked_layers", default=0, type=int,
        help="stack blocks 1..L-1 so the layer loop is one lax.scan body "
        "(O(1)-in-depth compile time; x070, no partial freeze/TP)",
    )
    p.add_argument(
        "--split_step", default=-1, type=int,
        help="-1 auto / 0 fused / 1 split: compile the train step as two "
        "programs (grad, then optimizer) instead of one jit. Near the "
        "single-chip HBM edge the fused program collapses ~25x (XLA "
        "spills/serializes under pressure); auto splits when params+grads+"
        "optimizer state exceed 60%% of one chip's HBM",
    )
    return p


def make_configs(args):
    from visualrwkv_tpu.config import RWKVConfig, TrainConfig, VisionConfig, VLMConfig

    towers = tuple(t for t in args.vision_towers.split(",") if t)
    vlm_cfg = VLMConfig(
        rwkv=RWKVConfig(
            n_layer=args.n_layer, n_embd=args.n_embd, vocab_size=args.vocab_size,
            head_size=args.head_size_a, ctx_len=args.ctx_len, compute_dtype=args.dtype,
            chunk_len=args.chunk_len,
        ),
        vision=VisionConfig(towers=towers),
        proj_type=args.proj_type,
        num_token_per_image=args.num_token_per_image,
        image_position=args.image_position,
    )
    tcfg = TrainConfig(
        lr_init=args.lr_init, lr_final=args.lr_final, warmup_steps=args.warmup_steps,
        beta1=args.beta1, beta2=args.beta2, adam_eps=args.adam_eps,
        weight_decay=args.weight_decay, weight_decay_final=args.weight_decay_final,
        grad_clip=args.grad_clip, micro_bsz=args.micro_bsz,
        accumulate_grad_batches=args.accumulate_grad_batches,
        epoch_steps=args.epoch_steps, epoch_count=args.epoch_count,
        epoch_begin=args.epoch_begin, epoch_save=args.epoch_save,
        grad_cp={"": bool(args.grad_cp), "none": False, "full": True,
                 "dots": "dots", "wkv": "wkv"}[args.remat],
        freeze_rwkv_layers=args.freeze_rwkv,
        freeze_emb=bool(args.freeze_emb), freeze_proj=bool(args.freeze_proj),
        zero_stage=args.zero_stage, param_dtype=args.param_dtype,
        optim_precision=args.optim_precision,
        stacked_layers=bool(args.stacked_layers),
        split_step=None if args.split_step < 0 else bool(args.split_step),
    )
    return vlm_cfg, tcfg


def make_dummy(args, tmp_dir: Path):
    """Synthesize a tiny LLaVA-format dataset + images (dummy_run.sh analog)."""
    from PIL import Image

    img_dir = tmp_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    records = []
    for i in range(16):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append(
            {
                "id": f"dummy_{i}",
                "image": name,
                "conversations": [
                    {"from": "human", "value": f"<image>\nWhat number is this? {i}"},
                    {"from": "gpt", "value": f"This is number {i}."},
                ],
            }
        )
    data_file = tmp_dir / "dummy.json"
    data_file.write_text(json.dumps(records))
    args.data_file = str(data_file)
    args.image_folder = str(img_dir)
    return args


def apply_dummy_overrides(args):
    args.n_layer = 2
    args.n_embd = 128
    args.ctx_len = 128
    args.num_token_per_image = 16
    args.epoch_steps = 4
    args.epoch_count = 1
    args.micro_bsz = 2
    args.vision_towers = "dino,siglip,sam"
    return args


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_argparser().parse_args(argv)
    os.makedirs(args.proj_dir, exist_ok=True)
    if args.dummy:
        args = apply_dummy_overrides(args)
        args = make_dummy(args, Path(args.proj_dir) / "dummy_data")

    import jax

    from visualrwkv_tpu.parallel import distributed

    distributed.initialize(  # no-op unless flags/env request multi-host
        coordinator_address=args.coordinator_address or None,
        num_processes=args.num_nodes if args.num_nodes > 1 else None,
        process_id=args.node_rank if args.node_rank >= 0 else None,
    )

    from visualrwkv_tpu.data.dataset import (
        DatasetConfig,
        VisualRWKVDataset,
        batches_for_epoch,
    )
    from visualrwkv_tpu.data.tokenizer import get_tokenizer
    from visualrwkv_tpu.models.visualrwkv import init_visualrwkv_params
    from visualrwkv_tpu.parallel.mesh import make_mesh
    from visualrwkv_tpu.train.trainer import Trainer

    if args.wkv_impl != "auto":
        from visualrwkv_tpu.ops.wkv7 import set_wkv_impl

        set_wkv_impl(args.wkv_impl)

    vlm_cfg, tcfg = make_configs(args)
    if args.dummy:
        # tiny towers so the smoke run is fast on any backend
        from visualrwkv_tpu.vision.sam import SAMConfig
        from visualrwkv_tpu.vision.vit import ViTConfig

        overrides = {
            "dino": ViTConfig(img_size=64, patch_size=8, width=64, depth=2, heads=4,
                              mlp_dim=128, use_cls=True, num_reg=4, layerscale=True),
            "siglip": ViTConfig(img_size=64, patch_size=8, width=64, depth=2, heads=4,
                                mlp_dim=128, act="gelu_tanh", use_cls=False),
            "sam": SAMConfig(img_size=128, patch_size=8, width=64, depth=2, heads=4,
                             mlp_dim=128, out_chans=32, window_size=4,
                             global_attn_indexes=(1,)),
        }
        vlm_cfg = vlm_cfg.replace(
            vision=vlm_cfg.vision.__class__(
                towers=("dino", "siglip", "sam"), image_size=64, sam_image_size=128,
                dino_dim=64, siglip_dim=64, sam_dim=128,
                tower_config_overrides=overrides,
            )
        )

    tok = get_tokenizer()
    tok_vocab = getattr(tok, "vocab_size", 65536)
    if args.vocab_size < tok_vocab:
        logging.warning(
            "vocab_size %d is smaller than the tokenizer's %d: token ids "
            "beyond the head are CLAMPED in the loss (finite but wrong) — "
            "use the full vocab for real training",
            args.vocab_size, tok_vocab,
        )
    params = init_visualrwkv_params(jax.random.PRNGKey(0), vlm_cfg)
    if args.model_path:
        from visualrwkv_tpu.convert.pth_import import import_rwkv_state_dict, load_pth

        sd = load_pth(args.model_path)
        params["rwkv"] = jax.tree_util.tree_map(
            lambda a, b: b, params["rwkv"], import_rwkv_state_dict(sd)
        )
        logging.info("loaded RWKV weights from %s", args.model_path)

    mesh = make_mesh(n_data=args.n_data, n_seq=args.n_seq)
    trainer = Trainer(vlm_cfg, tcfg, params, mesh=mesh, proj_dir=args.proj_dir, log_every=1)
    del params  # the fp32 init tree must not outlive the trainer's cast copy
    # (at 1B5 a lingering caller reference holds ~6 GB of HBM for the run)

    # reference real_bsz = nodes * devices * micro_bsz (train.py:98); here the
    # global per-step batch is micro_bsz per data-mesh slot, times grad accum.
    # Under multi-host each process materializes only its 1/process_count
    # slice; shard_batch assembles the slices into one global array.
    global_bsz = args.micro_bsz * mesh.shape["data"] * args.accumulate_grad_batches
    local_bsz = distributed.local_batch_size(global_bsz)
    ds_cfg = DatasetConfig(
        data_file=args.data_file, image_folder=args.image_folder,
        ctx_len=args.ctx_len, num_token_per_image=args.num_token_per_image,
        epoch_steps=args.epoch_steps, micro_bsz=local_bsz,
        image_position=args.image_position,
        towers=tuple(vlm_cfg.vision.towers),
        tower_sizes={"dino": vlm_cfg.vision.image_size,
                     "siglip": vlm_cfg.vision.image_size,
                     "sam": vlm_cfg.vision.sam_image_size},
    )
    dataset = VisualRWKVDataset(
        ds_cfg, tok,
        world_size=jax.process_count(), rank=jax.process_index(),
    )

    for epoch in range(args.epoch_begin, args.epoch_begin + args.epoch_count):
        loss = trainer.run_epoch(batches_for_epoch(dataset, epoch), epoch)
        logging.info("epoch %d done, loss %.4f", epoch, loss)
        periodic = args.epoch_save > 0 and (epoch + 1) % args.epoch_save == 0
        if periodic or epoch == args.epoch_begin + args.epoch_count - 1:
            path = str(Path(args.proj_dir).absolute() / f"rwkv-{epoch}")
            trainer.save_checkpoint(path)
            logging.info("saved checkpoint %s", path)
    return trainer


if __name__ == "__main__":
    main()
