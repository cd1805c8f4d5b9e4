#!/bin/bash
# Stage 1: projector pretraining (reference scripts/train/rwkv0b1_pretrain.sh):
# LM + towers frozen, gated-MLP projector trains on LLaVA-Pretrain 558k.
set -e
MODEL_PATH=${MODEL_PATH:-"checkpoints/rwkv7-world-0b1.pth"}
DATA_FILE=${DATA_FILE:-"data/llava_pretrain_558k.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"data/pretrain_images"}
python -m visualrwkv_tpu.train.cli \
    --model_path "$MODEL_PATH" \
    --data_file "$DATA_FILE" --image_folder "$IMAGE_FOLDER" \
    --proj_dir out/stage1 \
    --n_layer 12 --n_embd 768 --ctx_len 2048 \
    --proj_type mlp --num_token_per_image 1024 \
    --freeze_rwkv 12 \
    --micro_bsz 4 --epoch_steps 1000 --epoch_count 2 \
    --lr_init 1e-3 --lr_final 5e-5 --warmup_steps 100 \
    --grad_cp 1 --zero_stage 1 "$@"
