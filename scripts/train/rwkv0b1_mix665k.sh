#!/bin/bash
# Stage-2 full finetune, 0B1 (reference scripts/train/rwkv0b1_mix665k.sh:
# mix665k, bsz 8x16, lr 6e-5 -> 1.5e-5, 15 epochs, num_token_per_image 1024).
set -e
MODEL_PATH=${1:?stage-1 output rwkv-*.pth / orbax dir}
DATA_FILE=${2:?llava_v1_5_mix665k.json}
IMAGE_FOLDER=${3:?images dir}
python -m visualrwkv_tpu.train.cli \
    --model_path "$MODEL_PATH" \
    --data_file "$DATA_FILE" --image_folder "$IMAGE_FOLDER" \
    --proj_dir out/rwkv0b1_mix665k \
    --n_layer 12 --n_embd 768 --ctx_len 2048 --vocab_size 65536 \
    --micro_bsz 16 --epoch_steps 1000 --epoch_count 15 --epoch_save 3 \
    --lr_init 6e-5 --lr_final 1.5e-5 --warmup_steps 0 \
    --grad_cp 1 --zero_stage 1 --stacked_layers 1 \
    --freeze_rwkv 0 --proj_type mlp \
    --num_token_per_image 1024 --dtype bfloat16
