#!/bin/bash
# Stage-1 projector pretrain, 0B1 (reference scripts/train/rwkv0b1_pretrain.sh
# hyperparameters: LLaVA-Pretrain 558k, bsz 8x32, ctx 2048, lr 1e-3 -> 5e-5,
# 2 epochs x 1000 steps, RWKV frozen).
set -e
MODEL_PATH=${1:?RWKV-x070-World 0.1B .pth}
DATA_FILE=${2:?blip_laion_cc_sbu_558k.json}
IMAGE_FOLDER=${3:?images dir}
python -m visualrwkv_tpu.train.cli \
    --model_path "$MODEL_PATH" \
    --data_file "$DATA_FILE" --image_folder "$IMAGE_FOLDER" \
    --proj_dir out/rwkv0b1_pretrain \
    --n_layer 12 --n_embd 768 --ctx_len 2048 --vocab_size 65536 \
    --micro_bsz 32 --epoch_steps 1000 --epoch_count 2 --epoch_save 0 \
    --lr_init 1e-3 --lr_final 5e-5 --warmup_steps 0 \
    --beta1 0.9 --beta2 0.99 --adam_eps 1e-8 \
    --grad_cp 1 --zero_stage 1 --stacked_layers 0 \
    --freeze_rwkv 12 --freeze_proj 0 --proj_type mlp \
    --num_token_per_image 1024 --dtype bfloat16
