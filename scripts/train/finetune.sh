#!/bin/bash
# Stage 2: full finetune on mix665k (reference scripts/train/rwkv0b1_mix665k.sh);
# stage 1's checkpoint feeds --model_path via export (or load orbax directly).
set -e
DATA_FILE=${DATA_FILE:-"data/mix665k.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"data/images"}
python -m visualrwkv_tpu.train.cli \
    --model_path "${MODEL_PATH:-out/stage1/rwkv-1}" \
    --data_file "$DATA_FILE" --image_folder "$IMAGE_FOLDER" \
    --proj_dir out/stage2 \
    --n_layer 12 --n_embd 768 --ctx_len 2048 \
    --proj_type mlp --num_token_per_image 1024 \
    --micro_bsz 2 --epoch_steps 1000 --epoch_count 15 \
    --lr_init 6e-5 --lr_final 1.5e-5 \
    --grad_cp 1 --zero_stage 1 "$@"
