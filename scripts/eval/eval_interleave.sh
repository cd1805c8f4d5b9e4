#!/bin/bash
# Multi-image interleave benchmark (reference scripts/eval/eval_interleave.sh).
MODEL_PATH=${1:?usage: eval_interleave.sh MODEL_PATH QUESTION_FILE IMAGE_FOLDER}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$2
IMAGE_FOLDER=$3
OUT_DIR=${OUT_DIR:-out/eval/interleave}
EXTRA_FLAGS="--image_strategy multi"
fanout_eval
python -m visualrwkv_tpu.evals.score interleave --result-file "$OUT_DIR/merge.jsonl"
