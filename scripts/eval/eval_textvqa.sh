#!/bin/bash
# TextVQA eval + EvalAI/m4c scoring (reference scripts/eval/eval_textvqa.sh).
MODEL_PATH=${1:?usage: eval_textvqa.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR (reference data layout: $EVAL_DIR/eval/textvqa/...)}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/textvqa/llava_textvqa_val_v051_ocr.jsonl
IMAGE_FOLDER=$EVAL_DIR/images/textvqa/train_images
OUT_DIR=${OUT_DIR:-out/eval/textvqa}
fanout_eval
python -m visualrwkv_tpu.evals.score textvqa \
  --annotation-file "$EVAL_DIR/eval/textvqa/TextVQA_0.5.1_val.json" \
  --result-file "$OUT_DIR/merge.jsonl"
