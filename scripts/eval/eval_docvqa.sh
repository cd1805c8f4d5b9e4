#!/bin/bash
# DocVQA eval + ANLS scoring (reference scripts/eval/eval_docvqa.sh).
MODEL_PATH=${1:?usage: eval_docvqa.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/docvqa/val.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/docvqa/images
OUT_DIR=${OUT_DIR:-out/eval/docvqa}
fanout_eval
python -m visualrwkv_tpu.evals.score anls \
  --annotation-file "$EVAL_DIR/eval/docvqa/val_v1.0.json" \
  --result-file "$OUT_DIR/merge.jsonl"
