#!/bin/bash
# POPE eval + per-category F1 (reference scripts/eval/eval_pope.sh).
MODEL_PATH=${1:?usage: eval_pope.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/pope/llava_pope_test.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/pope/val2014
OUT_DIR=${OUT_DIR:-out/eval/pope}
fanout_eval
python -m visualrwkv_tpu.evals.score pope \
  --annotation-dir "$EVAL_DIR/eval/pope/coco" \
  --question-file "$QUESTION_FILE" \
  --result-file "$OUT_DIR/merge.jsonl"
