#!/bin/bash
# VizWiz eval + submission conversion (reference scripts/eval/eval_vizwiz.sh).
MODEL_PATH=${1:?usage: eval_vizwiz.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/vizwiz/llava_test.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/vizwiz/test
OUT_DIR=${OUT_DIR:-out/eval/vizwiz}
fanout_eval
python -m visualrwkv_tpu.evals.score vizwiz-convert \
  --result-file "$OUT_DIR/merge.jsonl" \
  --annotation-file "$QUESTION_FILE" \
  --output-file "$OUT_DIR/submission.json"
