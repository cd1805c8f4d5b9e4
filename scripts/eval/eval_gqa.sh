#!/bin/bash
# GQA eval + official-protocol scoring (reference scripts/eval/eval_gqa.sh).
MODEL_PATH=${1:?usage: eval_gqa.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/gqa/llava_gqa_testdev_balanced.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/gqa/images
OUT_DIR=${OUT_DIR:-out/eval/gqa}
fanout_eval
GQA_Q=$EVAL_DIR/eval/gqa/testdev_balanced_questions.json
python -m visualrwkv_tpu.evals.score gqa \
  --result-file "$OUT_DIR/merge.jsonl" \
  ${GQA_Q:+--gqa-questions-json "$GQA_Q"}
