#!/bin/bash
# MM-Vet eval + GPT-grader json conversion (reference scripts/eval/eval_mmvet.sh).
MODEL_PATH=${1:?usage: eval_mmvet.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/mm-vet/llava-mm-vet.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/mm-vet/images
OUT_DIR=${OUT_DIR:-out/eval/mmvet}
fanout_eval
python -m visualrwkv_tpu.evals.score mmvet-convert \
  --result-file "$OUT_DIR/merge.jsonl" \
  --output-file "$OUT_DIR/results.json"
