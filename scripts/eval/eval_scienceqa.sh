#!/bin/bash
# ScienceQA-IMG eval + accuracy (reference scripts/eval/eval_scienceqa.sh).
MODEL_PATH=${1:?usage: eval_scienceqa.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/scienceqa/llava_test_CQM-A.json
IMAGE_FOLDER=$EVAL_DIR/eval/scienceqa/images/test
OUT_DIR=${OUT_DIR:-out/eval/scienceqa}
EXTRA_FLAGS="--dataset_name scienceqa"
fanout_eval
python -m visualrwkv_tpu.evals.score scienceqa \
  --base-dir "$EVAL_DIR/eval/scienceqa" \
  --result-file "$OUT_DIR/merge.jsonl" \
  --output-result "$OUT_DIR/result.json"
