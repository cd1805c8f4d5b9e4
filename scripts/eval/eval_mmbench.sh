#!/bin/bash
# MMBench eval + submission xlsx (reference scripts/eval/eval_mmbench.sh).
MODEL_PATH=${1:?usage: eval_mmbench.sh MODEL_PATH EVAL_DIR [SPLIT]}
EVAL_DIR=${2:?need EVAL_DIR}
SPLIT=${3:-mmbench_dev_20230712}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/mmbench/$SPLIT.tsv
IMAGE_FOLDER=
OUT_DIR=${OUT_DIR:-out/eval/mmbench/$SPLIT}
EXTRA_FLAGS="--dataset_name mmbench"
fanout_eval
python -m visualrwkv_tpu.evals.score mmbench-convert \
  --result-file "$OUT_DIR/merge.jsonl" \
  --annotation-file "$QUESTION_FILE" \
  --output-file "$OUT_DIR/submission.xlsx"
