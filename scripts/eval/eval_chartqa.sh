#!/bin/bash
# ChartQA eval + relaxed exact-match (reference scripts/eval/eval_chartqa.sh).
MODEL_PATH=${1:?usage: eval_chartqa.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/chartqa/val.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/chartqa/png
OUT_DIR=${OUT_DIR:-out/eval/chartqa}
fanout_eval
python -m visualrwkv_tpu.evals.score exact --result-file "$OUT_DIR/merge.jsonl"
