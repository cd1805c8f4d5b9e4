#!/bin/bash
# MME eval + acc/acc+ calculation (reference scripts/eval/eval_mme.sh).
MODEL_PATH=${1:?usage: eval_mme.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/MME/llava_mme.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/MME/MME_Benchmark_release_version
OUT_DIR=${OUT_DIR:-out/eval/mme}
fanout_eval
python -m visualrwkv_tpu.evals.score mme \
  --question-file "$QUESTION_FILE" \
  --result-file "$OUT_DIR/merge.jsonl"
