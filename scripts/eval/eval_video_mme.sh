#!/bin/bash
# Video-MME eval over uniform-sampled frames (reference scripts/eval/eval_video_mme.sh).
MODEL_PATH=${1:?usage: eval_video_mme.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/videomme/questions.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/videomme/frames
OUT_DIR=${OUT_DIR:-out/eval/videomme}
EXTRA_FLAGS="--image_strategy video"
fanout_eval
python -m visualrwkv_tpu.evals.score videomme-convert \
  --result-file "$OUT_DIR/merge.jsonl" \
  --annotation-file "$EVAL_DIR/eval/videomme/Video-MME.json" \
  --output-file "$OUT_DIR/results.json"
python -m visualrwkv_tpu.evals.score videomme --result-file "$OUT_DIR/results.json"
