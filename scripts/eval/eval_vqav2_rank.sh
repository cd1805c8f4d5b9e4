#!/bin/bash
# VQAv2 answer-ranking eval (reference v6.0 rank_answer.py +
# scripts/eval/eval_vqav2_rank.sh): prefill once, rank candidates by
# first-token prob, re-score top-k by per-candidate CE.
MODEL_PATH=${1:?usage: eval_vqav2_rank.sh MODEL_PATH QUESTION_FILE IMAGE_FOLDER CANDIDATES_JSON}
python -m visualrwkv_tpu.evals.rank \
  --model_path "$MODEL_PATH" \
  --question_file "${2:?}" --image_folder "${3:?}" \
  --candidates_file "${4:?need candidates json}" \
  --output_file out/eval/vqav2_rank/answers.jsonl
