#!/bin/bash
# ScienceQA-IMG eval (reference scripts/eval/eval_sqa.sh analog).
set -e
MODEL_PATH=${1:?usage: eval_scienceqa.sh MODEL_PATH QUESTION_FILE IMAGE_FOLDER}
python -m visualrwkv_tpu.evals.cli \
    --model_path "$MODEL_PATH" --dataset_name scienceqa \
    --question_file "$2" --image_folder "$3" \
    --output_file out/eval/scienceqa/answers.jsonl
