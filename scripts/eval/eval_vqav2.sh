#!/bin/bash
# VQAv2 eval with process fan-out sharding (reference scripts/eval/eval_vqav2.sh):
# one process per chunk; results concatenate for the submission converter.
set -e
MODEL_PATH=${1:?usage: eval_vqav2.sh MODEL_PATH QUESTION_FILE IMAGE_FOLDER [N_CHUNKS]}
QUESTION_FILE=${2}
IMAGE_FOLDER=${3}
N=${4:-1}
OUT_DIR=out/eval/vqav2
mkdir -p "$OUT_DIR"
for IDX in $(seq 0 $((N-1))); do
  python -m visualrwkv_tpu.evals.cli \
      --model_path "$MODEL_PATH" \
      --question_file "$QUESTION_FILE" --image_folder "$IMAGE_FOLDER" \
      --output_file "$OUT_DIR/answers_${N}_${IDX}.jsonl" \
      --num_chunks "$N" --chunk_idx "$IDX" &
  PIDS+=($!)
done
FAIL=0
for pid in "${PIDS[@]}"; do wait "$pid" || FAIL=1; done
[ "$FAIL" -ne 0 ] && { echo "ERROR: eval chunk failed" >&2; exit 1; }
cat "$OUT_DIR"/answers_${N}_*.jsonl > "$OUT_DIR/answers.jsonl"
python -c "
from visualrwkv_tpu.evals.converters import convert_vqav2_for_submission
convert_vqav2_for_submission('$OUT_DIR/answers.jsonl', '$OUT_DIR/submission.json')
print('wrote $OUT_DIR/submission.json')
"
