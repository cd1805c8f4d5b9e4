# Shared eval fan-out helpers (sourced by the per-benchmark scripts).
#
# Mirrors the reference's one-process-per-GPU chunking protocol
# (VisualRWKV-v7/v7.00/scripts/eval/*.sh): N processes each take
# --num_chunks N --chunk_idx i, answers concatenate into merge.jsonl.
# On a single TPU chip prefer N_CHUNKS=1 with EVAL_BATCH>1 (batched decode
# replaces process fan-out); on a pod slice run one chunk per host.
#
# Callers set: QUESTION_FILE, IMAGE_FOLDER, OUT_DIR and any EXTRA_FLAGS,
# then call fanout_eval. Env knobs: N_CHUNKS (default 1), EVAL_BATCH
# (default 8), MODEL_FLAGS (model geometry overrides).

set -e

N_CHUNKS=${N_CHUNKS:-1}
EVAL_BATCH=${EVAL_BATCH:-8}
MODEL_FLAGS=${MODEL_FLAGS:-}

fanout_eval() {
  mkdir -p "$OUT_DIR"
  local pids=()
  for IDX in $(seq 0 $((N_CHUNKS - 1))); do
    python -m visualrwkv_tpu.evals.cli \
      --model_path "$MODEL_PATH" \
      --question_file "$QUESTION_FILE" \
      ${IMAGE_FOLDER:+--image_folder "$IMAGE_FOLDER"} \
      --output_file "$OUT_DIR/answers_${N_CHUNKS}_${IDX}.jsonl" \
      --num_chunks "$N_CHUNKS" --chunk_idx "$IDX" \
      --eval_batch "$EVAL_BATCH" \
      $MODEL_FLAGS $EXTRA_FLAGS &
    pids+=($!)
  done
  local fail=0
  for pid in "${pids[@]}"; do wait "$pid" || fail=1; done
  if [ "$fail" -ne 0 ]; then
    echo "ERROR: an eval chunk failed" >&2
    exit 1
  fi
  cat "$OUT_DIR"/answers_${N_CHUNKS}_*.jsonl > "$OUT_DIR/merge.jsonl"
  echo "merged $(wc -l < "$OUT_DIR/merge.jsonl") answers -> $OUT_DIR/merge.jsonl"
}
