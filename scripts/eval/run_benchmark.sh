#!/bin/bash
# Generic benchmark runner (replaces the reference's per-benchmark
# scripts/eval/eval_*.sh family, v7.00/scripts/eval/): chunked process
# fan-out -> concatenate -> per-benchmark scorer/converter.
#
# usage: run_benchmark.sh BENCH MODEL_PATH QUESTION_FILE IMAGE_FOLDER [N_CHUNKS] [EXTRA_ARGS...]
#   BENCH in: vqav2 gqa textvqa pope scienceqa mme mmbench mmvet vizwiz
#             videomme chartqa docvqa infovqa interleave
set -e
BENCH=${1:?bench name}
MODEL_PATH=${2:?model path}
QUESTION_FILE=${3:?question file}
IMAGE_FOLDER=${4:-}
N=${5:-1}
shift 5 || shift $#
OUT_DIR=out/eval/$BENCH
mkdir -p "$OUT_DIR"

STRATEGY=single
case "$BENCH" in
  videomme) STRATEGY=video ;;
  interleave) STRATEGY=multi ;;
esac

# NOTE: on a single-accelerator host run with N=1 (TPU runtime holds an
# exclusive device lock; the reference's fan-out assumed one GPU per chunk).
PIDS=()
for IDX in $(seq 0 $((N-1))); do
  python -m visualrwkv_tpu.evals.cli \
      --model_path "$MODEL_PATH" \
      --question_file "$QUESTION_FILE" \
      ${IMAGE_FOLDER:+--image_folder "$IMAGE_FOLDER"} \
      --image_strategy "$STRATEGY" \
      --output_file "$OUT_DIR/answers_${N}_${IDX}.jsonl" \
      --num_chunks "$N" --chunk_idx "$IDX" "$@" &
  PIDS+=($!)
done
FAIL=0
for pid in "${PIDS[@]}"; do
  wait "$pid" || FAIL=1
done
if [ "$FAIL" -ne 0 ]; then
  echo "ERROR: one or more eval chunks failed; refusing to score a partial run" >&2
  exit 1
fi
cat "$OUT_DIR"/answers_${N}_*.jsonl > "$OUT_DIR/answers.jsonl"

python - "$BENCH" "$OUT_DIR" <<'PY'
import json, sys
bench, out_dir = sys.argv[1], sys.argv[2]
answers = f"{out_dir}/answers.jsonl"
recs = [json.loads(l) for l in open(answers)]
from visualrwkv_tpu.evals import converters as C
from visualrwkv_tpu.evals.metrics import simple as S

if bench == "vqav2":
    C.convert_vqav2_for_submission(answers, f"{out_dir}/submission.json")
elif bench == "gqa":
    C.convert_gqa_for_eval(answers, f"{out_dir}/gqa_predictions.json")
elif bench == "pope":
    print(json.dumps(S.evaluate_pope(recs), indent=2))
elif bench == "scienceqa":
    print(json.dumps(S.evaluate_scienceqa(recs), indent=2))
elif bench == "mme":
    print(json.dumps(S.evaluate_mme(recs), indent=2))
elif bench == "mmbench":
    C.convert_mmbench_for_submission(answers, f"{out_dir}/questions.tsv",
                                     f"{out_dir}/submission.xlsx")
elif bench == "mmvet":
    C.convert_mmvet_for_eval(answers, f"{out_dir}/mmvet_results.json")
elif bench == "videomme":
    C.convert_videomme_for_eval(answers, f"{out_dir}/questions.json",
                                f"{out_dir}/videomme_results.json")
elif bench == "textvqa":
    from visualrwkv_tpu.evals.metrics.vqa import textvqa_accuracy
    print(json.dumps(textvqa_accuracy(recs), indent=2))
elif bench == "interleave":
    from visualrwkv_tpu.evals.metrics.interleave import evaluate_interleave
    print(json.dumps(evaluate_interleave(recs), indent=2))
else:  # chartqa/docvqa/infovqa/vizwiz: exact-match family / submission files
    print(json.dumps(S.evaluate_exact(recs), indent=2, default=str))
print(f"answers: {answers}")
PY
