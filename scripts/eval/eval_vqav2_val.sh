#!/bin/bash
# VQAv2 validation-split eval with local official scoring (reference
# scripts/eval/eval_vqav2_val.sh; unlike test-dev this split has answers).
MODEL_PATH=${1:?usage: eval_vqav2_val.sh MODEL_PATH EVAL_DIR}
EVAL_DIR=${2:?need EVAL_DIR}
source "$(dirname "$0")/_common.sh"
QUESTION_FILE=$EVAL_DIR/eval/vqav2/llava_vqav2_val.jsonl
IMAGE_FOLDER=$EVAL_DIR/eval/vqav2/val2014
OUT_DIR=${OUT_DIR:-out/eval/vqav2_val}
fanout_eval
python - "$OUT_DIR/merge.jsonl" "$EVAL_DIR/eval/vqav2" <<'PY'
import json, sys
from visualrwkv_tpu.evals.metrics.vqa import evaluate_vqa
answers = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
ann = json.load(open(sys.argv[2] + "/v2_mscoco_val2014_annotations.json"))
gts = {str(a["question_id"]): [x["answer"] for x in a["answers"]] for a in ann["annotations"]}
preds = {str(a["question_id"]): a["text"] for a in answers}
print(json.dumps(evaluate_vqa(preds, {q: gts[q] for q in preds if q in gts})))
PY
