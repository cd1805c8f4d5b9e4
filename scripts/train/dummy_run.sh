#!/bin/bash
# Integration smoke test (reference scripts/train/dummy_run.sh): tiny model,
# synthesized data, 4 steps end to end.
set -e
python -m visualrwkv_tpu.train.cli --dummy --proj_dir out/dummy_run "$@"
