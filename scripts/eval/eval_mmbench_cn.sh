#!/bin/bash
# MMBench-CN eval (reference scripts/eval/eval_mmbench_cn.sh): the Chinese
# split of the same TSV protocol.
exec "$(dirname "$0")/eval_mmbench.sh" "$1" "$2" "${3:-mmbench_dev_cn_20231003}"
