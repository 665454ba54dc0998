#!/bin/bash
# Runs both IoU regimes.
set -e
dir=$(dirname "$0")
"${dir}/run_eval.sh" "$@"
"${dir}/run_eval_low_iou.sh" "$@"
