#!/bin/bash
# Runs the native KITTI AP evaluation at the standard IoU regime.
#
# Args:
#   1 eval_script_dir   directory containing the compiled evaluator
#   2 checkpoint_name   experiment/checkpoint name (for the results file)
#   3 score_threshold   score threshold used for the predictions
#   4 global_step       checkpoint step
#   5 prediction_dir    predictions base dir (contains
#                       kitti_predictions_3d/<split>/<thr>/<step>)
#   6 gt_dir            KITTI label_2 directory
#   7 data_split        dataset split name
set -e

eval_script_dir=$1
checkpoint_name=$2
score_threshold=$3
global_step=$4
prediction_dir=$5
gt_dir=$6
data_split=$7

result_dir=${prediction_dir}/kitti_predictions_3d/${data_split}/${score_threshold}/${global_step}
results_out=${prediction_dir}/${checkpoint_name}_results_${score_threshold}.txt

cd "${eval_script_dir}"
echo "step ${global_step}" | tee -a "${results_out}"
./evaluate_object_3d_offline "${gt_dir}" "${result_dir}" | tee -a "${results_out}"

# Render PR-curve figures from the curve txts (the reference's binary
# does this via gnuplot; we use matplotlib). Best-effort: an eval run
# without matplotlib still produces the txts.
# (cwd is eval_script_dir here, so the plotter sits one level up)
PYTHON_BIN="${PYTHON_BIN:-$(command -v python3 || command -v python)}"
"${PYTHON_BIN}" ../plot_pr_curves.py "${result_dir}" || true
