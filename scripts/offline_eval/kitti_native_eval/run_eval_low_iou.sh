#!/bin/bash
# Runs the native KITTI AP evaluation at the LOW IoU regime
# (0.5 / 0.25 / 0.25 for Car / Pedestrian / Cyclist).
# Args: same as run_eval.sh
set -e

eval_script_dir=$1
checkpoint_name=$2
score_threshold=$3
global_step=$4
prediction_dir=$5
gt_dir=$6
data_split=$7

result_dir=${prediction_dir}/kitti_predictions_3d/${data_split}/${score_threshold}/${global_step}
results_out=${prediction_dir}/${checkpoint_name}_results_low_iou_${score_threshold}.txt

cd "${eval_script_dir}"
echo "step ${global_step}" | tee -a "${results_out}"
./evaluate_object_3d_offline "${gt_dir}" "${result_dir}" low | tee -a "${results_out}"

# Render PR-curve figures from the curve txts (matplotlib twin of the
# reference's gnuplot output); best-effort.
# (cwd is eval_script_dir here, so the plotter sits one level up)
PYTHON_BIN="${PYTHON_BIN:-$(command -v python3 || command -v python)}"
"${PYTHON_BIN}" ../plot_pr_curves.py "${result_dir}" || true
