"""Evaluator integration: train briefly, evaluate the checkpoint.

Covers the eval epoch loop, prediction dumps, KITTI-format conversion,
metrics CSVs, and the evaluated-checkpoint ledger
(ref: src/monopsr/core/evaluator.py contract).
"""

import os

import numpy as np

from monopsr_tpu import constants as C
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from tests.test_trainer import make_config


def test_evaluator_runs_checkpoint(tmp_path):
    from monopsr_tpu.eval.evaluator import Evaluator
    from monopsr_tpu.train import trainer

    config = make_config(tmp_path, max_iterations=2)
    dataset = KittiDataset(config.dataset_config, 'train')
    trainer.train(config, dataset)

    val_config = make_config(tmp_path, max_iterations=2)
    val_config.dataset_config.data_split = 'val'
    val_dataset = KittiDataset(val_config.dataset_config, 'val')

    evaluator = Evaluator(val_config, val_dataset, eval_mode='val',
                          do_kitti_native_eval=False)
    results = evaluator.run_latest_checkpoints('all')

    assert results
    result = results[-1]
    assert result['num_samples'] >= 1
    assert np.isfinite(result['losses']['total_loss'])
    assert C.METRIC_CHAMFER in result['metrics']

    step = result['step']
    # Prediction artifacts
    box_3d_dir = os.path.join(val_config.pred_dir, 'box_3d', 'val',
                              str(step))
    files = os.listdir(box_3d_dir)
    assert files
    rows = np.loadtxt(os.path.join(box_3d_dir, files[0])).reshape(-1, 9)
    assert rows.shape[1] == 9

    # KITTI-format conversion (CRLF rows, 16 fields)
    kitti_dir = os.path.join(
        val_config.pred_dir, 'kitti_predictions_3d', 'val', '0.1',
        str(step), 'data')
    assert os.path.isdir(kitti_dir)
    kitti_files = [f for f in os.listdir(kitti_dir)
                   if os.path.getsize(os.path.join(kitti_dir, f)) > 0]
    assert kitti_files
    with open(os.path.join(kitti_dir, kitti_files[0]), 'rb') as f:
        content = f.read()
    assert b'\r\n' in content
    first = content.decode().split('\r\n')[0].split()
    assert len(first) == 16
    assert first[0] == 'Car'

    # Metrics CSVs
    metrics_dir = os.path.join(val_config.exp_output_dir, 'metrics',
                               str(step), 'val')
    assert os.path.exists(os.path.join(metrics_dir, 'metrics_avg.csv'))

    # Ledger-based skip
    evaluator._mark_evaluated(step)
    assert step in evaluator.get_evaluated_ckpts()
