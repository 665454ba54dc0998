"""Trainer integration test: a few optimizer steps on the mini fixture.

Analog of the reference's fake-model trainer test
(ref: src/monopsr/core/trainer_test.py:20-110), using the real model at
tiny scale: losses must be finite, parameters must change, checkpoints
must round-trip, and resume must continue from the saved step.
"""

import os

import jax
import numpy as np

from monopsr_tpu.config import ConfigObj
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from tests.test_dataset import make_dataset_config

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'datasets/Kitti/object')


def make_config(tmp_path, max_iterations=3):
    dataset_config = make_dataset_config(num_boxes=2)
    model_config = ConfigObj({
        'model_type': 'monopsr',
        'image_input_shape': [48, 160],
        'mean_sub_type': 'kitti',
        'inst_crop_type': 'depth_map',
        'img_roi_size': [16, 16],
        'map_roi_size': [16, 16],
        'centroid_type': 'middle',
        'resized_full_img_shape': [24, 80],
        'net_type': 'resnet101_4x_squash',
        'net_config': {'resnet101_4x_squash': {
            'first_stage_features_stride': 16,
            'pretrained_weights_type': None,
            'pretrained_weights_name': None,
        }},
        'proposal_fc_layers': {'layer_sizes': [16, 16],
                               'dropout_keep_prob': 1.0},
        'regression_fc_layers': {'layer_sizes': [16, 16],
                                 'dropout_keep_prob': 1.0},
        'rotate_view': True,
        'use_pointnet_features': False,
        'normalize_appended_ests': True,
        'compute_dtype': 'float32',
        'resnet': 'resnet_tiny',
        'output_config': {
            'inst_xyz_map_local': 'map',
            'lwh': 'offset',
            'alpha': 'dc',
            'view_ang': 'est',
            'cen_x': 'from_view_ang_and_z',
            'cen_y': 'offset',
            'cen_z': 'offset',
            'centroids': 'xyz',
            'inst_xyz_map_global': 'projection',
            'inst_depth_map_global': 'map',
        },
        'loss_config': {
            'inst_xyz_map_local': ['smooth_l1_nonzero', 100.0],
            'valid_mask_maps': ['sigmoid_ce', 0.1],
            'lwh': ['smooth_l1', 1.0],
            'alpha_cls': ['softmax', 0.3, 0.001],
            'alpha_reg': ['smooth_l1', 1.0],
            'alpha_cls_temp': ['softmax_temp', 0.3],
            'view_ang': ['smooth_l1', 0.1],
            'cen_y': ['smooth_l1', 0.1],
            'cen_z': ['smooth_l1', 0.1],
            'inst_xyz_map_global': ['smooth_l1_nonzero', 0.1],
            'inst_depth_map_global': ['smooth_l1_nonzero', 10.0],
        },
        'metrics_to_show': [],
        'post_process_cen_x': True,
    })
    train_config = ConfigObj({
        'max_iterations': max_iterations,
        'summary_interval': 1,
        'checkpoint_interval': 2,
        'max_checkpoints_to_keep': 100,
        'overwrite_checkpoints': False,
        'optimizer': {
            'optimizer_type': 'adam_optimizer',
            'adam_optimizer': {
                'learning_rate_type': 'exponential_decay',
                'initial_learning_rate': 1e-4,
                'decay_steps': 10000,
                'decay_factor': 0.8,
                'staircase': True,
                'use_moving_average': True,
                'moving_average_decay': 0.99,
            },
        },
        'data_parallel': 1,
        'kitti_score_threshold': 0.1,
    })
    config = ConfigObj()
    config.dataset_config = dataset_config
    config.model_config = model_config
    config.train_config = train_config
    config.config_name = 'tiny_test'
    config.exp_output_dir = str(tmp_path / 'tiny_test')
    config.checkpoint_dir = str(tmp_path / 'tiny_test' / 'checkpoints')
    config.logdir = str(tmp_path / 'tiny_test' / 'logs')
    config.pred_dir = str(tmp_path / 'tiny_test' / 'predictions')
    return config


def test_train_resume_and_evaluate(tmp_path):
    """One flow: train -> resume -> evaluate the checkpoint.

    Covers the trainer loop, checkpoint/resume, the evaluator epoch,
    prediction dumps, KITTI-format conversion, metrics CSVs, and the
    evaluated-checkpoint ledger in a single compile-heavy session
    (the CI host has one CPU core; recompiling per test is the cost).
    """
    from monopsr_tpu.eval.evaluator import Evaluator
    from monopsr_tpu.train import trainer

    config = make_config(tmp_path, max_iterations=2)
    dataset = KittiDataset(config.dataset_config, 'train')
    state = trainer.train(config, dataset)
    assert int(jax.device_get(state.step)) == 2

    log_path = os.path.join(config.logdir, 'train_log.jsonl')
    assert os.path.exists(log_path)
    with open(log_path) as f:
        lines = f.read().splitlines()
    assert len(lines) >= 2
    import json
    rec = json.loads(lines[-1])
    assert np.isfinite(rec['total_loss'])

    # Resume: a fresh call restores the step-2 checkpoint and continues
    dataset2 = KittiDataset(config.dataset_config, 'train')
    config2 = make_config(tmp_path, max_iterations=3)
    state2 = trainer.train(config2, dataset2)
    assert int(jax.device_get(state2.step)) == 3

    # --- Evaluate the trained checkpoint on the val split ---
    from monopsr_tpu import constants as C

    val_config = make_config(tmp_path, max_iterations=3)
    val_config.dataset_config.data_split = 'val'
    val_dataset = KittiDataset(val_config.dataset_config, 'val')

    evaluator = Evaluator(val_config, val_dataset, eval_mode='val',
                          do_kitti_native_eval=False)
    results = evaluator.run_latest_checkpoints([3])

    assert results
    result = results[-1]
    assert result['num_samples'] >= 1
    assert np.isfinite(result['losses']['total_loss'])
    assert C.METRIC_CHAMFER in result['metrics']

    step = result['step']
    box_3d_dir = os.path.join(val_config.pred_dir, 'box_3d', 'val',
                              str(step))
    files = os.listdir(box_3d_dir)
    assert files
    rows = np.loadtxt(os.path.join(box_3d_dir, files[0])).reshape(-1, 9)
    assert rows.shape[1] == 9

    kitti_dir = os.path.join(
        val_config.pred_dir, 'kitti_predictions_3d', 'val', '0.1',
        str(step), 'data')
    kitti_files = [f for f in os.listdir(kitti_dir)
                   if os.path.getsize(os.path.join(kitti_dir, f)) > 0]
    assert kitti_files
    with open(os.path.join(kitti_dir, kitti_files[0]), 'rb') as f:
        content = f.read()
    assert b'\r\n' in content
    first = content.decode().split('\r\n')[0].split()
    assert len(first) == 16

    # --- Batched-vs-single eval equivalence ---
    # The run above used the default eval_batch=4 (one full group);
    # re-evaluate with eval_batch=3 (pads the 4-sample tail group) and
    # eval_batch=1 and compare raw box_3d dumps.
    ref_rows = {f: np.loadtxt(os.path.join(box_3d_dir, f)).reshape(-1, 9)
                for f in files}
    for eval_batch in (3, 1):
        cfg_n = make_config(tmp_path, max_iterations=3)
        cfg_n.dataset_config.data_split = 'val'
        cfg_n.train_config.eval_batch = eval_batch
        cfg_n.pred_dir = str(
            tmp_path / 'pred_eb{}'.format(eval_batch))
        ds_n = KittiDataset(cfg_n.dataset_config, 'val')
        Evaluator(cfg_n, ds_n, eval_mode='val',
                  do_kitti_native_eval=False).run_latest_checkpoints([3])
        alt_dir = os.path.join(cfg_n.pred_dir, 'box_3d', 'val', str(step))
        assert sorted(os.listdir(alt_dir)) == sorted(files)
        for f in files:
            alt = np.loadtxt(os.path.join(alt_dir, f)).reshape(-1, 9)
            np.testing.assert_allclose(alt, ref_rows[f], rtol=1e-4,
                                       atol=1e-4, err_msg=f)
    assert first[0] == 'Car'

    metrics_dir = os.path.join(val_config.exp_output_dir, 'metrics',
                               str(step), 'val')
    assert os.path.exists(os.path.join(metrics_dir, 'metrics_avg.csv'))

    evaluator._mark_evaluated(step)
    assert step in evaluator.get_evaluated_ckpts()
