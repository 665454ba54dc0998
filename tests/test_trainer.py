"""Trainer integration test: a few optimizer steps on the mini fixture.

Analog of the reference's fake-model trainer test
(ref: src/monopsr/core/trainer_test.py:20-110), using the real model at
tiny scale: losses must be finite, parameters must change, checkpoints
must round-trip, and resume must continue from the saved step.
"""

import os

import jax
import numpy as np
import pytest

from monopsr_tpu.config import ConfigObj
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from tests.test_dataset import make_dataset_config

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'datasets/Kitti/object')


def make_config(tmp_path, max_iterations=3):
    dataset_config = make_dataset_config(num_boxes=4)
    model_config = ConfigObj({
        'model_type': 'monopsr',
        'image_input_shape': [64, 192],
        'mean_sub_type': 'kitti',
        'inst_crop_type': 'depth_map',
        'img_roi_size': [24, 24],
        'map_roi_size': [24, 24],
        'centroid_type': 'middle',
        'resized_full_img_shape': [32, 96],
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


def test_train_few_steps_and_resume(tmp_path):
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
