"""Feature-map image summaries: grid math + trainer wiring
(ref: src/monopsr/core/summary_utils.py:17-66)."""

import glob
import os

import numpy as np

from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from monopsr_tpu.train import trainer
from monopsr_tpu.utils import summary_images
from tests.test_train_eval import make_config


def test_feature_map_grid_tiling():
    fmap = np.zeros((4, 6, 5), np.float32)
    for c in range(5):
        fmap[..., c] = c
    grid = summary_images.feature_map_grid(fmap)
    # 5 channels -> 3x2 grid
    assert grid.shape == (2 * 4, 3 * 6)
    # Channel 0 normalizes to 0, channel 4 to 1
    assert grid[0, 0] == 0.0
    assert grid[4:8, 6:12].max() == 1.0
    # Unfilled cell stays zero
    assert grid[4:8, 12:18].max() == 0.0


def test_save_feature_maps(tmp_path):
    fmap = np.random.RandomState(0).randn(8, 8, 12).astype(np.float32)
    path = summary_images.save_feature_maps(str(tmp_path), 7, 'probe',
                                            fmap)
    assert os.path.exists(path)
    assert path.endswith('7_probe.png')


def test_trainer_writes_feature_grids(tmp_path):
    config = make_config(tmp_path, max_iterations=1)
    config.summary_images = True
    dataset = KittiDataset(config.dataset_config, 'train')
    trainer.train(config, dataset)

    images = glob.glob(os.path.join(config.logdir, 'images', '*.png'))
    names = {os.path.basename(p) for p in images}
    assert '1_features_for_map.png' in names
    assert '1_features_for_box_3d.png' in names
