"""KittiDataset integration tests against the checked-in mini fixture.

Pattern follows the reference dataset tests
(ref: src/monopsr/datasets/kitti/kitti_dataset_test.py:12-143): sample
loading, split validation errors, batch wrapping / epoch accounting —
plus checks of the fixed-shape TPU representation.
"""

import os

import numpy as np
import pytest

from monopsr_tpu import constants as C
from monopsr_tpu.config import ConfigObj
from monopsr_tpu.datasets.kitti import kitti_dataset as kd
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'datasets/Kitti/object')


def make_dataset_config(**overrides):
    cfg = ConfigObj({
        'dataset_type': 'kitti_obj',
        'use_mscnn_detections': True,
        'mscnn_thr': [0.2, 0.2, 0.2],
        'mscnn_dir': os.path.join(FIXTURE, 'mscnn'),
        'batch_size': 1,
        'oversample': True,
        'num_boxes': 32,
        'num_alpha_bins': 12,
        'alpha_bin_overlap': 0.0,
        'centroid_type': 'middle',
        'classes': ['Car'],
        'obj_filter_config': {
            'difficulty_str': 'hard',
            'box_2d_height': None,
            'truncation': 0.3,
            'occlusion': None,
            'depth_range': [5, 45],
        },
        'aug_config': {
            'use_image_aug': False,
            'box_jitter_type': 'oversample',
        },
        'name': 'kitti',
        'dataset_dir': FIXTURE,
        'data_split': 'train',
        'data_split_dir': 'training',
        'has_kitti_labels': True,
        'depth_version': 'multiscale',
        'instance_version': 'depth_2_multiscale',
    })
    for key, value in overrides.items():
        setattr(cfg, key, value)
    return cfg


class TestKittiDataset:

    def test_invalid_split_raises(self):
        cfg = make_dataset_config(data_split='nope')
        with pytest.raises(ValueError):
            KittiDataset(cfg, 'train')

    def test_invalid_split_dir_raises(self):
        cfg = make_dataset_config(data_split_dir='nope')
        with pytest.raises(ValueError):
            KittiDataset(cfg, 'train')

    def test_train_sample_shapes(self):
        dataset = KittiDataset(make_dataset_config(), 'train')
        assert dataset.num_samples == 7

        found = 0
        for _ in range(dataset.num_samples):
            batch = dataset.next_batch(1, shuffle=False)
            sample = batch[0]
            if sample is None:
                continue
            found += 1
            n = dataset.num_boxes
            assert sample[C.SAMPLE_LABEL_BOXES_2D].shape == (n, 4)
            assert sample[C.SAMPLE_LABEL_BOXES_3D].shape == (n, 7)
            assert sample[C.SAMPLE_ALPHA_REGS].shape == (n, 12)
            assert sample[C.SAMPLE_MEAN_LWH].shape == (n, 3)
            assert sample[C.SAMPLE_DEPTH_MAP].shape == kd.DEPTH_PAD_SHAPE
            assert sample[kd.SAMPLE_INSTANCE_IMAGE].shape == \
                kd.DEPTH_PAD_SHAPE
            assert sample[kd.SAMPLE_INSTANCE_INDICES].shape == (n,)
            assert 1 <= sample[C.SAMPLE_NUM_OBJS] <= n
            # Depth map has content
            assert sample[C.SAMPLE_DEPTH_MAP].max() > 1.0
            # All instance indices point at real instances
            inst_img = sample[kd.SAMPLE_INSTANCE_IMAGE]
            for idx in sample[kd.SAMPLE_INSTANCE_INDICES]:
                assert np.any(inst_img == idx)
        assert found >= 4  # most fixture samples contain cars

    def test_epoch_accounting(self):
        dataset = KittiDataset(make_dataset_config(), 'train')
        n = dataset.num_samples
        _ = dataset.next_batch(n - 1, shuffle=False)
        assert dataset.epochs_completed == 0
        _ = dataset.next_batch(2, shuffle=False)
        assert dataset.epochs_completed == 1
        assert dataset._index_in_epoch == 1

    def test_val_mode_merges_mscnn(self):
        dataset = KittiDataset(
            make_dataset_config(data_split='val'), 'val')
        samples = [s for s in dataset.next_batch(dataset.num_samples,
                                                 shuffle=False)
                   if s is not None]
        assert samples
        # MSCNN-merged boxes carry detection scores
        for s in samples:
            scores = s[C.SAMPLE_LABEL_SCORES]
            assert np.all(scores > 0)

    def test_test_mode(self):
        dataset = KittiDataset(
            make_dataset_config(data_split='test',
                                data_split_dir='testing',
                                has_kitti_labels=False), 'test')
        samples = [s for s in dataset.next_batch(dataset.num_samples,
                                                 shuffle=False)
                   if s is not None]
        assert samples
        for s in samples:
            assert C.SAMPLE_DEPTH_MAP not in s
            assert s[C.SAMPLE_LABEL_BOXES_2D].shape == (32, 4)

    def test_jitter_changes_oversampled_boxes(self):
        cfg = make_dataset_config()
        dataset = KittiDataset(cfg, 'train')
        dataset._rng = np.random.RandomState(0)
        for _ in range(dataset.num_samples):
            sample = dataset.next_batch(1, shuffle=False)[0]
            if sample is None:
                continue
            num_objs = sample[C.SAMPLE_NUM_OBJS]
            if num_objs < dataset.num_boxes:
                boxes = sample[C.SAMPLE_LABEL_BOXES_2D]
                # Oversampled slots repeat originals but jittered
                originals = boxes[:num_objs]
                extras = boxes[num_objs:]
                assert not np.isin(extras, originals).all()
                break
