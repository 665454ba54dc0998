"""Golden tests for the KITTI-format prediction writers."""

import os

import numpy as np

from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from monopsr_tpu.eval import kitti_writers
from tests.test_dataset import make_dataset_config


def _write_raw_predictions(box_3d_dir, box_2d_dir, sample_name):
    os.makedirs(box_3d_dir, exist_ok=True)
    os.makedirs(box_2d_dir, exist_ok=True)
    # (N, 9): x y z l w h ry score class
    rows_3d = np.array([
        [1.5, 1.6, 20.0, 3.9, 1.6, 1.5, 0.25, 0.9, 0.0],
        [-4.0, 1.4, 33.0, 3.8, 1.7, 1.4, -1.2, 0.05, 0.0],  # below thr
    ])
    # (N, 7): y1 x1 y2 x2 alpha score class
    rows_2d = np.array([
        [150.0, 500.0, 250.0, 620.0, 0.1, 0.9, 0.0],
        [160.0, 100.0, 200.0, 180.0, -0.5, 0.05, 0.0],
    ])
    np.savetxt(os.path.join(box_3d_dir, sample_name + '.txt'), rows_3d,
               fmt='%0.5f')
    np.savetxt(os.path.join(box_2d_dir, sample_name + '.txt'), rows_2d,
               fmt='%0.5f')


def test_box_3d_kitti_format(tmp_path):
    dataset = KittiDataset(make_dataset_config(), 'train')
    sample_name = dataset.sample_list[0].name

    base = str(tmp_path)
    box_3d_dir = os.path.join(base, 'box_3d')
    box_2d_dir = os.path.join(base, 'box_2d')
    _write_raw_predictions(box_3d_dir, box_2d_dir, sample_name)

    out_dir, num_valid = \
        kitti_writers.save_predictions_box_3d_in_kitti_format(
            0.1, dataset, base, box_3d_dir, box_2d_dir, 4000)

    assert num_valid == 1
    path = os.path.join(out_dir, sample_name + '.txt')
    with open(path, 'rb') as f:
        raw = f.read()
    assert raw.endswith(b'\r\n')

    fields = raw.decode().strip().split()
    assert len(fields) == 16
    assert fields[0] == 'Car'
    assert fields[1] == '-1' and fields[2] == '-1'   # trunc, occ
    assert float(fields[3]) == 0.1                    # alpha
    # 2D box reordered to x1 y1 x2 y2
    assert [float(fields[i]) for i in (4, 5, 6, 7)] == \
        [500.0, 150.0, 620.0, 250.0]
    # Dimensions reordered lwh -> h w l
    assert [float(fields[i]) for i in (8, 9, 10)] == [1.5, 1.6, 3.9]
    assert [float(fields[i]) for i in (11, 12, 13)] == [1.5, 1.6, 20.0]
    assert float(fields[14]) == 0.25                  # ry
    assert float(fields[15]) == 0.9                   # score
    # The 0.05-score detection was filtered
    assert len(raw.decode().strip().splitlines()) == 1

    # Empty files written for samples without predictions
    other = dataset.sample_list[1].name
    assert os.path.exists(os.path.join(out_dir, other + '.txt'))


def test_box_2d_kitti_format(tmp_path):
    dataset = KittiDataset(make_dataset_config(), 'train')
    sample_name = dataset.sample_list[0].name

    base = str(tmp_path)
    box_2d_dir = os.path.join(base, 'box_2d_only')
    os.makedirs(box_2d_dir, exist_ok=True)
    # (N, 7): y1 x1 y2 x2 alpha score class
    rows = np.array([[150.0, 500.0, 250.0, 620.0, 0.3, 0.8, 0.0]])
    np.savetxt(os.path.join(box_2d_dir, sample_name + '.txt'), rows,
               fmt='%0.5f')

    out_dir = kitti_writers.save_predictions_box_2d_in_kitti_format(
        0.1, dataset, base, box_2d_dir, 2000)
    fields = open(os.path.join(out_dir, sample_name + '.txt')
                  ).read().strip().split()
    assert len(fields) == 16
    assert fields[0] == 'Car'
    assert float(fields[3]) == -10.0                  # alpha placeholder
    assert [float(fields[i]) for i in (4, 5, 6, 7)] == \
        [500.0, 150.0, 620.0, 250.0]
    assert float(fields[8]) == -1000.0                # no 3D fields
    assert float(fields[15]) == 0.8


def test_save_kitti_predictions_cli_2d_mode(tmp_path):
    """The offline converter's --save_2d mode drives the 2D-only writer
    (ref: scripts/offline_eval/save_kitti_predictions.py save_2d option)."""
    import subprocess
    import sys

    import yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = os.path.join(repo, 'tests', 'datasets', 'Kitti', 'object')
    with open(os.path.join(repo, 'configs', 'monopsr_model_000.yaml')) as f:
        raw = yaml.safe_load(f)
    raw['dataset_config']['dataset_dir'] = fixture
    raw['dataset_config']['mscnn_dir'] = os.path.join(fixture, 'mscnn')
    config_path = str(tmp_path / 'cli2d.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(raw, f)

    dataset = KittiDataset(make_dataset_config(), 'train')
    sample_name = dataset.sample_list[0].name
    out_base = str(tmp_path / 'outputs')
    box_2d_dir = os.path.join(out_base, 'cli2d', 'predictions', 'box_2d',
                              'train', '2000')
    os.makedirs(box_2d_dir)
    rows = np.array([[150.0, 500.0, 250.0, 620.0, 0.3, 0.8, 0.0]])
    np.savetxt(os.path.join(box_2d_dir, sample_name + '.txt'), rows,
               fmt='%0.5f')

    script = os.path.join(repo, 'scripts', 'offline_eval',
                          'save_kitti_predictions.py')
    proc = subprocess.run(
        [sys.executable, script, '--config_path', config_path,
         '--data_split', 'train', '--steps', '2000', '--save_2d',
         '--output_base_dir', out_base],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr

    out_path = os.path.join(out_base, 'cli2d', 'predictions',
                            'kitti_predictions_3d', 'train', '0.1', '2000',
                            'data', sample_name + '.txt')
    fields = open(out_path).read().strip().split()
    assert len(fields) == 16
    assert fields[0] == 'Car'
    assert float(fields[3]) == -10.0
    assert float(fields[8]) == -1000.0
    assert float(fields[15]) == 0.8
