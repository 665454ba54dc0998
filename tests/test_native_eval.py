"""Native C++ KITTI evaluator tests: build, protocol sanity checks.

Pattern: the reference treats the native evaluator as the ground-truth
scorer compiled on demand (ref: evaluator_utils.py:457-469). Checks:
perfect predictions score identically across metrics; position jitter
hurts only the 3D/BEV metrics; the low-IoU regime recovers them.
"""

import os
import re
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_DIR = os.path.join(REPO, 'scripts/offline_eval/kitti_native_eval')
GT_DIR = os.path.join(REPO, 'tests/datasets/Kitti/object/training/label_2')
TRAIN_SPLIT = os.path.join(REPO, 'tests/datasets/Kitti/object/train.txt')


@pytest.fixture(scope='module')
def binary():
    subprocess.run(['make', '-s', '-C', EVAL_DIR], check=True)
    path = os.path.join(EVAL_DIR, 'evaluate_object_3d_offline')
    assert os.path.exists(path)
    return path


def write_predictions(out_dir, jitter_xz=0.0, seed=0):
    rng = np.random.RandomState(seed)
    data_dir = os.path.join(out_dir, 'data')
    os.makedirs(data_dir, exist_ok=True)
    names = open(TRAIN_SPLIT).read().split()
    for name in names:
        rows = []
        for line in open(os.path.join(GT_DIR, name + '.txt')):
            parts = line.split()
            if parts[0] == 'DontCare':
                continue
            vals = [float(x) for x in parts[1:]]
            if jitter_xz:
                vals[10] += rng.uniform(-jitter_xz, jitter_xz)
                vals[12] += rng.uniform(-jitter_xz, jitter_xz)
            rows.append(parts[0] + ' ' +
                        ' '.join('%.2f' % v for v in vals) +
                        ' %.2f' % rng.uniform(0.5, 1.0))
        with open(os.path.join(data_dir, name + '.txt'), 'w') as f:
            f.write('\n'.join(rows) + '\n')
    return out_dir


def parse_ap(output, curve):
    match = re.search(curve + r' AP: ([\d.]+) ([\d.]+) ([\d.]+)', output)
    assert match, 'missing curve {} in:\n{}'.format(curve, output)
    return [float(match.group(i)) for i in (1, 2, 3)]


def run_eval(binary, result_dir, low=False):
    args = [binary, GT_DIR, result_dir] + (['low'] if low else [])
    out = subprocess.run(args, capture_output=True, text=True,
                         check=True)
    return out.stdout


class TestNativeEval:

    def test_perfect_predictions(self, binary, tmp_path):
        result_dir = write_predictions(str(tmp_path / 'perfect'))
        out = run_eval(binary, result_dir)

        img = parse_ap(out, 'car_detection')
        bev = parse_ap(out, 'car_detection_BEV')
        full3d = parse_ap(out, 'car_detection_3D')
        aos = parse_ap(out, 'car_orientation')

        # Perfect boxes: all metrics agree, and AOS equals detection AP
        assert img == bev == full3d == aos
        assert img[2] > 0  # hard difficulty has GT in the fixture

        # Precision must be 1.0 wherever the recall grid is filled
        curve = np.loadtxt(os.path.join(result_dir, 'plot',
                                        'car_detection.txt'))
        filled = curve[:, 1] > 0
        np.testing.assert_allclose(curve[filled, 1], 1.0)

    def test_position_jitter_hurts_3d_only(self, binary, tmp_path):
        result_dir = write_predictions(str(tmp_path / 'jit'),
                                       jitter_xz=0.4)
        out = run_eval(binary, result_dir)
        img = parse_ap(out, 'car_detection')
        full3d = parse_ap(out, 'car_detection_3D')
        assert sum(full3d) < sum(img)

        # The low-IoU regime is forgiving of 0.4m jitter
        out_low = run_eval(binary, result_dir, low=True)
        low3d = parse_ap(out_low, 'car_detection_3D')
        assert sum(low3d) > sum(full3d)
        assert low3d == parse_ap(out_low, 'car_detection')

    def test_empty_predictions(self, binary, tmp_path):
        data_dir = tmp_path / 'empty' / 'data'
        data_dir.mkdir(parents=True)
        for name in open(TRAIN_SPLIT).read().split():
            (data_dir / (name + '.txt')).write_text('')
        out = run_eval(binary, str(tmp_path / 'empty'))
        # No class present in predictions -> no curves, clean exit
        assert 'Done' in out
