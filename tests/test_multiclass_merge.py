"""Multi-class workflow: per-class prediction runs merged and scored.

The single-class-per-run contract (ref: kitti_dataset.py:183-190) makes
multi-class KITTI evaluation a merge of per-class prediction dirs;
this validates merge_multiclass_predictions.py end-to-end against the
native evaluator: per-class AP survives the merge unchanged.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'scripts', 'offline_eval'))

from merge_multiclass_predictions import merge_prediction_dirs

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


def write_class_predictions(out_dir, class_name, seed=0):
    """Per-class 'perfect' predictions from the fixture GT, CRLF like
    the KITTI writers produce."""
    rng = np.random.RandomState(seed)
    data_dir = os.path.join(out_dir, 'data')
    os.makedirs(data_dir, exist_ok=True)
    for name in open(TRAIN_SPLIT).read().split():
        rows = []
        for line in open(os.path.join(GT_DIR, name + '.txt')):
            parts = line.split()
            if parts[0] != class_name:
                continue
            vals = ' '.join('%.2f' % float(x) for x in parts[1:])
            rows.append('{} {} {:.2f}'.format(parts[0], vals,
                                              rng.uniform(0.5, 1.0)))
        with open(os.path.join(data_dir, name + '.txt'), 'wb') as f:
            if rows:
                f.write(('\r\n'.join(rows) + '\r\n').encode())
    return data_dir


def parse_ap(output, curve):
    match = re.search(curve + r' AP: ([\d.]+) ([\d.]+) ([\d.]+)', output)
    return ([float(match.group(i)) for i in (1, 2, 3)]
            if match else None)


def run_eval(binary, result_dir):
    return subprocess.run([binary, GT_DIR, result_dir],
                          capture_output=True, text=True,
                          check=True).stdout


def test_merge_then_native_eval(binary, tmp_path):
    car_dir = write_class_predictions(str(tmp_path / 'car'), 'Car')
    ped_dir = write_class_predictions(str(tmp_path / 'ped'),
                                      'Pedestrian', seed=1)

    # Per-class baselines
    car_only = run_eval(binary, str(tmp_path / 'car'))
    ped_only = run_eval(binary, str(tmp_path / 'ped'))
    car_ap = parse_ap(car_only, 'car_detection_3D')
    ped_ap = parse_ap(ped_only, 'pedestrian_detection_3D')
    assert car_ap and sum(car_ap) > 0
    assert ped_ap and sum(ped_ap) > 0
    # Single-class runs carry no curves for the other class
    assert parse_ap(car_only, 'pedestrian_detection_3D') is None

    merged = str(tmp_path / 'merged')
    n = merge_prediction_dirs([car_dir, ped_dir],
                              os.path.join(merged, 'data'))
    assert n == len(open(TRAIN_SPLIT).read().split())

    out = run_eval(binary, merged)
    # Merged run reproduces BOTH per-class AP curves exactly
    assert parse_ap(out, 'car_detection_3D') == car_ap
    assert parse_ap(out, 'pedestrian_detection_3D') == ped_ap


def test_merged_files_are_crlf_and_complete(tmp_path):
    car_dir = write_class_predictions(str(tmp_path / 'car'), 'Car')
    cyc_dir = write_class_predictions(str(tmp_path / 'cyc'), 'Cyclist')
    merged = str(tmp_path / 'merged' / 'data')
    merge_prediction_dirs([car_dir, cyc_dir], merged)

    total_rows = 0
    for fname in os.listdir(merged):
        raw = open(os.path.join(merged, fname), 'rb').read()
        if raw:
            assert raw.endswith(b'\r\n')
            assert b'\n' not in raw.replace(b'\r\n', b'')
            total_rows += raw.count(b'\r\n')
    # All Car + Cyclist GT rows in the train split survive the merge
    names = set(open(TRAIN_SPLIT).read().split())
    expected = sum(
        1 for n in names
        for line in open(os.path.join(GT_DIR, n + '.txt'))
        if line.split()[0] in ('Car', 'Cyclist'))
    assert total_rows == expected
