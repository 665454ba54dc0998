"""Dataset-level PR-curve / AP tests + NumPy-vs-C++ evaluator agreement.

The PR routines twin ref core/evaluation.py:285-500; the agreement test
doubles as an independent validation of the from-scratch C++ evaluator:
on a dataset where the two protocols' differences vanish (all-easy GT,
disjoint boxes, scores separating TPs from FPs), the NumPy 11-point AP
and the C++ 41-point AP must coincide.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from monopsr_tpu.datasets.kitti import evaluation

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_DIR = os.path.join(REPO, 'scripts/offline_eval/kitti_native_eval')


def test_evaluate_2d_basic():
    gt = [np.array([[0., 0., 10., 10.], [20., 20., 30., 30.]])]
    dets = [np.array([[0., 0., 10., 10.],      # TP
                      [0., 0., 10., 10.],      # duplicate -> FP
                      [50., 50., 60., 60.]])]  # no match -> FP
    scores = [np.array([0.9, 0.8, 0.7])]
    precision, recall = evaluation.evaluate_2d(
        gt, dets, scores, score_thresholds=np.array([0.5]),
        iou_threshold=0.5)
    assert precision[0] == pytest.approx(1.0 / 3.0)
    assert recall[0] == pytest.approx(0.5)

    # Raising the threshold past the duplicates leaves only the TP
    precision, recall = evaluation.evaluate_2d(
        gt, dets, scores, score_thresholds=np.array([0.85]))
    assert precision[0] == pytest.approx(1.0)
    assert recall[0] == pytest.approx(0.5)


def test_evaluate_2d_empty_gt_frame():
    gt = [np.zeros((0, 4)), np.array([[0., 0., 10., 10.]])]
    dets = [np.array([[0., 0., 10., 10.]]),
            np.array([[0., 0., 10., 10.]])]
    scores = [np.array([0.9]), np.array([0.9])]
    precision, recall = evaluation.evaluate_2d(gt, dets, scores)
    # Frame without GT: its detection is a pure FP
    assert precision[0] == pytest.approx(0.5)
    assert recall[0] == pytest.approx(1.0)


def _box3d(tx, tz, ry=0.0, l=4.0, h=1.5, w=1.6, ty=1.5):
    return [ry, l, h, w, tx, ty, tz]


def test_evaluate_3d_invalid_slot_skipped():
    gt = [np.array([_box3d(0., 10.)])]
    dets = [np.array([_box3d(-1000., 10.), _box3d(0., 10.)])]
    scores = [np.array([0.9, 0.9])]
    precision, recall = evaluation.evaluate_3d(
        gt, dets, scores, iou_threshold=0.7)
    assert precision[0] == pytest.approx(1.0)
    assert recall[0] == pytest.approx(1.0)


def test_average_precision_computation_07():
    # Perfect curve
    assert evaluation.average_precision_computation(
        np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    # Precision 1 up to recall 0.5, nothing beyond: 6 of 11 points filled
    recall = np.array([0.5, 0.5])
    precision = np.array([1.0, 0.4])
    ap = evaluation.average_precision_computation(recall, precision)
    assert ap == pytest.approx(6.0 / 11.0)
    # Exact-integration variant on the same data
    ap_int = evaluation.average_precision_computation(
        np.array([0.25, 0.5, 1.0]), np.array([1.0, 1.0, 0.5]),
        use_07_metric=False)
    assert ap_int == pytest.approx(0.75)


# ---------------------------------------------------------------------------
# NumPy vs C++ agreement
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def binary():
    subprocess.run(['make', '-s', '-C', EVAL_DIR], check=True)
    path = os.path.join(EVAL_DIR, 'evaluate_object_3d_offline')
    assert os.path.exists(path)
    return path


def _make_agreement_dataset(root, num_frames=40, per_frame=3,
                            corrupt_every=4):
    """All-easy Car GT; predictions = GT with every Nth box pushed 100m
    away at a low score. Returns per-frame (gt, det, score) 3D arrays.

    Sized so n_gt (120) exceeds the 41-point recall grid: in that regime
    the C++ 41-point sampling and the NumPy 11-point metric coincide
    analytically (recall caps at 0.75, precision 1 up to the cap).
    """
    gt_dir = os.path.join(root, 'gt')
    pred_dir = os.path.join(root, 'pred', 'data')
    os.makedirs(gt_dir)
    os.makedirs(pred_dir)

    np_gt, np_det, np_scores = [], [], []
    box_counter = 0
    for frame in range(num_frames):
        gt_rows, det_rows = [], []
        frame_gt, frame_det, frame_scores = [], [], []
        for i in range(per_frame):
            tx = -10.0 + 8.0 * i
            tz = 15.0 + 3.0 * frame
            # Tall 2D box (height 100 px) -> 'easy' at every difficulty
            x1 = 100.0 + 150.0 * i
            box2d = (x1, 100.0, x1 + 80.0, 200.0)
            gt_rows.append(
                'Car 0.00 0 0.00 {:.2f} {:.2f} {:.2f} {:.2f} '
                '1.50 1.60 4.00 {:.2f} 1.50 {:.2f} 0.00'.format(
                    *box2d, tx, tz))
            frame_gt.append(_box3d(tx, tz))

            corrupted = (box_counter % corrupt_every == 0)
            box_counter += 1
            det_tx = tx + (100.0 if corrupted else 0.0)
            score = 0.2 if corrupted else 0.9
            det_rows.append(
                'Car 0.00 0 0.00 {:.2f} {:.2f} {:.2f} {:.2f} '
                '1.50 1.60 4.00 {:.2f} 1.50 {:.2f} 0.00 {:.2f}'.format(
                    *box2d, det_tx, tz, score))
            frame_det.append(_box3d(det_tx, tz))
            frame_scores.append(score)

        name = '{:06d}'.format(frame)
        with open(os.path.join(gt_dir, name + '.txt'), 'w') as f:
            f.write('\n'.join(gt_rows) + '\n')
        with open(os.path.join(pred_dir, name + '.txt'), 'w') as f:
            f.write('\n'.join(det_rows) + '\n')
        np_gt.append(np.array(frame_gt))
        np_det.append(np.array(frame_det))
        np_scores.append(np.array(frame_scores))

    return gt_dir, os.path.dirname(pred_dir), np_gt, np_det, np_scores


def test_numpy_ap_matches_cpp_evaluator(binary, tmp_path):
    gt_dir, pred_dir, np_gt, np_det, np_scores = _make_agreement_dataset(
        str(tmp_path))

    out = subprocess.run([binary, gt_dir, pred_dir], capture_output=True,
                         text=True, check=True).stdout
    match = re.search(r'car_detection_3D AP: ([\d.]+) ([\d.]+) ([\d.]+)',
                      out)
    assert match, out
    cpp_ap = [float(match.group(i)) for i in (1, 2, 3)]
    # All GT is 'easy': the three difficulty columns agree
    assert cpp_ap[0] == pytest.approx(cpp_ap[1]) == pytest.approx(cpp_ap[2])

    precision, recall = evaluation.evaluate_3d(
        np_gt, np_det, np_scores,
        score_thresholds=np.arange(0.05, 1.0, 0.05), iou_threshold=0.7)
    np_ap = evaluation.average_precision_computation(recall, precision)

    assert np_ap * 100.0 == pytest.approx(cpp_ap[0], abs=0.01)
    # Analytic value: precision 1 at recall points 0..0.7 -> 8/11
    assert np_ap == pytest.approx(8.0 / 11.0, abs=1e-6)

    # Sanity: the corrupted fraction caps recall below 1
    assert 0.5 < max(recall) < 1.0
