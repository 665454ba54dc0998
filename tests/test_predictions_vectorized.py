"""Parity tests: vectorized host formatting vs the scalar reference math.

Round-2 verdict flagged `postprocess_cen_x` and `score_boxes` running as
per-box Python loops on the eval hot path. The vectorized replacements
must reproduce the scalar rules exactly — including the
project_to_image_space truncation/discard branches
(ref: src/monopsr/core/box_3d_projector.py:14-88,
monopsr_output_builder.py:805-860, instance_utils.py:988-1032).
"""

import numpy as np

from monopsr_tpu.datasets.kitti import instance_utils
from monopsr_tpu.geometry import boxes as box_geom

CAM_P = np.array([[721.5, 0.0, 609.6, 44.9],
                  [0.0, 721.5, 172.9, 0.2],
                  [0.0, 0.0, 1.0, 0.003]])
IMG_SHAPE = (375, 1242, 3)


def _random_boxes(rng, n):
    """Boxes spanning normal / off-image / oversized / degenerate cases."""
    boxes_3d = np.zeros((n, 7))
    boxes_3d[:, 0] = rng.uniform(-30, 30, n)       # x: many off-image
    boxes_3d[:, 1] = rng.uniform(0.5, 2.5, n)      # y
    boxes_3d[:, 2] = rng.uniform(4.0, 60.0, n)     # z
    boxes_3d[:, 3] = rng.uniform(0.5, 25.0, n)     # l: some oversized
    boxes_3d[:, 4] = rng.uniform(0.4, 3.0, n)      # w
    boxes_3d[:, 5] = rng.uniform(0.5, 3.0, n)      # h
    boxes_3d[:, 6] = rng.uniform(-np.pi, np.pi, n)

    boxes_2d = np.zeros((n, 4))
    boxes_2d[:, 0] = rng.uniform(100, 300, n)                  # y1
    boxes_2d[:, 1] = rng.uniform(0, 1100, n)                   # x1
    boxes_2d[:, 2] = boxes_2d[:, 0] + rng.uniform(20, 80, n)   # y2
    boxes_2d[:, 3] = boxes_2d[:, 1] + rng.uniform(20, 140, n)  # x2
    return boxes_2d, boxes_3d


def test_corners_batch_matches_scalar():
    rng = np.random.RandomState(0)
    _, boxes_3d = _random_boxes(rng, 40)
    batch = box_geom.np_compute_box_3d_corners_batch(boxes_3d)
    for i, box in enumerate(boxes_3d):
        np.testing.assert_allclose(
            batch[i], box_geom.np_compute_box_3d_corners(box), atol=1e-9)


def test_corner_projection_batch_matches_scalar():
    from monopsr_tpu.geometry import projection
    rng = np.random.RandomState(1)
    _, boxes_3d = _random_boxes(rng, 20)
    corners = box_geom.np_compute_box_3d_corners_batch(boxes_3d)
    uv = box_geom.np_project_corners_batch(corners, CAM_P)
    for i in range(len(boxes_3d)):
        np.testing.assert_allclose(
            uv[i], projection.np_project_pc_to_image(corners[i], CAM_P),
            atol=1e-9)


def test_postprocess_cen_x_batch_matches_scalar():
    rng = np.random.RandomState(2)
    boxes_2d, boxes_3d = _random_boxes(rng, 64)
    batch = instance_utils.postprocess_cen_x_batch(
        boxes_2d, boxes_3d, CAM_P)
    scalar = np.array([
        np.squeeze(instance_utils.postprocess_cen_x(b2, b3, CAM_P))
        for b2, b3 in zip(boxes_2d, boxes_3d)])
    np.testing.assert_allclose(batch, scalar, atol=1e-9)


def test_score_boxes_matches_scalar_rules():
    """Vectorized score_boxes == per-box loop over the scalar
    project_to_image_space + fit/depth rules."""
    from monopsr_tpu.eval import predictions

    class _FakeDataset:
        calib_dir = None

    rng = np.random.RandomState(3)
    boxes_2d, boxes_3d = _random_boxes(rng, 64)
    scores = rng.uniform(0, 1, (64, 1))

    # Patch the calib read to return our fixed matrix
    class _Calib:
        p2 = CAM_P

    orig = predictions.calib_utils.get_frame_calib
    predictions.calib_utils.get_frame_calib = lambda *a, **k: _Calib()
    try:
        got = predictions.score_boxes(
            _FakeDataset(), '000000', IMG_SHAPE, boxes_2d, boxes_3d,
            scores, max_depth=45.0)
    finally:
        predictions.calib_utils.get_frame_calib = orig

    # Scalar oracle: the reference's per-box rules
    want = np.zeros_like(scores)
    for idx, (box_2d, box_3d) in enumerate(zip(boxes_2d, boxes_3d)):
        projected = box_geom.project_to_image_space(
            box_3d[0:7], CAM_P, truncate=True,
            image_size=(IMG_SHAPE[1], IMG_SHAPE[0]))
        iou_fmt = np.squeeze(box_geom.boxes_2d_to_iou_fmt([box_2d]))
        if projected is None:
            fit = 0.1
        else:
            width = iou_fmt[2] - iou_fmt[0]
            height = iou_fmt[3] - iou_fmt[1]
            fit = 1.0 - (
                np.abs((iou_fmt[0] - projected[0]) / width) +
                np.abs((iou_fmt[2] - projected[2]) / width) +
                np.abs((iou_fmt[1] - projected[1]) / height) +
                np.abs((iou_fmt[3] - projected[3]) / height))
        depth = np.clip(1.0 - box_3d[2] / 45.0, 0.1, 1.0)
        want[idx] = 0.95 * scores[idx] + 0.05 * (depth + fit) / 2.0

    np.testing.assert_allclose(got, want, atol=1e-9)
    # Sanity: the box sampler actually exercised both discard branches
    assert (np.abs(got - (0.95 * scores + 0.05 * 0.1)) > 1e-6).any()


def test_format_predictions_accepts_slot_truncated_outputs():
    """format_predictions must handle device outputs truncated to a
    slot bucket (pack_outputs_for_host max_slots): same rows for the
    valid objects as the full-slot pull (regression: the evaluator's
    bucketed pulls crashed on the full-size host label arrays)."""
    from monopsr_tpu import constants as C
    from monopsr_tpu.eval import predictions
    from monopsr_tpu.models import monopsr
    from monopsr_tpu.models.monopsr_net import NetConfig

    num_boxes, num_objs, bucket = 8, 2, 4
    cfg = NetConfig(num_boxes=num_boxes)
    rng = np.random.RandomState(4)

    boxes_2d, boxes_3d = _random_boxes(rng, num_boxes)
    sample = {
        C.SAMPLE_NAME: '000000',
        C.SAMPLE_IMAGE_INPUT: np.zeros(IMG_SHAPE, np.uint8),
        C.SAMPLE_NUM_OBJS: num_objs,
        C.SAMPLE_CAM_P: CAM_P,
        C.SAMPLE_LABEL_SCORES: rng.uniform(0, 1, num_boxes),
        C.SAMPLE_LABEL_BOXES_2D: boxes_2d,
        C.SAMPLE_LABEL_BOXES_3D: boxes_3d,
        C.SAMPLE_LABEL_CLASS_INDICES: np.ones((num_boxes, 1), np.int32),
    }
    roi = cfg.map_roi_size
    outputs = {
        C.KEY_VALID_MASK_MAPS:
            rng.randn(num_boxes, roi[0], roi[1], 1).astype(np.float32),
        C.KEY_INST_XYZ_MAP_LOCAL:
            rng.randn(num_boxes, roi[0], roi[1], 3).astype(np.float32),
        C.KEY_LWH: rng.uniform(0.5, 4, (num_boxes, 3)),
        C.KEY_VIEW_ANG: rng.uniform(-1, 1, (num_boxes, 1)),
        C.KEY_ALPHA_BINS:
            rng.randn(num_boxes, cfg.num_alpha_bins),
        C.KEY_ALPHA_REGS:
            rng.uniform(-0.2, 0.2, (num_boxes, cfg.num_alpha_bins)),
        C.KEY_CENTROIDS: np.stack(
            [rng.uniform(-5, 5, num_boxes), rng.uniform(0.5, 2, num_boxes),
             rng.uniform(5, 40, num_boxes)], axis=1),
    }
    truncated = monopsr.slice_box_slots(dict(outputs), num_boxes, bucket)
    assert truncated[C.KEY_LWH].shape[0] == bucket

    class _Calib:
        p2 = CAM_P

    class _FakeDataset:
        calib_dir = None

    orig = predictions.calib_utils.get_frame_calib
    predictions.calib_utils.get_frame_calib = lambda *a, **k: _Calib()
    try:
        ds = _FakeDataset()
        full = predictions.format_predictions(
            cfg, outputs, sample, ds, 'val')
        trunc = predictions.format_predictions(
            cfg, truncated, sample, ds, 'val')
        # test mode allocates boxes_3d itself; exercise that branch too
        test_full = predictions.format_predictions(
            cfg, outputs, sample, ds, 'test')
        test_trunc = predictions.format_predictions(
            cfg, truncated, sample, ds, 'test')
    finally:
        predictions.calib_utils.get_frame_calib = orig

    for key in (C.KEY_BOX_3D, C.KEY_BOX_2D):
        assert full[key].shape[0] == num_objs
        np.testing.assert_allclose(trunc[key], full[key], atol=1e-12)
        np.testing.assert_allclose(test_trunc[key], test_full[key],
                                   atol=1e-12)


def test_empty_boxes():
    from monopsr_tpu.eval import predictions

    class _FakeDataset:
        calib_dir = None

    got = predictions.score_boxes(
        _FakeDataset(), '000000', IMG_SHAPE, np.zeros((0, 4)),
        np.zeros((0, 7)), np.zeros((0, 1)))
    assert got.shape == (0, 1)
    assert instance_utils.postprocess_cen_x_batch(
        np.zeros((0, 4)), np.zeros((0, 7)), CAM_P).shape == (0,)
