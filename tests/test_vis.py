"""Smoke tests for the visualization helpers (Agg backend)."""

import os

import matplotlib

matplotlib.use('Agg')

import numpy as np

from monopsr_tpu.datasets.kitti import calib_utils, obj_utils
from monopsr_tpu.visualization import vis_utils

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLIT = os.path.join(REPO, 'tests/datasets/Kitti/object/training')


def load_sample():
    labels = obj_utils.read_labels(
        os.path.join(SPLIT, 'label_2'), '000002')
    calib = calib_utils.get_frame_calib(
        os.path.join(SPLIT, 'calib'), '000002')
    image = obj_utils.get_image(
        '000002', os.path.join(SPLIT, 'image_2'))
    return labels, calib, image


def test_draw_boxes_and_grid(tmp_path):
    labels, calib, image = load_sample()
    fig, axes = vis_utils.plots_from_image(image, 2, 1)
    drew = 0
    for obj in labels:
        if obj.type == 'DontCare':
            continue
        vis_utils.draw_obj_as_box_3d(
            axes[0], obj, calib.p2, show_orientation=True,
            double_line=True, colour_table=['#00cc00', 'y', 'r', 'w'])
        vis_utils.draw_box_2d(axes[1], obj)
        drew += 1
    assert drew > 0
    out = tmp_path / 'boxes.png'
    vis_utils.save_fig(fig, str(out))
    assert out.stat().st_size > 1000


def test_point_colours_match_pixels():
    _, calib, image = load_sample()
    pts = np.array([[0.0, 1.0, 10.0], [2.0, 1.2, 20.0]])
    cols = vis_utils.get_point_colours(pts, calib.p2, image)
    assert cols.shape == (2, 3)
    # Re-derive one pixel by hand
    from monopsr_tpu.geometry import projection
    uv = np.round(projection.np_project_pc_to_image(
        pts.T, calib.p2)).astype(int)
    np.testing.assert_array_equal(cols[0], image[uv[1][0], uv[0][0]])


def test_instance_mask_overlay():
    _, _, image = load_sample()
    inst = np.full(image.shape[:2], 255, np.int32)
    inst[100:200, 300:500] = 0
    blend = vis_utils.draw_instance_masks(image, inst)
    assert blend.shape == image.shape
    assert not np.array_equal(blend[150, 400], image[150, 400])
    np.testing.assert_array_equal(blend[0, 0], image[0, 0])
