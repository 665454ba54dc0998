"""Horizontal-flip helper tests (ref: kitti_aug.py:12-122).

np parity style: each helper checked on hand-made values, plus the
projection invariant u_flipped = W - u tying image, point, and calib
flips together.
"""

import numpy as np

from monopsr_tpu.datasets.kitti import kitti_aug, obj_utils
from monopsr_tpu.geometry import projection


def test_flip_image():
    img = np.arange(24).reshape(2, 4, 3)
    out = kitti_aug.flip_image(img)
    np.testing.assert_array_equal(out[:, 0], img[:, 3])
    np.testing.assert_array_equal(out[:, 3], img[:, 0])


def test_flip_points_and_point_cloud():
    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 5.0, 6.0]])
    out = kitti_aug.flip_points(pts)
    np.testing.assert_allclose(out[:, 0], [-1.0, 4.0])
    np.testing.assert_allclose(out[:, 1:], pts[:, 1:])

    pc = pts.T
    out_pc = kitti_aug.flip_point_cloud(pc)
    np.testing.assert_allclose(out_pc, out.T)


def test_flip_boxes_3d_ry_wrap():
    boxes = np.array([
        [1.0, 1.5, 10.0, 4.0, 1.6, 1.5, 0.3],
        [-2.0, 1.5, 20.0, 4.0, 1.6, 1.5, -2.0],
        [0.5, 1.5, 30.0, 4.0, 1.6, 1.5, 0.0],
    ])
    out = kitti_aug.flip_boxes_3d(boxes)
    np.testing.assert_allclose(out[:, 0], [-1.0, 2.0, -0.5])
    np.testing.assert_allclose(out[:, 6],
                               [np.pi - 0.3, -np.pi + 2.0, np.pi])
    np.testing.assert_allclose(out[:, 1:6], boxes[:, 1:6])
    # Results stay within [-pi, pi]
    assert np.all(np.abs(out[:, 6]) <= np.pi + 1e-9)

    out_no_ry = kitti_aug.flip_boxes_3d(boxes, flip_ry=False)
    np.testing.assert_allclose(out_no_ry[:, 6], boxes[:, 6])


def test_flip_label_in_3d_only():
    label = obj_utils.ObjectLabel()
    label.type = 'Car'
    label.t = (3.0, 1.5, 12.0)
    label.ry = -0.5
    label.x1, label.y1, label.x2, label.y2 = 10.0, 20.0, 50.0, 60.0
    flipped = kitti_aug.flip_label_in_3d_only(label)
    assert flipped.t == (-3.0, 1.5, 12.0)
    np.testing.assert_allclose(flipped.ry, -np.pi + 0.5)
    # 2D box untouched by design
    assert (flipped.x1, flipped.x2) == (10.0, 50.0)


def test_flip_ground_plane():
    plane = np.array([0.02, -1.0, 0.01, 1.65])
    out = kitti_aug.flip_ground_plane(plane)
    np.testing.assert_allclose(out, [-0.02, -1.0, 0.01, 1.65])


def test_flip_calib_projection_invariant():
    """Projecting the x-mirrored point through the flipped P2 lands at
    u' = W - u (the flipped image's mirrored column)."""
    # Zero t3: the flip formula mirrors cu/t1 only, so the invariant is
    # exact when the projective row carries no translation (the
    # reference's formula shares this assumption).
    cam_p = np.array([[721.54, 0.0, 609.56, 44.86],
                      [0.0, 721.54, 172.85, 0.22],
                      [0.0, 0.0, 1.0, 0.0]])
    image_shape = (375, 1242)
    pts = np.array([[2.0, 1.1, 15.0], [-5.0, 0.3, 30.0], [0.0, 2.0, 8.0]])

    uv = projection.np_project_pc_to_image(pts.T, cam_p)
    flipped_p2 = kitti_aug.flip_stereo_calib_p2(cam_p, image_shape)
    uv_flipped = projection.np_project_pc_to_image(
        kitti_aug.flip_points(pts).T, flipped_p2)

    np.testing.assert_allclose(uv_flipped[0], image_shape[1] - uv[0],
                               rtol=1e-6)
    np.testing.assert_allclose(uv_flipped[1], uv[1], rtol=1e-6)
