"""Horizontal-flip helper tests (ref: kitti_aug.py:12-122).

np parity style: each helper checked on hand-made values, plus the
projection invariant u_flipped = W - u tying image, point, and calib
flips together.
"""

import numpy as np

from monopsr_tpu.datasets.kitti import kitti_aug, obj_utils
from monopsr_tpu.geometry import orientation, projection


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


def test_flip_obj_labels_projection_consistent():
    """Flipped 3D centroids project through the flipped P2 onto the
    mirrored 2D box: u' = W - u."""
    from monopsr_tpu.datasets.kitti import obj_utils
    cam_p = np.array([[721.54, 0.0, 609.56, 44.86],
                      [0.0, 721.54, 172.85, 0.22],
                      [0.0, 0.0, 1.0, 0.0]])
    image_shape = (375, 1242)
    obj = obj_utils.ObjectLabel()
    obj.type = 'Car'
    obj.x1, obj.y1, obj.x2, obj.y2 = 500.0, 160.0, 610.0, 230.0
    obj.h, obj.w, obj.l = 1.5, 1.6, 3.9
    obj.t = (2.0, 1.6, 20.0)
    obj.ry = 0.4
    obj.alpha = 0.3

    flipped = kitti_aug.flip_obj_labels([obj], image_shape)[0]
    assert flipped.x1 == image_shape[1] - obj.x2
    assert flipped.x2 == image_shape[1] - obj.x1
    assert flipped.t == (-2.0, 1.6, 20.0)
    np.testing.assert_allclose(flipped.ry, np.pi - 0.4)
    # alpha consistent with the KITTI definition on the flipped pose
    np.testing.assert_allclose(
        flipped.alpha,
        orientation.np_wrap_to_pi(
            flipped.ry - np.arctan2(flipped.t[0], flipped.t[2])))

    # centroid projection mirrors
    flipped_p2 = kitti_aug.flip_stereo_calib_p2(cam_p, image_shape)
    uv = projection.np_project_pc_to_image(
        np.asarray(obj.t).reshape(3, 1), cam_p)
    uv_f = projection.np_project_pc_to_image(
        np.asarray(flipped.t).reshape(3, 1), flipped_p2)
    np.testing.assert_allclose(uv_f[0], image_shape[1] - uv[0], rtol=1e-6)


def test_dataset_flip_aug_mirrors_sample(tmp_path):
    """use_flip_aug: a flipped sample's arrays are the mirror of the
    unflipped sample's (first num_objs slots; oversampled tail slots
    draw different rng)."""
    import os
    import __graft_entry__ as graft
    from monopsr_tpu import constants as C
    from monopsr_tpu.datasets.kitti import kitti_dataset as kd
    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset

    FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'datasets', 'Kitti',
        'object')
    config, _ = graft._flagship_config()
    ds_cfg = config.dataset_config
    ds_cfg.dataset_dir = FIXTURE
    ds_cfg.mscnn_dir = os.path.join(FIXTURE, 'mscnn')

    ds_plain = KittiDataset(ds_cfg, 'train')
    # First sample with actual Car labels
    idx = next(i for i in range(ds_plain.num_samples)
               if ds_plain.get_sample_dict([i])[0] is not None)

    # Find a seed whose first rng draw triggers the flip
    seed = None
    for s in range(40):
        ds_cfg.seed = s
        probe = KittiDataset(ds_cfg, 'train')
        if probe._sample_rng(probe.get_sample_names()[idx]).rand() < 0.5:
            seed = s
            break
    assert seed is not None

    ds_cfg.seed = seed
    plain = KittiDataset(ds_cfg, 'train').get_sample_dict([idx])[0]
    ds_cfg.aug_config.use_flip_aug = True
    flipped = KittiDataset(ds_cfg, 'train').get_sample_dict([idx])[0]
    ds_cfg.aug_config.use_flip_aug = False
    ds_cfg.seed = None

    assert plain is not None and flipped is not None
    img_w = plain[C.SAMPLE_IMAGE_INPUT].shape[1]
    np.testing.assert_array_equal(plain[C.SAMPLE_IMAGE_INPUT][:, ::-1],
                                  flipped[C.SAMPLE_IMAGE_INPUT])

    n = 1  # only slot 0 is guaranteed un-jittered (tail slots
    # are oversampled copies whose jitter rng differs between runs)
    b_p = plain[C.SAMPLE_LABEL_BOXES_2D][:n]
    b_f = flipped[C.SAMPLE_LABEL_BOXES_2D][:n]
    np.testing.assert_allclose(b_f[:, 1], img_w - b_p[:, 3], rtol=1e-6)
    np.testing.assert_allclose(b_f[:, 3], img_w - b_p[:, 1], rtol=1e-6)
    np.testing.assert_allclose(b_f[:, 0], b_p[:, 0])

    b3_p = plain[C.SAMPLE_LABEL_BOXES_3D][:n]
    b3_f = flipped[C.SAMPLE_LABEL_BOXES_3D][:n]
    np.testing.assert_allclose(b3_f[:, 0], -b3_p[:, 0], rtol=1e-6)
    np.testing.assert_allclose(b3_f[:, 2], b3_p[:, 2], rtol=1e-6)

    # Viewing angles negate exactly (u and cu both mirror)
    np.testing.assert_allclose(
        flipped[C.SAMPLE_VIEWING_ANGLES_2D][:n],
        -plain[C.SAMPLE_VIEWING_ANGLES_2D][:n], rtol=1e-5, atol=1e-6)

    # Depth map mirrors within the original width (padding stays right)
    h, w = 375, img_w if img_w <= kd.DEPTH_PAD_SHAPE[1] else None
    d_p = plain[C.SAMPLE_DEPTH_MAP]
    d_f = flipped[C.SAMPLE_DEPTH_MAP]
    orig_w = np.max(np.nonzero(d_p.sum(0))[0]) + 1 if d_p.any() else 0
    if orig_w:
        # compare a strip inside the original content
        np.testing.assert_allclose(
            d_f[:200, :orig_w][:, ::-1][:, :100],
            d_p[:200, :orig_w][:, :100], rtol=1e-6)
