"""np-vs-jit parity tests for the geometry core.

Test strategy mirrors the reference's dual np/tf parity checks
(ref: src/monopsr/datasets/kitti/instance_utils_test.py:11-74,
src/monopsr/core/orientation_encoder_test.py,
src/monopsr/core/transform_utils_test.py).
"""

import numpy as np
import pytest

from monopsr_tpu.geometry import (boxes, instance, orientation, projection,
                                  transforms)


RNG = np.random.RandomState(42)


class TestOrientation:

    @pytest.mark.parametrize('num_bins', [8, 12])
    def test_encode_decode_roundtrip(self, num_bins):
        angles = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 100)
        for ang in angles:
            best_bin, residuals, one_hot = (
                orientation.np_orientation_to_angle_bin(ang, num_bins, 0.0))
            decoded = orientation.np_angle_bin_to_orientation(
                best_bin, residuals[best_bin], num_bins)
            assert abs(orientation.np_wrap_to_pi(decoded - ang)) < 1e-9
            assert one_hot[best_bin] == 1.0
            assert one_hot.sum() == 1.0

    def test_vectorized_matches_scalar(self):
        angles = RNG.uniform(-np.pi, np.pi, 50)
        bins_v, regs_v, hot_v = orientation.np_orientation_to_angle_bin(
            angles, 12, 0.0)
        for i, ang in enumerate(angles):
            b, r, h = orientation.np_orientation_to_angle_bin(ang, 12, 0.0)
            assert bins_v[i] == b
            np.testing.assert_allclose(regs_v[i], r)
            np.testing.assert_allclose(hot_v[i], h)

    def test_residuals_wrapped(self):
        _, residuals, _ = orientation.np_orientation_to_angle_bin(
            2.5, 12, 0.0)
        assert np.all(np.abs(residuals) <= np.pi)

    def test_jax_decode_matches_np(self):
        bins = RNG.randint(0, 12, 20)
        regs = RNG.uniform(-0.3, 0.3, 20)
        got = np.asarray(
            orientation.angle_bin_to_orientation(bins, regs, 12))
        want = orientation.np_angle_bin_to_orientation(bins, regs, 12)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTransforms:

    def test_tr_mat_value(self):
        mat = transforms.np_get_tr_mat(np.pi / 2, (1.0, 2.0, 3.0))
        # Rotation of +pi/2 about y: x' = z, z' = -x, applied after
        # translation.
        point = np.array([[1.0, 1.0, 1.0]])
        out = transforms.apply_tr_mat_to_points(mat, point)[0]
        np.testing.assert_allclose(out, [4.0, 3.0, -2.0], atol=1e-12)

    def test_batched_matches_np(self):
        rys = RNG.uniform(-np.pi, np.pi, 8).astype(np.float32)
        ts = RNG.uniform(-5, 5, (8, 3)).astype(np.float32)
        tr_b, rot_b, t_b = transforms.get_tr_mat_batch(rys, ts)
        for i in range(8):
            np.testing.assert_allclose(
                np.asarray(tr_b)[i], transforms.np_get_tr_mat(rys[i], ts[i]),
                atol=1e-5)

    def test_rotate_y_batch_matches_matrix(self):
        rys = RNG.uniform(-np.pi, np.pi, 4)
        points = RNG.uniform(-10, 10, (4, 17, 3))
        got = np.asarray(transforms.rotate_y_batch(points, rys))
        for i in range(4):
            rot = transforms.np_get_tr_mat(rys[i], (0, 0, 0))
            want = transforms.apply_tr_mat_to_points(rot, points[i])
            np.testing.assert_allclose(got[i], want, atol=1e-5)

    def test_invert(self):
        mat = transforms.np_get_tr_mat(0.7, (1.0, -2.0, 3.0))
        inv = transforms.invert_tf(mat)
        np.testing.assert_allclose(mat @ inv, np.eye(4), atol=1e-6)


class TestProjection:

    def _cam_p(self):
        return np.array([
            [721.5377, 0.0, 609.5593, 44.85728],
            [0.0, 721.5377, 172.854, 0.2163791],
            [0.0, 0.0, 1.0, 0.002745884]], np.float32)

    def test_project_pc_batch_matches_np(self):
        cam_p = self._cam_p()
        pc = RNG.uniform(1, 40, (5, 3, 11)).astype(np.float32)
        got = np.asarray(projection.project_pc_to_image_batch(pc, cam_p))
        for i in range(5):
            want = projection.np_project_pc_to_image(pc[i], cam_p)
            np.testing.assert_allclose(got[i], want, rtol=1e-4)

    def test_depth_patch_to_pc_map_batch_matches_np(self):
        cam_p = self._cam_p()
        roi = (8, 8)
        depth = RNG.uniform(5, 40, (3, 8, 8)).astype(np.float32)
        boxes_2d = np.asarray(
            [[100.2, 200.7, 180.9, 280.4],
             [50.0, 60.0, 90.0, 120.0],
             [10.5, 600.1, 99.9, 700.3]], np.float32)
        got = np.asarray(projection.depth_patch_to_pc_map_batch(
            depth, boxes_2d, cam_p, roi))
        for i in range(3):
            want = projection.np_depth_patch_to_pc_map(
                depth[i], boxes_2d[i], cam_p, roi, round_box_2d=False,
                use_pixel_centres=True, use_corr_factors=False)
            np.testing.assert_allclose(
                got[i], want.transpose(1, 2, 0), rtol=1e-4, atol=1e-4)

    def test_exp_proj_uv_map_batch_matches_np(self):
        roi = (48, 48)
        boxes_2d = np.asarray(
            [[100.2, 200.7, 180.9, 280.4],
             [50.0, 60.0, 90.0, 120.0]], np.float32)
        got = np.asarray(projection.get_exp_proj_uv_map_batch(
            boxes_2d, roi, use_pixel_centres=True))
        for i in range(2):
            want = projection.np_get_exp_proj_uv_map(
                boxes_2d[i], roi, use_pixel_centres=True)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_depth_point_cloud_projects_back(self):
        cam_p = self._cam_p()
        depth = RNG.uniform(5, 40, (30, 40)).astype(np.float32)
        pc = projection.np_get_depth_point_cloud(
            depth, cam_p, in_cam0_frame=False)
        uv = projection.np_project_pc_to_image(pc, cam_p)
        # Without the cam0 x-offset shift, projection through the K-part
        # of cam_p should recover the pixel grid approximately.
        xx, yy = np.meshgrid(np.arange(40), np.arange(30))
        k_only = cam_p.copy()
        k_only[:, 3] = 0
        uv_k = projection.np_project_pc_to_image(pc, k_only)
        np.testing.assert_allclose(
            uv_k[0].reshape(30, 40), xx, atol=1e-3)
        np.testing.assert_allclose(
            uv_k[1].reshape(30, 40), yy, atol=1e-3)


class TestBoxes:

    def test_corners_batch_matches_np(self):
        boxes_3d = np.hstack([
            RNG.uniform(-10, 10, (6, 3)),
            RNG.uniform(1, 4, (6, 3)),
            RNG.uniform(-np.pi, np.pi, (6, 1))]).astype(np.float32)
        got = np.asarray(boxes.compute_box_3d_corners_batch(boxes_3d))
        for i in range(6):
            want = boxes.np_compute_box_3d_corners(boxes_3d[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_points_in_box(self):
        box_3d = np.array([0, 0, 10, 4, 2, 1.5, 0.0])
        inside = np.array([[0, -0.5, 10], [1.9, -0.1, 10.9]])
        outside = np.array([[0, -2.0, 10], [3.0, -0.5, 10], [0, -0.5, 20]])
        _, mask_in = boxes.points_in_box_3d(box_3d, inside)
        _, mask_out = boxes.points_in_box_3d(box_3d, outside)
        assert mask_in.all()
        assert not mask_out.any()

    def test_project_to_image_space_inside(self):
        cam_p = np.array([
            [700.0, 0.0, 600.0, 0.0],
            [0.0, 700.0, 180.0, 0.0],
            [0.0, 0.0, 1.0, 0.0]])
        box_3d = np.array([0.0, 1.5, 20.0, 4.0, 1.6, 1.5, 0.0])
        img_box = boxes.project_to_image_space(
            box_3d, cam_p, truncate=True, image_size=(1242, 375))
        assert img_box is not None
        x1, y1, x2, y2 = img_box
        assert 0 <= x1 < x2 <= 1242
        assert 0 <= y1 < y2 <= 375


class TestInstanceCrop:

    def _cam_p(self):
        return np.array([
            [721.5377, 0.0, 609.5593, 44.85728],
            [0.0, 721.5377, 172.854, 0.2163791],
            [0.0, 0.0, 1.0, 0.002745884]], np.float32)

    def _make_scene(self, n_boxes=4, h=96, w=160):
        depth = np.zeros((h, w), np.float32)
        inst_img = np.full((h, w), 255, np.int32)
        boxes_2d = []
        boxes_3d = []
        for i in range(n_boxes):
            y1 = RNG.randint(0, h - 30)
            x1 = RNG.randint(0, w - 30)
            y2 = y1 + RNG.randint(12, 28)
            x2 = x1 + RNG.randint(12, 28)
            depth[y1:y2, x1:x2] = RNG.uniform(8, 35)
            inst_img[y1:y2, x1:x2] = i
            boxes_2d.append([y1 + 0.3, x1 + 0.2, y2 - 0.4, x2 - 0.1])
            boxes_3d.append(
                [RNG.uniform(-5, 5), RNG.uniform(0, 2), RNG.uniform(10, 30),
                 4.0, 1.6, 1.5, 0.3])
        return (depth, inst_img, np.asarray(boxes_2d, np.float32),
                np.asarray(boxes_3d, np.float32))

    @pytest.mark.parametrize('view_norm,rotate_view', [
        (True, True), (True, False), (False, False)])
    def test_jit_matches_np(self, view_norm, rotate_view):
        depth, inst_img, boxes_2d, boxes_3d = self._make_scene()
        cam_p = self._cam_p()
        roi = (48, 48)
        n = len(boxes_2d)
        view_angs = RNG.uniform(-0.5, 0.5, n).astype(np.float32)
        inst_indices = np.arange(n, dtype=np.int32)

        got_xyz, got_valid = instance.instance_xyz_crop_from_depth_map(
            depth, inst_img, inst_indices, boxes_2d, boxes_3d,
            view_angs, cam_p, roi, view_norm=view_norm,
            centroid_type='middle', rotate_view=rotate_view)

        masks = np.asarray([inst_img == i for i in range(n)])
        from monopsr_tpu.datasets.kitti import instance_utils
        want_xyz, want_valid = (
            instance_utils.np_instance_xyz_crop_from_depth_map(
                boxes_2d, boxes_3d, masks, depth, roi, cam_p, view_angs,
                view_norm=view_norm, centroid_type='middle',
                rotate_view=rotate_view))

        np.testing.assert_allclose(
            np.asarray(got_valid), want_valid, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got_xyz), want_xyz, rtol=1e-3, atol=1e-3)

    def test_local_to_global_roundtrip(self):
        depth, inst_img, boxes_2d, boxes_3d = self._make_scene()
        cam_p = self._cam_p()
        roi = (24, 24)
        n = len(boxes_2d)
        view_angs = RNG.uniform(-0.5, 0.5, n).astype(np.float32)
        inst_indices = np.arange(n, dtype=np.int32)

        local, valid = instance.instance_xyz_crop_from_depth_map(
            depth, inst_img, inst_indices, boxes_2d, boxes_3d,
            view_angs, cam_p, roi, view_norm=True,
            centroid_type='middle', rotate_view=True)
        glob, _ = instance.instance_xyz_crop_from_depth_map(
            depth, inst_img, inst_indices, boxes_2d, boxes_3d,
            view_angs, cam_p, roi, view_norm=False,
            centroid_type='middle', rotate_view=True)

        x_offset = -cam_p[0, 3] / cam_p[0, 0]
        cens = boxes_3d[:, 0:3] - [x_offset, 0, 0]
        cens[:, 1] -= boxes_3d[:, 5] / 2.0

        reconstructed = instance.inst_xyz_map_local_to_global(
            local, view_angs, cens)
        # Only valid pixels carry geometry
        np.testing.assert_allclose(
            np.asarray(reconstructed) * np.asarray(valid),
            np.asarray(glob) * np.asarray(valid), rtol=1e-3, atol=1e-3)

    def test_proj_err_of_gt_is_small(self):
        """GT global maps should project close to the expected ROI grid."""
        depth, inst_img, boxes_2d, boxes_3d = self._make_scene()
        cam_p = self._cam_p()
        # Use a simple cam matrix with no x-offset for this check
        cam_p[:, 3] = 0.0
        roi = (48, 48)
        n = len(boxes_2d)
        view_angs = np.zeros(n, np.float32)
        inst_indices = np.arange(n, dtype=np.int32)

        glob, valid = instance.instance_xyz_crop_from_depth_map(
            depth, inst_img, inst_indices, boxes_2d, boxes_3d,
            view_angs, cam_p, roi, view_norm=False)

        err = np.asarray(instance.proj_err_maps_norm(
            glob, boxes_2d, np.asarray(valid), cam_p, roi))
        # Constant-depth instances project exactly onto pixel centres,
        # which sit within one ROI pixel of the expected grid.
        assert np.all(np.abs(err) < 0.1)


class TestVectorizedViewingAngles:
    """Vectorized viewing angles must equal the per-box scalar versions
    (ref: obj_utils.py:913-985)."""

    def _cam_p(self):
        return np.array([[721.54, 0.0, 609.56, 44.86],
                         [0.0, 721.54, 172.85, 0.22],
                         [0.0, 0.0, 1.0, 0.003]])

    def test_box_2d_matches_scalar(self):
        from monopsr_tpu.datasets.kitti import obj_utils
        rng = np.random.RandomState(3)
        boxes = rng.uniform(0, 1200, (16, 4))
        cam_p = self._cam_p()
        vec = obj_utils.get_viewing_angles_box_2d(boxes, cam_p)
        ref = [obj_utils.get_viewing_angle_box_2d(b, cam_p) for b in boxes]
        np.testing.assert_allclose(vec, ref, rtol=0, atol=0)

    @pytest.mark.parametrize('version', ['cam_0', 'x_offset', 'projection'])
    def test_box_3d_matches_scalar(self, version):
        from monopsr_tpu.datasets.kitti import obj_utils
        rng = np.random.RandomState(4)
        boxes = np.column_stack([
            rng.uniform(-20, 20, 8), rng.uniform(0, 3, 8),
            rng.uniform(5, 60, 8), rng.uniform(3, 5, 8),
            rng.uniform(1, 2, 8), rng.uniform(1, 2, 8),
            rng.uniform(-np.pi, np.pi, 8)])
        cam_p = self._cam_p()
        vec = obj_utils.get_viewing_angles_box_3d(boxes, cam_p, version)
        ref = [obj_utils.get_viewing_angle_box_3d(b, cam_p, version)
               for b in boxes]
        np.testing.assert_allclose(vec, np.asarray(ref).ravel(),
                                   rtol=1e-12, atol=0)
