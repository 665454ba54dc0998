"""Smoke tests for auxiliary utilities: format checker, planes, stereo
calib, cluster utils, instance metrics, vis/demo helpers, analysis
scripts, demo CLIs."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, 'tests/datasets/Kitti/object')
TRAIN_DIR = os.path.join(FIXTURE, 'training')


class TestFormatChecker:

    def test_box_formats(self):
        from monopsr_tpu.core_utils import format_checker as fc
        fc.check_box_3d_format(np.zeros(7))
        fc.check_box_3d_format(np.zeros((5, 7)))
        fc.check_box_2d_format(np.zeros(4))
        fc.check_anchor_format(np.zeros((2, 6)))
        fc.check_box_8c_format(np.zeros((3, 8)))
        with pytest.raises(fc.FormatError):
            fc.check_box_3d_format(np.zeros(6))
        with pytest.raises(fc.FormatError):
            fc.check_box_2d_format(np.zeros((4, 7)))

    def test_obj_label(self):
        from monopsr_tpu.core_utils import format_checker as fc
        from monopsr_tpu.datasets.kitti.obj_utils import ObjectLabel
        obj = ObjectLabel()
        obj.t = (0.0, 0.0, 0.0)
        fc.check_obj_label_format(obj)
        with pytest.raises(fc.FormatError):
            fc.check_obj_label_format(object())


class TestPlanes:

    def test_dist_to_plane(self):
        from monopsr_tpu.geometry import planes
        plane = [0.0, -1.0, 0.0, 1.65]   # ground at y = 1.65, normal up
        points = np.array([[0, 1.65, 10], [0, 0.65, 10]])
        d = planes.dist_to_plane(plane, points)
        np.testing.assert_allclose(d, [0.0, 1.0], atol=1e-9)

    def test_projection_onto_plane(self):
        from monopsr_tpu.geometry import planes
        plane = [0.0, -1.0, 0.0, 1.65]
        pts = np.array([[3.0, 0.0, 7.0]])
        proj = planes.project_points_to_plane(plane, pts)
        np.testing.assert_allclose(proj[0], [3.0, 1.65, 7.0], atol=1e-9)


class TestStereoCalib:

    def test_krt_roundtrip(self):
        from monopsr_tpu.datasets.kitti import calib_utils
        calib = calib_utils.get_frame_calib(
            os.path.join(TRAIN_DIR, 'calib'), '000000')
        k, r, t = calib_utils.krt_from_p(calib.p2)
        # K upper triangular with positive focal lengths
        assert k[0, 0] > 0 and k[1, 1] > 0
        assert abs(k[1, 0]) < 1e-6
        # R orthonormal
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        stereo = calib_utils.get_stereo_calibration(calib.p2, calib.p3)
        assert stereo.baseline > 0.4  # KITTI baseline ~0.54m

    def test_depth_from_disparity_shapes(self):
        from monopsr_tpu.datasets.kitti import calib_utils
        calib = calib_utils.get_frame_calib(
            os.path.join(TRAIN_DIR, 'calib'), '000000')
        stereo = calib_utils.get_stereo_calibration(calib.p2, calib.p3)
        disp = np.full((10, 20), 64.0, np.float32)
        x, y, z = calib_utils.depth_from_disparity(disp, stereo)
        assert x.shape == (200,)
        assert np.all(z > 0)


class TestClusterUtils:

    def test_car_cluster(self):
        from monopsr_tpu.core_utils.label_cluster_utils import (
            LabelClusterUtils)
        from tests.test_dataset import make_dataset_config
        from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset

        dataset = KittiDataset(make_dataset_config(), 'train')
        util = LabelClusterUtils(dataset, cache_dir=None)
        import tempfile
        util.cache_dir = tempfile.mkdtemp()
        clusters, stds = util.get_clusters('Car', 1)
        # Fixture cars should be car-sized
        assert 3.0 < clusters[0][0] < 5.0    # length
        assert 1.4 < clusters[0][1] < 1.9    # width
        assert 1.2 < clusters[0][2] < 1.9    # height
        # Cached round trip
        clusters2, _ = util.get_clusters('Car', 1)
        np.testing.assert_allclose(clusters, clusters2)


class TestInstanceMetrics:

    def test_proj_error_zero_at_true_pose(self):
        from monopsr_tpu.core_utils import instance_metrics

        cam_p = np.array([[700.0, 0, 600.0, 0],
                          [0, 700.0, 180.0, 0],
                          [0, 0, 1.0, 0]])
        rng = np.random.RandomState(0)
        local = rng.uniform(-1, 1, (50, 3))
        local[:, 2] *= 0.3
        view_ang = 0.2
        xz_dist, cen_y = 20.0, 1.5

        exp_uv, valid = instance_metrics.proj_points(
            xz_dist, cen_y, view_ang, local, cam_p)
        err = instance_metrics.np_proj_error(
            (xz_dist, cen_y), view_ang, local, exp_uv, valid, cam_p)
        assert err < 1e-6

        err_off = instance_metrics.np_proj_error(
            (xz_dist + 2.0, cen_y), view_ang, local, exp_uv, valid,
            cam_p)
        assert err_off > err

    def test_scipy_refinement_recovers_depth(self):
        from monopsr_tpu.core_utils import instance_metrics

        cam_p = np.array([[700.0, 0, 600.0, 0],
                          [0, 700.0, 180.0, 0],
                          [0, 0, 1.0, 0]])
        rng = np.random.RandomState(1)
        local = rng.uniform(-1, 1, (60, 3))
        view_ang = -0.1
        true = (25.0, 1.2)
        exp_uv, valid = instance_metrics.proj_points(
            true[0], true[1], view_ang, local, cam_p)

        x_opt, fun = instance_metrics.scipy_refine_pose(
            local, exp_uv, valid, cam_p, x0=(20.0, 0.5),
            viewing_angle=view_ang)
        assert abs(x_opt[0] - true[0]) < 0.5
        assert abs(x_opt[1] - true[1]) < 0.2

    def test_rgb_proj_error_zero_at_true_pose(self):
        from monopsr_tpu.core_utils import instance_metrics

        cam_p = np.array([[700.0, 0, 600.0, 0],
                          [0, 700.0, 180.0, 0],
                          [0, 0, 1.0, 0]])
        # Spatially-varying image so a wrong pose samples different RGB
        h, w = 375, 1242
        image = np.zeros((h, w, 3), np.uint8)
        image[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        image[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        image[..., 2] = 128

        roi = 8
        rng = np.random.RandomState(3)
        local = rng.uniform(-0.8, 0.8, (roi * roi, 3))
        view_ang, xz_dist, cen_y = 0.1, 18.0, 1.4

        # The instance's RGB map is what the image shows at the true pose
        uv, _ = instance_metrics.proj_points(
            xz_dist, cen_y, view_ang, local, cam_p)
        cols = np.round(uv[0]).astype(int)
        rows = np.round(uv[1]).astype(int)
        inst_rgb_map = image[rows, cols].reshape(roi, roi, 3)
        valid_mask_map = np.ones((roi, roi), bool)

        err_true = instance_metrics.np_proj_err_rgb(
            (xz_dist, cen_y), view_ang, local, inst_rgb_map, image,
            valid_mask_map, cam_p)
        assert err_true < 1e-9

        err_off = instance_metrics.np_proj_err_rgb(
            (xz_dist + 5.0, cen_y + 0.5), view_ang, local, inst_rgb_map,
            image, valid_mask_map, cam_p)
        assert err_off > 100 * max(err_true, 1e-6)

        # 3-parameter form optimizes the viewing angle too
        err3 = instance_metrics.np_proj_err_rgb(
            (xz_dist, cen_y, view_ang), 0.0, local, inst_rgb_map, image,
            valid_mask_map, cam_p)
        assert err3 < 1e-9


class TestDistanceMetrics:

    def test_chamfer_matches_bruteforce(self):
        from monopsr_tpu.core_utils import distance_metrics
        rng = np.random.RandomState(2)
        a = rng.uniform(-1, 1, (30, 3))
        b = rng.uniform(-1, 1, (40, 3))
        got = distance_metrics.calc_chamfer_dist(a, b)
        d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        want = d.min(1).sum() + d.min(0).sum()
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestDemoUtils:

    def test_match_predictions_to_gt(self):
        from monopsr_tpu.utils import demo_utils
        gt = np.array([[0, 1.5, 20, 4, 1.6, 1.5, 0.0],
                       [5, 1.5, 30, 4, 1.6, 1.5, 0.5]])
        pred = gt.copy()
        pred[0, 0] += 0.1
        idx, iou = demo_utils.match_predictions_to_gt(pred, gt)
        assert list(idx) == [0, 1]
        assert iou[0] > 0.8 and iou[1] > 0.99


class TestDemosAndScripts:

    def test_view_kitti_sample_2d(self, tmp_path):
        out = str(tmp_path / 'boxes.png')
        subprocess.run(
            [sys.executable, os.path.join(REPO, 'demos',
                                          'view_kitti_sample_2d.py'),
             '--data_split_dir', TRAIN_DIR, '--sample_name', '000003',
             '--out', out], check=True)
        assert os.path.getsize(out) > 1000

    def test_view_instance_masks(self, tmp_path):
        out = str(tmp_path / 'masks.png')
        subprocess.run(
            [sys.executable, os.path.join(REPO, 'demos',
                                          'view_instance_masks.py'),
             '--data_split_dir', TRAIN_DIR, '--sample_name', '000003',
             '--out', out], check=True)
        assert os.path.getsize(out) > 1000

    def test_plot_ap_parses_results(self, tmp_path):
        results = tmp_path / 'results.txt'
        results.write_text(
            'step 2000\ncar_detection AP: 50.0 40.0 30.0\n'
            'car_detection_3D AP: 10.0 8.0 6.0\n'
            'step 4000\ncar_detection AP: 60.0 45.0 35.0\n'
            'car_detection_3D AP: 12.0 9.0 7.0\n')
        sys.path.insert(0, os.path.join(REPO, 'scripts/offline_eval'))
        try:
            from plot_ap import parse_results_file
        finally:
            sys.path.pop(0)
        curves = parse_results_file(str(results))
        assert curves['car_detection_3D'] == [
            (2000, 10.0, 8.0, 6.0), (4000, 12.0, 9.0, 7.0)]
