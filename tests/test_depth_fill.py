"""XLA depth-completion parity vs the host cv2 ip_basic pipeline."""

import os

import cv2
import numpy as np
import pytest

from monopsr_tpu.datasets.kitti import calib_utils, depth_map_utils, obj_utils
from monopsr_tpu.ops import depth_fill
from monopsr_tpu.tools import ip_basic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLIT_DIR = os.path.join(REPO, 'tests/datasets/Kitti/object/training')

RNG = np.random.RandomState(0)


def sparse_depth_map(h=96, w=256, density=0.06):
    """Synthetic sparse depths covering all three range bins."""
    depth = np.zeros((h, w), np.float32)
    num = int(h * w * density)
    ys = RNG.randint(0, h, num)
    xs = RNG.randint(0, w, num)
    depth[ys, xs] = RNG.uniform(2.0, 60.0, num).astype(np.float32)
    return depth


def fixture_sparse_map():
    sample_name = '000002'
    image = obj_utils.get_image(
        sample_name, os.path.join(SPLIT_DIR, 'image_2'))
    calib = calib_utils.get_frame_calib(
        os.path.join(SPLIT_DIR, 'calib'), sample_name)
    pc = obj_utils.get_lidar_point_cloud_for_cam(
        sample_name, calib, os.path.join(SPLIT_DIR, 'velodyne'),
        image.shape[0:2])
    return depth_map_utils.project_depths(
        pc, calib.p2, image.shape[0:2]).astype(np.float32)


def test_dilate_cross_matches_cv2():
    x = sparse_depth_map()
    for k, kernel in ((3, ip_basic.CROSS_KERNEL_3),
                      (5, ip_basic.CROSS_KERNEL_5),
                      (7, ip_basic.CROSS_KERNEL_7)):
        want = cv2.dilate(x, kernel)
        got = np.asarray(depth_fill.dilate_cross(x, k))
        np.testing.assert_allclose(got, want, atol=0)


def test_dilate_and_close_full_match_cv2():
    x = sparse_depth_map()
    want = cv2.dilate(x, ip_basic.FULL_KERNEL_5)
    got = np.asarray(depth_fill.dilate_full(x, 5))
    np.testing.assert_allclose(got, want, atol=0)

    want = cv2.morphologyEx(x, cv2.MORPH_CLOSE, ip_basic.FULL_KERNEL_5)
    got = np.asarray(depth_fill.close_full(x, 5))
    np.testing.assert_allclose(got, want, atol=0)


def test_median_matches_cv2():
    x = sparse_depth_map()
    want = cv2.medianBlur(x, 5)
    got = np.asarray(depth_fill.median_5(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilateral_close_to_cv2():
    x = sparse_depth_map() / 10.0 + 1.0  # smooth-ish values
    want = cv2.bilateralFilter(x, 5, 0.5, 2.0)
    got = np.asarray(depth_fill.bilateral_5(x))
    # bilateral_5 reproduces cv2's 4096-bin interpolated exp LUT; the
    # residual is float32 accumulation-order noise only.
    assert np.max(np.abs(got - want)) < 2e-4


def test_bilateral_lut_exact_on_depth_range():
    x = sparse_depth_map()  # raw 0..60 m values like the pipeline sees
    want = cv2.bilateralFilter(x, 5, 0.5, 2.0)
    got = np.asarray(depth_fill.bilateral_5(x))
    assert np.max(np.abs(got - want)) < 5e-4


@pytest.mark.parametrize('blur_type', ['bilateral', 'gaussian'])
@pytest.mark.parametrize('extrapolate', [False, True])
def test_pipeline_matches_host_synthetic(blur_type, extrapolate):
    sparse = sparse_depth_map()
    want, _ = ip_basic.fill_in_multiscale(
        sparse, extrapolate=extrapolate, blur_type=blur_type)
    got = np.asarray(depth_fill.fill_in_multiscale(
        sparse, extrapolate=extrapolate, blur_type=blur_type))
    _assert_pipeline_parity(got, want)


def _assert_pipeline_parity(got, want):
    """Every stage is exact except the final blur's float32
    accumulation order (the LUT color weights now match cv2's 4096-bin
    interpolation; see bilateral_5 — this closed the former ~5e-3-mean
    gap). The NAMED, BOUNDED residual: summation-order float noise
    < 1e-3 m (a quarter of one uint16 depth LSB, 1/256 m). A stored
    uint16 value can therefore differ only when cv2's float sits within
    that noise of a rounding boundary — by at most 1 LSB, and only at
    a vanishing fraction of pixels."""
    err = np.abs(got - want)
    assert np.max(err) < 1e-3, np.max(err)
    u16_got = np.round(got * 256.0).astype(np.int64)
    u16_want = np.round(want * 256.0).astype(np.int64)
    flips = u16_got != u16_want
    assert np.max(np.abs(u16_got - u16_want)) <= 1, (
        'uint16 depth differs by >1 LSB')
    # ~0.2% measured: mean float noise ~7e-6 m against the 1/256 m
    # quantum predicts ~2*256*7e-6 = 0.36% boundary flips — the rate
    # is explained by the noise bound, not by algorithmic divergence.
    assert np.mean(flips) < 5e-3, (
        'uint16 rounding flips at %d px (%.4f%%)' %
        (int(flips.sum()), 100.0 * np.mean(flips)))
    # flips must coincide with near-boundary values, not real error
    if flips.any():
        frac = np.abs(want[flips] * 256.0 -
                      np.round(want[flips] * 256.0))
        assert np.all(frac > 0.5 - 0.26), frac.min()


def test_pipeline_matches_host_fixture():
    sparse = fixture_sparse_map()
    want, _ = ip_basic.fill_in_multiscale(sparse)
    got = np.asarray(depth_fill.fill_in_multiscale(sparse))
    _assert_pipeline_parity(got, want)


def test_batch_matches_single():
    maps = np.stack([sparse_depth_map() for _ in range(3)])
    got = np.asarray(depth_fill.fill_in_batch(maps))
    for i in range(3):
        single = np.asarray(depth_fill.fill_in_multiscale(maps[i]))
        np.testing.assert_allclose(got[i], single, atol=1e-6)
