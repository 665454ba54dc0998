"""Projection-error objectives for offline pose refinement.

Behavioral twin of the reference instance metrics
(ref: src/monopsr/core/instances/instance_metrics.py:13-420): objective
functions over (xz_dist, cen_y[, view_ang]) that project a local
instance point cloud through the camera and compare against the
expected ROI pixel grid (plus RGB-similarity and mask-IoU variants),
suitable for scipy.optimize minimizers.
"""

import numpy as np

from monopsr_tpu.geometry import projection


def np_proj_error(x, viewing_angle, inst_points_local, exp_proj_uv,
                  valid_mask, cam_p, rotate_view=True):
    """Mean |projected - expected| pixel error for pose parameters.

    Args:
        x: (xz_dist, cen_y) or (xz_dist, cen_y, view_ang) parameters.
        viewing_angle: fixed viewing angle (ignored if len(x) == 3).
        inst_points_local: (N, 3) local instance points.
        exp_proj_uv: (2, N) expected pixel positions.
        valid_mask: (N,) valid-point mask.
        cam_p: (3, 4) camera projection matrix.
        rotate_view: rotate points by the viewing angle.

    Returns:
        mean absolute uv error over valid points.
    """
    if len(x) == 3:
        xz_dist, cen_y, viewing_angle = x
    else:
        xz_dist, cen_y = x

    pred_uv, point_mask = proj_points(
        xz_dist, cen_y, viewing_angle, inst_points_local, cam_p,
        rotate_view)

    mask = valid_mask.astype(bool) & point_mask
    if not mask.any():
        return 1e9
    err = np.abs(pred_uv[:, mask] - exp_proj_uv[:, mask])
    return float(err.mean())


def proj_points(xz_dist, centroid_y, viewing_angle,
                inst_points_local, cam_p, rotate_view=True):
    """Projects local instance points at a hypothesized pose.

    (ref: instance_utils.py:791-838)

    Returns:
        points_uv: (2, N) projected pixel coordinates.
        valid_points_mask: (N,) mask of nonzero local points.
    """
    from monopsr_tpu.geometry import transforms

    guess = np.asarray([xz_dist * np.sin(viewing_angle),
                        centroid_y,
                        xz_dist * np.cos(viewing_angle)])

    if rotate_view:
        rot = transforms.np_get_tr_mat(viewing_angle, (0.0, 0.0, 0.0))
        rotated = transforms.apply_tr_mat_to_points(
            rot, inst_points_local)
    else:
        rotated = np.asarray(inst_points_local)

    global_points = rotated + guess

    valid = np.sum(np.abs(rotated), axis=1) > 0.1

    # Shift into cam0 for projection
    x_offset = -cam_p[0, 3] / cam_p[0, 0]
    cam0_points = (global_points + [x_offset, 0, 0]) * valid[:, None]

    uv = projection.np_project_pc_to_image(cam0_points.T, cam_p) * valid
    return uv, valid


def np_proj_err_rgb(x, viewing_angle, inst_points_local, inst_rgb_map,
                    image, valid_mask_map, cam_p, rotate_view=True):
    """RGB-similarity projection error for pose parameters.

    Projects the local instance points at the hypothesized pose, samples
    the image's RGB values at the projected pixels, and compares them
    against the instance's own RGB map — a pose that projects onto the
    object yields low color difference
    (ref: src/monopsr/core/instances/instance_metrics.py:222-250
    `np_proj_err_rgb`, driven by `scipy_proj_err_rgb` :253-287).

    Args:
        x: (xz_dist, cen_y) or (xz_dist, cen_y, view_ang) parameters.
        viewing_angle: fixed viewing angle (ignored if len(x) == 3).
        inst_points_local: (N, 3) local instance points (N = roi_h*roi_w).
        inst_rgb_map: (roi_h, roi_w, 3) instance RGB crop.
        image: (H, W, 3) full image.
        valid_mask_map: (roi_h, roi_w) valid-pixel mask.
        cam_p: (3, 4) camera projection matrix.
        rotate_view: rotate points by the viewing angle.

    Returns:
        summed |RGB difference| / 255 per valid pixel. The reference
        indexes the image with raw rounded coordinates (wrapping /
        crashing off-image); here projections are clipped to the image
        bounds — a documented deviation that only affects poses
        projecting outside the frame, which score badly either way.
    """
    if len(x) == 3:
        xz_dist, cen_y, viewing_angle = x
    else:
        xz_dist, cen_y = x

    pred_uv, _ = proj_points(
        xz_dist, cen_y, viewing_angle, inst_points_local, cam_p,
        rotate_view)

    h, w = image.shape[:2]
    cols = np.clip(np.round(pred_uv[0]).astype(np.int64), 0, w - 1)
    rows = np.clip(np.round(pred_uv[1]).astype(np.int64), 0, h - 1)

    roi_shape = inst_rgb_map.shape[:2]
    guess_rgb_map = (image[rows, cols].reshape(*roi_shape, 3).astype(
        np.float64) * valid_mask_map[..., None])

    valid_count = np.count_nonzero(valid_mask_map)
    if valid_count == 0:
        return 1e9
    diff = np.abs(inst_rgb_map.astype(np.float64) *
                  valid_mask_map[..., None] - guess_rgb_map)
    return float(diff.sum(axis=2).sum() / 255.0 / valid_count)


def scipy_refine_pose(inst_points_local, exp_proj_uv, valid_mask, cam_p,
                      x0, viewing_angle=0.0, optimize_view_ang=False,
                      rotate_view=True):
    """Minimizes np_proj_error over the pose parameters (Nelder-Mead)."""
    from scipy import optimize

    x0 = np.asarray(x0, np.float64)
    result = optimize.minimize(
        np_proj_error, x0,
        args=(viewing_angle, inst_points_local, exp_proj_uv, valid_mask,
              cam_p, rotate_view),
        method='Nelder-Mead')
    return result.x, result.fun


def convex_hull_mask_iou(pred_uv, valid_mask, gt_mask, image_shape):
    """IoU between the convex hull of projected points and a GT mask.

    (ref: instance_metrics.py:276+)
    """
    import cv2

    pts = pred_uv[:, valid_mask.astype(bool)]
    if pts.shape[1] < 3:
        return 0.0
    cols = np.clip(np.round(pts[0]).astype(np.int32), 0,
                   image_shape[1] - 1)
    rows = np.clip(np.round(pts[1]).astype(np.int32), 0,
                   image_shape[0] - 1)
    points = np.stack([cols, rows], axis=1).reshape(-1, 1, 2)
    hull_pts = cv2.convexHull(points)
    hull_img = np.zeros(image_shape, np.uint8)
    cv2.fillConvexPoly(hull_img, hull_pts, 1)
    hull = hull_img.astype(bool)

    inter = np.logical_and(hull, gt_mask).sum()
    union = np.logical_or(hull, gt_mask).sum()
    return float(inter) / union if union else 0.0
