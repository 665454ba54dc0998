"""Camera projection and depth-map backprojection, NumPy and JAX.

Behavioral twins of the reference projection utilities
(ref: src/monopsr/datasets/kitti/calib_utils.py:245-280,
src/monopsr/datasets/kitti/depth_map_utils.py:52-302,
src/monopsr/datasets/kitti/instance_utils.py:684-788).

JAX versions are batched over the box axis with static shapes — the
reference's per-box `tf.map_fn`/Python-unrolled loops become one fused
batched computation.
"""

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Point cloud <-> image projection
# ---------------------------------------------------------------------------

def np_project_pc_to_image(point_cloud, cam_p):
    """Projects a (3, N) point cloud to (2, N) [u, v] image points."""
    pc_padded = np.append(
        point_cloud, np.ones((1, point_cloud.shape[1])), axis=0)
    pts = cam_p @ pc_padded
    return pts[0:2] / pts[2]


def project_pc_to_image_batch(point_cloud, cam_p, min_depth=1e-3):
    """Projects batched point clouds to image space (JAX).

    The homogeneous divide uses a sign-preserving depth clamp: points at
    z ~ 0 (invalid slots, or predictions mid-training) would otherwise
    emit inf forward and `inf * 0 = NaN` in the backward even where the
    caller masks them out.

    Args:
        point_cloud: (B, 3, N) point clouds.
        cam_p: (3, 4) camera projection matrix.
        min_depth: minimum |z| used in the divide.

    Returns:
        (B, 2, N) projected [u, v] coordinates.
    """
    pc_padded = jnp.concatenate(
        [point_cloud, jnp.ones_like(point_cloud[:, :1])], axis=1)
    pts = jnp.einsum('ij,bjn->bin', cam_p, pc_padded)
    z = pts[:, 2:3]
    z_safe = jnp.where(jnp.abs(z) < min_depth,
                       jnp.where(z < 0, -min_depth, min_depth), z)
    return pts[:, 0:2] / z_safe


# ---------------------------------------------------------------------------
# Depth patch -> point-cloud map
# ---------------------------------------------------------------------------

def _corr_factors(valid_depths, depth_map_shape):
    """Empirical projection-correction offsets by depth-map width.

    Clipped power laws fit per resolution
    (ref: depth_map_utils.py:128-158). Only 1242- and 1224-wide maps have
    published factors.
    """
    depth_map_h, depth_map_w = depth_map_shape
    if depth_map_w == 1242:
        xx_off = np.clip(3.38 * valid_depths ** -0.998, 0.049, 0.68)
        yy_off = np.clip(0.729 * valid_depths ** -0.998, 0.0105, 0.146)
    elif depth_map_w == 1224:
        xx_off = np.clip(6.07 * valid_depths ** -1.0, 0.087, 1.22)
        yy_off = np.clip(2.30 * valid_depths ** -1.0, 0.033, 0.459)
    else:
        raise NotImplementedError(
            'No correction factors for depth_map_w={}'.format(depth_map_w))
    return xx_off, yy_off


def np_depth_patch_to_pc_map(depth_patch, box_2d, cam_p, roi_size,
                             round_box_2d=True, use_pixel_centres=True,
                             use_corr_factors=True, depth_map_shape=None):
    """Backprojects an ROI depth patch to a (3, H, W) point-cloud map.

    Args:
        depth_patch: (H, W) depth patch resized to roi_size.
        box_2d: [y1, x1, y2, x2] 2D box the patch was cropped from.
        cam_p: (3, 4) camera projection matrix.
        roi_size: (h, w) ROI size.
        round_box_2d: round the 2D box before building the pixel grid.
        use_pixel_centres: sample at ROI pixel centres (vs top-left).
        use_corr_factors: apply per-resolution correction offsets.
        depth_map_shape: original (H, W) depth-map shape, required when
            use_corr_factors.

    Returns:
        (3, h, w) point-cloud map in the camera frame of cam_p.
    """
    depth_patch = np.squeeze(np.asarray(depth_patch))
    if round_box_2d:
        y1, x1, y2, x2 = np.round(box_2d)
    else:
        y1, x1, y2, x2 = box_2d

    num_x, num_y = roi_size[0], roi_size[1]
    pixel_w = (x2 - x1) / num_x
    pixel_h = (y2 - y1) / num_y

    if use_pixel_centres:
        xx, yy = np.meshgrid(
            np.linspace(x1 + pixel_w / 2.0, x2 - pixel_w / 2.0, num_x),
            np.linspace(y1 + pixel_h / 2.0, y2 - pixel_h / 2.0, num_y))
    else:
        xx, yy = np.meshgrid(
            np.linspace(x1, x2 - pixel_w, num_x),
            np.linspace(y1, y2 - pixel_h, num_y))

    if use_corr_factors:
        h, w = depth_map_shape
        valid_mask = depth_patch > 0.1
        xx_off, yy_off = _corr_factors(depth_patch[valid_mask],
                                       depth_map_shape)
        xx[valid_mask] += xx_off * (xx[valid_mask] / w)
        yy[valid_mask] += yy_off * (yy[valid_mask] / h)

    f = cam_p[0, 0]
    cu, cv = cam_p[0, 2], cam_p[1, 2]
    ratio = depth_patch / f
    return np.asarray(((xx - cu) * ratio, (yy - cv) * ratio, depth_patch))


def depth_patch_to_pc_map_batch(depth_patches, boxes_2d, cam_p, roi_size,
                                use_pixel_centres=True):
    """Batched JAX depth-patch backprojection.

    Args:
        depth_patches: (N, h, w) depth patches (already resized to ROI).
        boxes_2d: (N, 4) [y1, x1, y2, x2] source boxes (unrounded).
        cam_p: (3, 4) camera projection matrix.
        roi_size: (h, w) static ROI size.
        use_pixel_centres: sample at ROI pixel centres.

    Returns:
        (N, h, w, 3) point-cloud maps.
    """
    num_y, num_x = roi_size[0], roi_size[1]
    y1, x1, y2, x2 = (boxes_2d[:, i] for i in range(4))

    pixel_w = (x2 - x1) / num_x
    pixel_h = (y2 - y1) / num_y

    tx = jnp.linspace(0.0, 1.0, num_x)[None, :]
    ty = jnp.linspace(0.0, 1.0, num_y)[None, :]
    if use_pixel_centres:
        xs = (x1 + pixel_w / 2.0)[:, None] + tx * (x2 - x1 - pixel_w)[:, None]
        ys = (y1 + pixel_h / 2.0)[:, None] + ty * (y2 - y1 - pixel_h)[:, None]
    else:
        xs = x1[:, None] + tx * (x2 - x1 - pixel_w)[:, None]
        ys = y1[:, None] + ty * (y2 - y1 - pixel_h)[:, None]

    xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], num_y, num_x))
    yy = jnp.broadcast_to(ys[:, :, None], (ys.shape[0], num_y, num_x))

    f = cam_p[0, 0]
    cu, cv = cam_p[0, 2], cam_p[1, 2]
    ratio = depth_patches / f
    x = (xx - cu) * ratio
    y = (yy - cv) * ratio
    return jnp.stack([x, y, depth_patches], axis=-1)


def np_get_depth_point_cloud(depth_map, cam_p, min_v=0, flatten=True,
                             in_cam0_frame=True):
    """Backprojects a full (H, W) depth map to a point cloud.

    Returns (3, N) if flatten else (3, H, W)
    (ref: depth_map_utils.py:239-302).
    """
    depth_map = np.asarray(depth_map, np.float32)
    h, w = depth_map.shape[0:2]
    if min_v > 0:
        depth_map = depth_map.copy()
        depth_map[0:min_v] = 0.0

    xx, yy = np.meshgrid(np.linspace(0, w - 1, w), np.linspace(0, h - 1, h))

    cu, cv, f = cam_p[0, 2], cam_p[1, 2], cam_p[0, 0]
    ratio = depth_map / f
    x = (xx - cu) * ratio
    y = (yy - cv) * ratio

    if in_cam0_frame:
        x_offset = -cam_p[0, 3] / f
        pc_map = np.asarray([x + x_offset, y, depth_map])
    else:
        pc_map = np.asarray([x, y, depth_map])

    if flatten:
        return np.reshape(pc_map, (3, -1)).astype(np.float32)
    return pc_map.astype(np.float32)


# ---------------------------------------------------------------------------
# Expected ROI projection grids
# ---------------------------------------------------------------------------

def np_get_exp_proj_uv_map(box_2d, roi_size, round_box_2d=False,
                           use_pixel_centres=False):
    """(H, W, 2) expected uv grid of evenly spaced ROI pixels
    (ref: instance_utils.py:684-735)."""
    if round_box_2d:
        u1, u2 = np.round(box_2d[[1, 3]])
        v1, v2 = np.round(box_2d[[0, 2]])
    else:
        u1, u2 = box_2d[[1, 3]]
        v1, v2 = box_2d[[0, 2]]

    roi_h, roi_w = roi_size
    du = (u2 - u1) / roi_w
    dv = (v2 - v1) / roi_h

    if use_pixel_centres:
        grid_u = np.linspace(u1 + du / 2.0, u2 - du / 2.0, roi_w)
        grid_v = np.linspace(v1 + dv / 2.0, v2 - dv / 2.0, roi_h)
    else:
        grid_u = np.linspace(u1, u2 - du, roi_w)
        grid_v = np.linspace(v1, v2 - dv, roi_h)

    return np.dstack(np.meshgrid(grid_u, grid_v))


def get_exp_proj_uv_map_batch(boxes_2d, roi_size, round_box_2d=False,
                              use_pixel_centres=True):
    """Batched (N, H, W, 2) expected uv grids (JAX).

    Matches the reference TF version's default of pixel-centre sampling
    (ref: instance_utils.py:738-788).
    """
    if round_box_2d:
        boxes_2d = jnp.round(boxes_2d)

    v1, u1, v2, u2 = (boxes_2d[:, i] for i in range(4))
    roi_h, roi_w = roi_size
    du = (u2 - u1) / roi_w
    dv = (v2 - v1) / roi_h

    t_u = jnp.linspace(0.0, 1.0, roi_w)[None, :]
    t_v = jnp.linspace(0.0, 1.0, roi_h)[None, :]

    if use_pixel_centres:
        grid_u = (u1 + du / 2.0)[:, None] + t_u * (u2 - u1 - du)[:, None]
        grid_v = (v1 + dv / 2.0)[:, None] + t_v * (v2 - v1 - dv)[:, None]
    else:
        grid_u = u1[:, None] + t_u * (u2 - u1 - du)[:, None]
        grid_v = v1[:, None] + t_v * (v2 - v1 - dv)[:, None]

    n = boxes_2d.shape[0]
    uu = jnp.broadcast_to(grid_u[:, None, :], (n, roi_h, roi_w))
    vv = jnp.broadcast_to(grid_v[:, :, None], (n, roi_h, roi_w))
    return jnp.stack([uu, vv], axis=-1)
