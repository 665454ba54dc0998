"""Depth-map IO and LiDAR depth rendering (host side).

Behavioral twin of the reference depth-map utilities
(ref: src/monopsr/datasets/kitti/depth_map_utils.py:9-348), with the
point-splatting loop vectorized (the reference uses a Python
list-comprehension max-splat, ref: depth_map_utils.py:337-343).
"""

import cv2
import numpy as np

from monopsr_tpu.geometry import projection


def read_depth_map(depth_map_path):
    """Reads a uint16 png depth map; depths < 0.1m are zeroed."""
    depth_image = cv2.imread(depth_map_path, cv2.IMREAD_ANYDEPTH)
    if depth_image is None:
        raise FileNotFoundError('Depth map not found: ' + depth_map_path)
    depth_map = depth_image / 256.0
    depth_map[depth_map < 0.1] = 0.0
    return depth_map.astype(np.float32)


def save_depth_map(save_path, depth_map, png_compression=3):
    """Saves a depth map to disk as a uint16 png (metres * 256)."""
    depth_image = (depth_map * 256.0).astype(np.uint16)
    cv2.imwrite(save_path, depth_image,
                [cv2.IMWRITE_PNG_COMPRESSION, png_compression])


def project_depths(point_cloud, cam_p, image_shape, max_depth=100.0):
    """Projects a (3, N) cam0 point cloud to a sparse (H, W) depth map.

    Keeps the closest point per pixel via an inverted-depth max-scatter
    (same inversion trick as the reference; ref: depth_map_utils.py:305-348,
    vectorized with np.maximum.at).
    """
    points_in_img = projection.np_project_pc_to_image(point_cloud, cam_p)
    points_int = np.int32(np.round(points_in_img))

    valid = ((points_int[0] >= 0) & (points_int[0] < image_shape[1]) &
             (points_int[1] >= 0) & (points_int[1] < image_shape[0]))

    depths = point_cloud[2, valid]
    us = points_int[0, valid]
    vs = points_int[1, valid]

    inverted = max_depth - depths
    projected = np.zeros(image_shape, np.float32)
    np.maximum.at(projected, (vs, us), inverted)

    nonzero = projected > 0
    projected[nonzero] = max_depth - projected[nonzero]
    return projected.astype(np.float32)
