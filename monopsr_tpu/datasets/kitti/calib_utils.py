"""KITTI calibration file parsing and frame transforms (host side).

Behavioral twin of the reference calib utilities
(ref: src/monopsr/datasets/kitti/calib_utils.py:10-343).
"""

import csv
import os

import numpy as np


class FrameCalib:
    """Per-frame calibration.

    Fields:
        p0-p3: (3, 4) camera projection matrices.
        r0_rect: (3, 3) rectification matrix.
        velo_to_cam: (3, 4) velodyne -> camera transform.
            Point_Camera = P_cam * R0_rect * Tr_velo_to_cam * Point_Velodyne
    """

    def __init__(self):
        self.p0 = []
        self.p1 = []
        self.p2 = []
        self.p3 = []
        self.r0_rect = []
        self.velo_to_cam = []


def read_frame_calib(calib_file_path):
    """Parses a KITTI calib txt into a FrameCalib."""
    with open(calib_file_path, 'r') as f:
        data = [row for row in csv.reader(f, delimiter=' ')]

    frame_calib = FrameCalib()
    p_all = []
    for i in range(4):
        vals = [float(v) for v in data[i][1:] if v != '']
        p_all.append(np.reshape(vals, (3, 4)))
    frame_calib.p0, frame_calib.p1, frame_calib.p2, frame_calib.p3 = p_all

    rect_vals = [float(v) for v in data[4][1:] if v != '']
    frame_calib.r0_rect = np.reshape(rect_vals, (3, 3))

    v2c_vals = [float(v) for v in data[5][1:] if v != '']
    frame_calib.velo_to_cam = np.reshape(v2c_vals, (3, 4))

    return frame_calib


def get_frame_calib(calib_dir, sample_name):
    return read_frame_calib(
        os.path.join(calib_dir, '{}.txt'.format(sample_name)))


def lidar_to_cam_frame(xyz_lidar, frame_calib):
    """(N, 3) lidar-frame points -> (N, 3) cam0-frame points."""
    r0_rect = np.eye(4)
    r0_rect[0:3, 0:3] = frame_calib.r0_rect

    tf_mat = np.eye(4)
    tf_mat[0:3, :] = frame_calib.velo_to_cam

    xyz_hom = np.hstack(
        [xyz_lidar, np.ones((xyz_lidar.shape[0], 1))])
    ret = (r0_rect @ tf_mat) @ xyz_hom.T
    return ret[0:3].T
