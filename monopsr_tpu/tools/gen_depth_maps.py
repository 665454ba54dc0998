"""Offline tool: render + complete LiDAR depth maps for a KITTI split.

Behavioral twin of the reference driver
(ref: demos/depth_completion/save_lidar_depth_maps.py:12-99):
lidar -> cam0 frame -> sparse projection -> ip_basic fill ->
uint16 png under <split_dir>/depth_2_multiscale/.
"""

import argparse
import os
import sys

import numpy as np

from monopsr_tpu.datasets.kitti import calib_utils, depth_map_utils, obj_utils
from monopsr_tpu.tools import ip_basic


def generate_depth_maps(data_split_dir, sample_names=None,
                        out_dir=None, fill_type='multiscale',
                        save_depth_maps=True, backend='host'):
    """Generates completed depth maps for samples in a split directory.

    backend='host' runs the cv2 pipeline; backend='xla' runs the
    jit-compiled twin (ops/depth_fill.py) on the default JAX device,
    offloading the completion from the host CPU (which stays busy with
    LiDAR IO / projection / png writes) and batching cleanly on a TPU
    chip. Per-shape compile is cached; KITTI has only a handful of
    image sizes.
    """
    velo_dir = os.path.join(data_split_dir, 'velodyne')
    calib_dir = os.path.join(data_split_dir, 'calib')
    image_dir = os.path.join(data_split_dir, 'image_2')

    if out_dir is None:
        out_dir = os.path.join(data_split_dir, 'depth_2_' + fill_type)
    os.makedirs(out_dir, exist_ok=True)

    if sample_names is None:
        sample_names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(velo_dir)
            if f.endswith('.bin'))

    for idx, sample_name in enumerate(sample_names):
        sys.stdout.write('\r{} / {} {}'.format(
            idx + 1, len(sample_names), sample_name))
        sys.stdout.flush()

        image = obj_utils.get_image(sample_name, image_dir)
        image_shape = image.shape[0:2]

        frame_calib = calib_utils.get_frame_calib(calib_dir, sample_name)
        point_cloud = obj_utils.get_lidar_point_cloud_for_cam(
            sample_name, frame_calib, velo_dir, image_shape)

        projected = depth_map_utils.project_depths(
            point_cloud, frame_calib.p2, image_shape)

        if fill_type != 'multiscale':
            raise ValueError('Invalid fill type: ' + fill_type)
        if backend == 'xla':
            from monopsr_tpu.ops import depth_fill
            final_depths = np.asarray(
                depth_fill.fill_in_multiscale(projected))
        else:
            final_depths, _ = ip_basic.fill_in_multiscale(projected)

        if save_depth_maps:
            depth_map_utils.save_depth_map(
                os.path.join(out_dir, sample_name + '.png'),
                final_depths.astype(np.float32))
    print()
    return out_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_split_dir', required=True)
    parser.add_argument('--fill_type', default='multiscale')
    parser.add_argument('--backend', default='host',
                        choices=['host', 'xla'],
                        help="'xla' runs the jit-compiled completion "
                             "on the default JAX device (ops/depth_fill)")
    args = parser.parse_args()
    generate_depth_maps(args.data_split_dir, fill_type=args.fill_type,
                        backend=args.backend)


if __name__ == '__main__':
    main()
