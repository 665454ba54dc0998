"""Demo: render a KITTI sample with 2D boxes and projected 3D boxes.

(ref: demos/view_kitti_sample_2d.py)

Usage:
    python demos/view_kitti_sample_2d.py --data_split_dir <dir> \
        --sample_name 000003 [--out sample.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import matplotlib  # noqa: E402

matplotlib.use('Agg')

from monopsr_tpu.datasets.kitti import calib_utils, obj_utils  # noqa: E402
from monopsr_tpu.visualization import vis_utils  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_split_dir', required=True)
    parser.add_argument('--sample_name', required=True)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    d = args.data_split_dir
    image = obj_utils.get_image(args.sample_name,
                                os.path.join(d, 'image_2'))[..., ::-1]
    calib = calib_utils.get_frame_calib(os.path.join(d, 'calib'),
                                        args.sample_name)
    labels = obj_utils.read_labels(os.path.join(d, 'label_2'),
                                   args.sample_name)

    fig, ax = vis_utils.create_fig(image)
    for obj in labels:
        if obj.type == 'DontCare':
            continue
        vis_utils.draw_box_2d(ax, obj)
        vis_utils.draw_obj_as_box_3d(ax, obj, calib.p2)

    out = args.out or (args.sample_name + '_boxes.png')
    vis_utils.save_fig(fig, out)
    print('Saved', out)


if __name__ == '__main__':
    main()
