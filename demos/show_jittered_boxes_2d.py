"""Demo: visualize the 2D box-jitter augmentation.

(ref: demos/show_jittered_boxes_2d.py)

Usage:
    python demos/show_jittered_boxes_2d.py --data_split_dir <dir> \
        --sample_name 000003 [--out jitter.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import matplotlib  # noqa: E402

matplotlib.use('Agg')

from monopsr_tpu.datasets.kitti import kitti_aug, obj_utils  # noqa: E402
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
    labels = obj_utils.read_labels(os.path.join(d, 'label_2'),
                                   args.sample_name)
    labels = [o for o in labels if o.type != 'DontCare']

    jittered = kitti_aug.jitter_obj_boxes_2d(labels, 0.7,
                                             image.shape[0:2])

    fig, ax = vis_utils.create_fig(image)
    for obj in labels:
        vis_utils.draw_box_2d(ax, obj, colour='lime')
    for obj in jittered:
        vis_utils.draw_box_2d(ax, obj, colour='red', linewidth=1)

    out = args.out or (args.sample_name + '_jitter.png')
    vis_utils.save_fig(fig, out)
    print('Saved', out)


if __name__ == '__main__':
    main()
