"""Standalone predictions -> KITTI-format conversion for chosen steps.

Behavioral twin of the reference converter
(ref: scripts/offline_eval/save_kitti_predictions.py:12-205): re-runs
the KITTI-format writer over already-saved box_3d/box_2d prediction
dumps without re-running inference.

Usage:
    python scripts/offline_eval/save_kitti_predictions.py \
        --config_path configs/monopsr_model_000.yaml \
        --data_split val --steps 100000 [--score_threshold 0.1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from monopsr_tpu import config as config_utils  # noqa: E402
from monopsr_tpu import constants as C  # noqa: E402
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset  # noqa: E402
from monopsr_tpu.eval import kitti_writers  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config_path', required=True)
    parser.add_argument('--data_split', default='val')
    parser.add_argument('--steps', nargs='+', required=True, type=int)
    parser.add_argument('--score_threshold', type=float, default=None)
    parser.add_argument('--save_2d', action='store_true',
                        help='2D-only conversion: write box_2d predictions '
                             'in KITTI format with -1000/-10 3D placeholder '
                             'fields (ref save_2d mode / '
                             'evaluator_utils.py:17-110)')
    parser.add_argument('--output_base_dir', default=None,
                        help='Override for the outputs root '
                             '(default <repo>/data/outputs)')
    args = parser.parse_args()

    config = config_utils.parse_yaml_config(
        args.config_path, output_base_dir=args.output_base_dir)
    config.dataset_config.data_split = args.data_split
    mode = 'test' if args.data_split.startswith('test') else 'val'
    dataset = KittiDataset(config.dataset_config, mode)

    threshold = (args.score_threshold if args.score_threshold is not None
                 else config.train_config.get('kitti_score_threshold', 0.1))

    for step in args.steps:
        box_3d_dir = os.path.join(config.pred_dir, 'box_3d',
                                  args.data_split, str(step))
        box_2d_dir = os.path.join(config.pred_dir, 'box_2d',
                                  args.data_split, str(step))
        if args.save_2d:
            if not os.path.isdir(box_2d_dir):
                print('Missing predictions for step', step, ':', box_2d_dir)
                continue
            out_dir = kitti_writers.save_predictions_box_2d_in_kitti_format(
                threshold, dataset, config.pred_dir, box_2d_dir, step)
            print('step {}: 2D-only predictions -> {}'.format(step, out_dir))
            continue
        if not os.path.isdir(box_3d_dir):
            print('Missing predictions for step', step, ':', box_3d_dir)
            continue
        out_dir, num_valid = \
            kitti_writers.save_predictions_box_3d_in_kitti_format(
                threshold, dataset, config.pred_dir, box_3d_dir,
                box_2d_dir, step)
        print('step {}: {} samples with predictions -> {}'.format(
            step, num_valid, out_dir))


if __name__ == '__main__':
    main()
