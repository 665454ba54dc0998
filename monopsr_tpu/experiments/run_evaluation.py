"""Evaluation entry point (checkpoint polling on the val split).

CLI twin of the reference (ref: src/monopsr/experiments/run_evaluation.py):
    python -m monopsr_tpu.experiments.run_evaluation \
        --config_path configs/monopsr_model_000.yaml --data_split val
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from monopsr_tpu import config as config_utils  # noqa: E402


def evaluate(config, data_split='val', repeated=True,
             kitti_native_eval=True):
    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from monopsr_tpu.eval.evaluator import Evaluator

    config.dataset_config.data_split = data_split
    dataset = KittiDataset(config.dataset_config, 'val')
    evaluator = Evaluator(config, dataset, eval_mode='val',
                          do_kitti_native_eval=kitti_native_eval)
    if repeated:
        return evaluator.repeated_checkpoint_run()
    return evaluator.run_latest_checkpoints('all')


def main():
    from monopsr_tpu.utils import compile_cache
    compile_cache.enable()

    parser = argparse.ArgumentParser()
    default_config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        'configs', 'monopsr_model_000.yaml')
    parser.add_argument('--config_path', type=str, default=default_config)
    parser.add_argument('--data_split', type=str, default='val')
    parser.add_argument('--repeated', action='store_true', default=False,
                        help='Poll for new checkpoints')
    parser.add_argument('--no_kitti_native_eval', action='store_true')
    parser.add_argument('--device', type=str, default=None,
                        help="Backend: 'cpu' or 'tpu'")
    args = parser.parse_args()

    from monopsr_tpu.utils import device_select
    device_select.apply(args.device)

    config = config_utils.parse_yaml_config(args.config_path)
    evaluate(config, args.data_split, repeated=args.repeated,
             kitti_native_eval=not args.no_kitti_native_eval)


if __name__ == '__main__':
    main()
