"""Inference entry point (test mode: predictions only, no losses).

CLI twin of the reference (ref: src/monopsr/experiments/run_inference.py):
    python -m monopsr_tpu.experiments.run_inference \
        --config_path configs/monopsr_model_000.yaml \
        --data_split val --ckpt_num 100000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from monopsr_tpu import config as config_utils  # noqa: E402


def inference(config, data_split, ckpt_indices='all'):
    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from monopsr_tpu.eval.evaluator import Evaluator

    config.dataset_config.data_split = data_split
    if data_split.startswith('test'):
        config.dataset_config.data_split_dir = 'testing'
        config.dataset_config.has_kitti_labels = False
        mode = 'test'
    else:
        mode = 'test'  # inference mode: no losses even on val splits

    dataset = KittiDataset(config.dataset_config, mode)
    evaluator = Evaluator(config, dataset, eval_mode='test',
                          do_kitti_native_eval=False)
    return evaluator.run_latest_checkpoints(ckpt_indices)


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
    parser.add_argument('--ckpt_num', type=str, nargs='+', default=None,
                        help="Checkpoint steps to run, or 'all'")
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()

    config = config_utils.parse_yaml_config(args.config_path)
    ckpt_indices = args.ckpt_num if args.ckpt_num else 'all'
    if ckpt_indices != 'all' and ckpt_indices != ['all']:
        ckpt_indices = [int(c) for c in ckpt_indices]
    else:
        ckpt_indices = 'all'
    inference(config, args.data_split, ckpt_indices)


if __name__ == '__main__':
    main()
