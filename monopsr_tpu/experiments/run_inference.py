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
    parser.add_argument('--checkpoint_name', type=str, default=None,
                        help='Load the frozen config from '
                             'data/outputs/<name>/<name>.yaml instead of '
                             '--config_path (ref run_inference contract)')
    parser.add_argument('--data_split', type=str, default='val')
    parser.add_argument('--ckpt_num', type=str, nargs='+', default=None,
                        help="Checkpoint steps to run, or 'all'")
    parser.add_argument('--det_2d_score_thr', type=float, nargs='+',
                        default=None,
                        help='Override the per-class MSCNN 2D score '
                             'thresholds (ref: run_inference.py:48-53)')
    parser.add_argument('--device', type=str, default=None,
                        help="Backend: 'cpu' or 'tpu'")
    args = parser.parse_args()

    from monopsr_tpu.utils import device_select
    device_select.apply(args.device)

    if args.checkpoint_name:
        import monopsr_tpu
        config_path = os.path.join(
            monopsr_tpu.data_dir(), 'outputs', args.checkpoint_name,
            args.checkpoint_name + '.yaml')
    else:
        config_path = args.config_path
    config = config_utils.parse_yaml_config(config_path)
    if args.det_2d_score_thr is not None:
        config.dataset_config.mscnn_thr = list(args.det_2d_score_thr)
    ckpt_indices = args.ckpt_num if args.ckpt_num else 'all'
    if ckpt_indices != 'all' and ckpt_indices != ['all']:
        ckpt_indices = [int(c) for c in ckpt_indices]
    else:
        ckpt_indices = 'all'
    inference(config, args.data_split, ckpt_indices)


if __name__ == '__main__':
    main()
