"""Training entry point.

CLI twin of the reference (ref: src/monopsr/experiments/run_training.py):
    python -m monopsr_tpu.experiments.run_training \
        --config_path configs/monopsr_model_000.yaml [--data_split train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from monopsr_tpu import config as config_utils  # noqa: E402


def train(config, data_split=None):
    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from monopsr_tpu.train import trainer

    if data_split:
        config.dataset_config.data_split = data_split

    dataset = KittiDataset(config.dataset_config, 'train')
    return trainer.train(config, dataset)


def main():
    from monopsr_tpu.utils import compile_cache
    compile_cache.enable()

    parser = argparse.ArgumentParser()
    default_config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        'configs', 'monopsr_model_000.yaml')
    parser.add_argument('--config_path', type=str, default=default_config,
                        help='Path to the experiment YAML config')
    parser.add_argument('--data_split', type=str, default=None,
                        help="Override the dataset split (e.g. 'train')")
    parser.add_argument('--device', type=str, default=None,
                        help="Backend: 'cpu' or 'tpu' (default: JAX's "
                             'own preference — TPU when present)')
    args = parser.parse_args()

    from monopsr_tpu.utils import device_select
    device_select.apply(args.device)

    config = config_utils.parse_yaml_config(args.config_path)
    config_utils.copy_config_into_experiment_dir(args.config_path, config)
    train(config, args.data_split)


if __name__ == '__main__':
    main()
