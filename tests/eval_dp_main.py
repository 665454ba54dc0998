"""Data-parallel evaluation correctness (run by test_data_parallel.py).

Trains the tiny integration config for 2 steps, then evaluates the
checkpoint twice through the full Evaluator harness — once on an
N-device 'data' mesh (eval_data_parallel=N, N = argv[1], default 2)
and once single-device — and asserts identical box_3d prediction
dumps. Requires XLA_FLAGS=--xla_force_host_platform_device_count=N.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax
import numpy as np

jax.config.update('jax_platforms', 'cpu')
jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def run_equivalence(n_dp):
    """Trains 2 steps, evaluates at n_dp-device DP and 1-device, and
    asserts identical box_3d dumps. Used by test_data_parallel.py (2
    devices) and __graft_entry__.dryrun_multichip (the driver's full
    8-device virtual mesh)."""
    assert len(jax.devices()) >= n_dp, 'need %d virtual devices' % n_dp

    from pathlib import Path

    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from monopsr_tpu.eval.evaluator import Evaluator
    from monopsr_tpu.train import trainer
    from tests.test_train_eval import make_config

    tmp = Path(tempfile.mkdtemp(prefix='eval_dp_'))
    config = make_config(tmp, max_iterations=2)
    dataset = KittiDataset(config.dataset_config, 'train')
    trainer.train(config, dataset)

    dumps = {}
    for dp in (n_dp, 1):
        cfg = make_config(tmp, max_iterations=2)
        cfg.dataset_config.data_split = 'val'
        cfg.train_config.eval_data_parallel = dp
        cfg.train_config.eval_batch = 2
        cfg.pred_dir = str(tmp / 'pred_dp{}'.format(dp))
        ds = KittiDataset(cfg.dataset_config, 'val')
        Evaluator(cfg, ds, eval_mode='val',
                  do_kitti_native_eval=False).run_latest_checkpoints([2])
        out_dir = os.path.join(cfg.pred_dir, 'box_3d', 'val', '2')
        dumps[dp] = {
            f: np.loadtxt(os.path.join(out_dir, f)).reshape(-1, 9)
            for f in sorted(os.listdir(out_dir))}

    assert dumps[n_dp].keys() == dumps[1].keys()
    for name in dumps[1]:
        np.testing.assert_allclose(
            dumps[n_dp][name], dumps[1][name], rtol=1e-4, atol=1e-4,
            err_msg=name)

    print('EVAL_DP_EQUIVALENCE_OK dp=%d' % n_dp, flush=True)


def main():
    run_equivalence(int(sys.argv[1]) if len(sys.argv) > 1 else 2)


if __name__ == '__main__':
    main()
