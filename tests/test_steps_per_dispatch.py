"""steps_per_dispatch (lax.scan of K steps) == per-step dispatch.

The trainer's multi-step mode exists purely to remove host dispatch
between steps; the parameter trajectory must be identical. Trains the
tiny integration config for 4 steps with K=1 and K=2 on the same
seeded sample stream and compares the final checkpointed params.
Also covers K not dividing max_iterations (tail falls back to
single-step dispatches) and the summary/checkpoint boundary logic.
"""

import jax
import numpy as np
import pytest

from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from monopsr_tpu.train import trainer

from tests.test_train_eval import make_config


def _train(tmp_path, tag, steps_per_dispatch, max_iterations=4):
    config = make_config(tmp_path / tag, max_iterations=max_iterations)
    config.train_config.steps_per_dispatch = steps_per_dispatch
    # Seeded: per-sample RNG becomes (seed, name, epoch)-keyed, making
    # the training stream identical across runs (unseeded datasets
    # share one RandomState whose draws depend on loader-thread
    # interleaving — two identical K=1 runs then diverge).
    config.dataset_config.seed = 7
    dataset = KittiDataset(config.dataset_config, 'train')
    state = trainer.train(config, dataset)
    return jax.device_get(state.params), config


@pytest.mark.parametrize('k', [2, 3])
def test_multi_step_matches_single_step(tmp_path, k):
    params_1, _ = _train(tmp_path, 'k1', 1)
    params_k, config_k = _train(tmp_path, 'k{}'.format(k), k)

    leaves_1 = jax.tree.leaves(params_1)
    leaves_k = jax.tree.leaves(params_k)
    assert len(leaves_1) == len(leaves_k)
    for a, b in zip(leaves_1, leaves_k):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)

    # checkpoint boundaries still produced (interval 2, max 4)
    import os
    ckpts = sorted(os.listdir(config_k.checkpoint_dir))
    assert any(c.lstrip('0') in ('4', '') or c.endswith('4')
               for c in ckpts), ckpts


def test_multi_step_with_feature_map_summaries(tmp_path):
    """The summary-images capture samples from the dispatch's batch —
    regression test for the multi-step branch leaving it undefined."""
    import os
    config = make_config(tmp_path / 'imgs', max_iterations=2)
    config.train_config.steps_per_dispatch = 2
    config.train_config.summary_interval = 1
    config.dataset_config.seed = 7
    config.summary_images = True
    dataset = KittiDataset(config.dataset_config, 'train')
    trainer.train(config, dataset)
    images_dir = os.path.join(config.logdir, 'images')
    assert os.path.isdir(images_dir) and os.listdir(images_dir)
