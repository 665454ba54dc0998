"""Data-parallel correctness check (run by test_data_parallel.py).

Asserts the actual correctness property of data parallelism: a train
step over a 2-sample batch sharded across a 2-device 'data' mesh yields
the same updated parameters as the same batch on a 1-device mesh.
Requires XLA_FLAGS=--xla_force_host_platform_device_count=2.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import dataclasses

import jax
import numpy as np

jax.config.update('jax_platforms', 'cpu')


def main():
    assert len(jax.devices()) >= 2, 'need 2 virtual devices'

    from __graft_entry__ import _flagship_config, _synthetic_sample
    from monopsr_tpu.config import ConfigObj
    from monopsr_tpu.models import monopsr
    from monopsr_tpu.models.monopsr_net import MonoPSRNet
    from monopsr_tpu.parallel import mesh as mesh_lib
    from monopsr_tpu.train import optimizer as opt_lib
    from monopsr_tpu.train import trainer as trainer_lib
    from monopsr_tpu.train.train_state import TrainState

    _, cfg = _flagship_config()
    cfg = dataclasses.replace(
        cfg, num_boxes=4, image_input_shape=(64, 192),
        resized_full_img_shape=(32, 96), img_roi_size=(24, 24),
        map_roi_size=(24, 24), proposal_fc_sizes=(16, 16),
        regression_fc_sizes=(16, 16), resnet='resnet_tiny',
        compute_dtype='float32')
    net = MonoPSRNet(cfg=cfg)

    samples = [_synthetic_sample(cfg, seed=i, orig_shape=(128, 384))
               for i in range(2)]
    batch = trainer_lib.stack_samples(samples)

    train_config = ConfigObj({
        'optimizer': {
            'optimizer_type': 'adam_optimizer',
            'adam_optimizer': {
                'learning_rate_type': 'constant',
                'learning_rate': 1e-3,
                'use_moving_average': True,
                'moving_average_decay': 0.999,
            },
        },
    })
    tx, _, use_ema, ema_decay = opt_lib.build_optimizer(train_config)

    loss_config = {
        'inst_xyz_map_local': ['smooth_l1_nonzero', 100.0],
        'valid_mask_maps': ['sigmoid_ce', 0.1],
        'lwh': ['smooth_l1', 1.0],
        'alpha_cls': ['softmax', 0.3, 0.001],
        'alpha_reg': ['smooth_l1', 1.0],
        'view_ang': ['smooth_l1', 0.1],
        'cen_y': ['smooth_l1', 0.1],
        'cen_z': ['smooth_l1', 0.1],
        'inst_xyz_map_global': ['smooth_l1_nonzero', 0.1],
        'inst_depth_map_global': ['smooth_l1_nonzero', 10.0],
    }

    variables = net.init(jax.random.PRNGKey(0),
                         **monopsr.net_inputs_from_batch(samples[0]),
                         train=False)

    results = {}
    for n_dev in (1, 2):
        state = TrainState.create(
            jax.tree.map(np.asarray, variables), tx, use_ema=use_ema)
        mesh = mesh_lib.create_mesh(n_dev)
        state = mesh_lib.replicate(mesh, state)
        sharded = mesh_lib.shard_batch(mesh, batch)
        train_step = trainer_lib.make_train_step(
            net, cfg, loss_config, tx, use_ema, ema_decay)
        new_state, losses = train_step(state, sharded)
        results[n_dev] = (jax.device_get(new_state.params),
                          jax.device_get(new_state.ema_params),
                          float(jax.device_get(losses['total_loss'])))

    params_1, ema_1, loss_1 = results[1]
    params_2, ema_2, loss_2 = results[2]

    assert abs(loss_1 - loss_2) < 1e-5, (loss_1, loss_2)

    # Tolerance: the batch-native towers batch (2N) boxes on 1 device
    # vs (N) per shard on 2, so XLA tiles reductions differently and
    # gradients agree only to f32 noise; a bias-corrected first Adam
    # step is +-lr for ANY nonzero gradient (m/sqrt(v) = sign(g)), so a
    # noise-level sign flip on a near-zero gradient element moves the
    # param by up to 2*lr = 2e-3. The tight invariant is the loss above.
    max_diff = 0.0
    flat_1, _ = jax.tree.flatten(params_1)
    flat_2, _ = jax.tree.flatten(params_2)
    assert len(flat_1) == len(flat_2)
    for a, b in zip(flat_1, flat_2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
        max_diff = max(max_diff, float(np.max(np.abs(a - b))))
    for a, b in zip(jax.tree.flatten(ema_1)[0], jax.tree.flatten(ema_2)[0]):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)

    print('DP_EQUIVALENCE_OK max_param_diff={:.3e} loss={:.6f}'.format(
        max_diff, loss_1))


if __name__ == '__main__':
    main()
