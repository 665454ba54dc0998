"""Per-device image batching: the train step's vmapped image axis.

VERDICT r2 #6: train_config.batch_size scales images per device. The
correctness property: gradients average over the image axis, so a
duplicated sample changes nothing, and a 2-sample batch's loss is the
mean of the per-sample losses.
"""

import dataclasses

import jax
import numpy as np

from __graft_entry__ import (_flagship_config, _synthetic_sample,
                             build_train_setup)
from monopsr_tpu.train import trainer as trainer_lib


def _tiny_cfg():
    _, cfg = _flagship_config()
    return dataclasses.replace(
        cfg, num_boxes=4, image_input_shape=(64, 192),
        resized_full_img_shape=(32, 96), img_roi_size=(24, 24),
        map_roi_size=(24, 24), proposal_fc_sizes=(16, 16),
        regression_fc_sizes=(16, 16), resnet='resnet_tiny',
        compute_dtype='float32')


def test_duplicated_sample_batch_matches_batch_one():
    cfg = _tiny_cfg()
    train_step, state, batch1 = build_train_setup(
        cfg, n_samples=1, orig_shape=(128, 384))

    sample = _synthetic_sample(cfg, seed=0, orig_shape=(128, 384))
    batch2 = trainer_lib.stack_samples([sample, sample])

    state1, losses1 = train_step(state, batch1)
    # Rebuild state: train_step donates its input
    _, state_b, _ = build_train_setup(
        cfg, n_samples=1, orig_shape=(128, 384))
    state2, losses2 = train_step(state_b, batch2)

    np.testing.assert_allclose(
        float(losses1['total_loss']), float(losses2['total_loss']),
        rtol=1e-6)
    p1 = jax.tree.leaves(jax.device_get(state1.params))
    p2 = jax.tree.leaves(jax.device_get(state2.params))
    for a, b in zip(p1, p2):
        # The batch-native towers run (2N) vs (N) box batches, so XLA
        # tiles reductions differently -> f32-noise gradient deltas; a
        # bias-corrected first Adam step is +-lr for any nonzero grad,
        # so noise-level sign flips move params by up to 2*lr = 2e-3.
        # The tight invariant is the loss equality above.
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)


def test_batch_loss_is_mean_of_per_sample_losses():
    cfg = _tiny_cfg()
    train_step, state, _ = build_train_setup(
        cfg, n_samples=1, orig_shape=(128, 384))

    s0 = _synthetic_sample(cfg, seed=0, orig_shape=(128, 384))
    s1 = _synthetic_sample(cfg, seed=1, orig_shape=(128, 384))

    def total_of(samples):
        _, st, _ = build_train_setup(
            cfg, n_samples=1, orig_shape=(128, 384))
        _, losses = train_step(
            st, trainer_lib.stack_samples(samples))
        return float(losses['total_loss'])

    t0 = total_of([s0])
    t1 = total_of([s1])
    t01 = total_of([s0, s1])
    # The map decoder's train-mode BatchNorm computes stats over the
    # whole flat (B*N) box batch (conventional batching semantics), so
    # a joint batch is NOT bit-decomposable into per-sample losses; the
    # coupling measures ~4e-4 relative at these shapes.
    np.testing.assert_allclose(t01, (t0 + t1) / 2.0, rtol=2e-3)
