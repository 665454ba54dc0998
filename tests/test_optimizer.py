"""Optimizer builder: types, schedules, and bf16 first-moment storage.

Ref contract: src/monopsr/builders/optimizer_builder.py:23-118 (the
four optimizer types + exponential decay). The optimizer_mu_dtype knob
is a TPU-side extension (halves the first-moment HBM sweep); it must
change storage dtype only, not the update direction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monopsr_tpu.config import ConfigObj
from monopsr_tpu.train import optimizer as opt_lib


def make_train_config(opt_type='adam_optimizer', **extra):
    opt = {
        'learning_rate_type': 'constant',
        'learning_rate': 1e-2,
        'momentum_optimizer_value': 0.9,
    }
    return ConfigObj({
        'optimizer': {'optimizer_type': opt_type, opt_type: opt},
        **extra,
    })


@pytest.mark.parametrize('opt_type', [
    'adam_optimizer', 'momentum_optimizer', 'rms_prop_optimizer',
    'gradient_descent_optimizer'])
def test_builds_and_steps(opt_type):
    tx, _, _, _ = opt_lib.build_optimizer(make_train_config(opt_type))
    params = {'w': jnp.ones((4,), jnp.float32)}
    state = tx.init(params)
    grads = {'w': jnp.full((4,), 0.5, jnp.float32)}
    updates, _ = tx.update(grads, state, params)
    assert jnp.all(jnp.isfinite(updates['w']))


def _mu_leaves(state):
    return [x for x in jax.tree.leaves(state)
            if hasattr(x, 'dtype') and x.dtype == jnp.bfloat16]


def test_mu_dtype_bfloat16_storage_and_direction():
    params = {'w': jnp.ones((8,), jnp.float32)}
    grads = {'w': jnp.linspace(-1.0, 1.0, 8).astype(jnp.float32)}

    tx32, _, _, _ = opt_lib.build_optimizer(make_train_config())
    txbf, _, _, _ = opt_lib.build_optimizer(
        make_train_config(optimizer_mu_dtype='bfloat16'))

    s32, sbf = tx32.init(params), txbf.init(params)
    assert not _mu_leaves(s32)
    assert _mu_leaves(sbf), 'expected a bf16 first-moment accumulator'

    u32, _ = tx32.update(grads, s32, params)
    ubf, _ = txbf.update(grads, sbf, params)
    np.testing.assert_allclose(np.asarray(ubf['w'], np.float32),
                               np.asarray(u32['w'], np.float32),
                               rtol=1e-2, atol=1e-6)


def test_momentum_accumulator_dtype():
    txbf, _, _, _ = opt_lib.build_optimizer(
        make_train_config('momentum_optimizer',
                          optimizer_mu_dtype='bfloat16'))
    state = txbf.init({'w': jnp.ones((4,), jnp.float32)})
    assert _mu_leaves(state)
