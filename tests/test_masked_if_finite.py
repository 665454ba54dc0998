"""masked_apply_if_finite == optax.apply_if_finite, step by step.

The select-based rewrite (train/optimizer.py) exists purely for TPU
scheduling (the optax wrapper's lax.cond serializes the optimizer
against the backward pass); the math must be indistinguishable. This
drives both wrappers through finite, NaN, Inf, and give-up sequences
and asserts identical updates, inner states, and counters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from monopsr_tpu.train.optimizer import masked_apply_if_finite

PARAMS = {'w': jnp.asarray([[1.0, -2.0], [0.5, 3.0]]),
          'b': jnp.asarray([0.1, -0.1])}


def _grads(scale, poison=None):
    g = {'w': jnp.full((2, 2), 0.3) * scale,
         'b': jnp.full((2,), -0.2) * scale}
    if poison is not None:
        g = dict(g, b=g['b'].at[0].set(poison))
    return g


def _step_both(tx_a, tx_b, state_a, state_b, grads):
    up_a, state_a = tx_a.update(grads, state_a, PARAMS)
    up_b, state_b = tx_b.update(grads, state_b, PARAMS)
    return (up_a, state_a), (up_b, state_b)


@pytest.mark.parametrize('poison', [np.nan, np.inf])
def test_matches_optax_through_poisoned_sequence(poison):
    inner = optax.chain(optax.clip_by_global_norm(1.0),
                        optax.adam(1e-3))
    ours = masked_apply_if_finite(inner, max_consecutive_errors=2)
    ref = optax.apply_if_finite(inner, max_consecutive_errors=2)

    s_ours = ours.init(PARAMS)
    s_ref = ref.init(PARAMS)
    # finite, poisoned, finite, poison x3 (exceeds max=2 -> accepted)
    sequence = [_grads(1.0), _grads(1.0, poison), _grads(0.5),
                _grads(1.0, poison), _grads(1.0, poison),
                _grads(1.0, poison), _grads(1.0, poison)]
    for i, grads in enumerate(sequence):
        (u_o, s_ours), (u_r, s_ref) = _step_both(
            ours, ref, s_ours, s_ref, grads)
        for k in PARAMS:
            # ULP-tight, not bit-equal: optax's branch executes inside
            # a compiled lax.cond whose fusion can reassociate floats.
            np.testing.assert_allclose(
                np.asarray(u_o[k]), np.asarray(u_r[k]),
                rtol=1e-6, atol=1e-9,
                err_msg='updates diverge at step {} key {}'.format(i, k))
        assert int(s_ours.notfinite_count) == int(s_ref.notfinite_count)
        assert bool(s_ours.last_finite) == bool(s_ref.last_finite)
        assert int(s_ours.total_notfinite) == int(s_ref.total_notfinite)
        for ls, lr in zip(jax.tree.leaves(s_ours.inner_state),
                          jax.tree.leaves(s_ref.inner_state)):
            np.testing.assert_allclose(
                np.asarray(ls), np.asarray(lr), rtol=1e-6, atol=1e-9,
                err_msg='inner state diverges at step {}'.format(i))


def test_rejected_step_zeroes_updates_and_freezes_state():
    inner = optax.adam(1e-3)
    ours = masked_apply_if_finite(inner, max_consecutive_errors=50)
    state = ours.init(PARAMS)
    _, state = ours.update(_grads(1.0), state, PARAMS)
    before = jax.tree.leaves(state.inner_state)

    updates, state = ours.update(_grads(1.0, np.nan), state, PARAMS)
    for leaf in jax.tree.leaves(updates):
        assert np.all(np.asarray(leaf) == 0.0)
    for leaf in jax.tree.leaves(updates):
        assert np.all(np.isfinite(np.asarray(leaf)))
    after = jax.tree.leaves(state.inner_state)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert int(state.notfinite_count) == 1


def test_state_structure_matches_optax_for_checkpoints():
    inner = optax.adam(1e-3)
    ours = masked_apply_if_finite(inner, 50).init(PARAMS)
    ref = optax.apply_if_finite(inner, 50).init(PARAMS)
    assert (jax.tree.structure(ours) == jax.tree.structure(ref))
