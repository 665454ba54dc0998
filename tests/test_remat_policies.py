"""Remat is a scheduling choice, never a numerics choice.

ResNetV1.remat_policy ('unit' = whole-bottleneck recompute,
'conv_outs' = keep conv outputs, recompute the elementwise tail) must
produce the same forward values and parameter gradients as no remat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1


def _tower(remat, policy='unit'):
    return ResNetV1(spec=RESNET_SPECS['resnet_tiny'], output_stride=4,
                    num_blocks=3, dtype=jnp.float32, remat=remat,
                    remat_policy=policy)


@pytest.mark.parametrize('policy', ['unit', 'conv_outs'])
def test_remat_policy_matches_no_remat(policy):
    x = jnp.asarray(
        np.random.RandomState(0).normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    base = _tower(remat=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), x)

    def loss(model, params):
        out = model.apply({'params': params,
                           'batch_stats': variables['batch_stats']}, x)
        return jnp.sum(out * out)

    val0, grad0 = jax.jit(jax.value_and_grad(
        lambda p: loss(base, p)))(variables['params'])
    rem = _tower(remat=True, policy=policy)
    val1, grad1 = jax.jit(jax.value_and_grad(
        lambda p: loss(rem, p)))(variables['params'])

    np.testing.assert_allclose(float(val0), float(val1), rtol=1e-6)
    for g0, g1 in zip(jax.tree.leaves(grad0), jax.tree.leaves(grad1)):
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-5, atol=1e-6)


def test_unknown_policy_falls_back_to_unit():
    # Constructing with an unknown policy string behaves as 'unit'
    # (the else branch) rather than erroring at trace time.
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    tower = _tower(remat=True, policy='unit')
    variables = jax.jit(tower.init)(jax.random.PRNGKey(0), x)
    out = tower.apply(variables, x)
    assert out.shape == (1, 4, 4, 64)
