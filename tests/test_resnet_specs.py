"""Topology tests for every shipped ResNet spec.

Round-2 verdict: a typo in RESNET_SPECS['resnet152'] survived a full
round because non-default specs were never constructed. This test pins
every spec against the canonical He et al. table (independently stated
here, ref: src/object_detection/nets/resnet_v1.py:281-373) and checks
the constructed parameter tree against a closed-form parameter count,
so a wrong unit count or bottleneck depth fails immediately.
"""

import jax
import jax.numpy as jnp
import pytest

from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1

# Canonical (num_units, bottleneck_depth) per block — He et al. 2015
# Table 1, as used by slim resnet_v1_{50,101,152}
# (ref: src/object_detection/nets/resnet_v1.py:281-373).
CANONICAL = {
    'resnet50': ((3, 64), (4, 128), (6, 256), (3, 512)),
    'resnet101': ((3, 64), (4, 128), (23, 256), (3, 512)),
    'resnet152': ((3, 64), (8, 128), (36, 256), (3, 512)),
}


def _expected_param_count(spec, num_blocks):
    """Closed-form trainable-parameter count for the trunk.

    Counts conv kernels plus BN scale/bias (FrozenBatchNorm stores
    moving stats in a separate collection, not counted here).
    """
    def bn(features):
        return 2 * features  # scale + bias

    total = 7 * 7 * 3 * 64 + bn(64)  # root conv + bn
    depth_in = 64
    for num_units, db in spec[:num_blocks]:
        depth = 4 * db
        for _ in range(num_units):
            if depth_in != depth:
                total += depth_in * depth + bn(depth)  # projection shortcut
            total += depth_in * db + bn(db)           # conv1 1x1
            total += 3 * 3 * db * db + bn(db)         # conv2 3x3
            total += db * depth + bn(depth)           # conv3 1x1
            depth_in = depth
    return total


@pytest.mark.parametrize('name', sorted(CANONICAL))
def test_spec_matches_canonical_table(name):
    assert RESNET_SPECS[name] == CANONICAL[name], (
        f'{name} spec drifted from the canonical He et al. topology')


@pytest.mark.parametrize('name', sorted(CANONICAL))
@pytest.mark.parametrize('num_blocks', [3, 4])
def test_constructed_param_count(name, num_blocks):
    model = ResNetV1(spec=RESNET_SPECS[name], output_stride=4,
                     num_blocks=num_blocks, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    # eval_shape: builds the full variable tree without running compute,
    # so even resnet152/4-block stays fast on the CI host.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n_params = sum(
        int(jnp.prod(jnp.array(leaf.shape)))
        for leaf in jax.tree_util.tree_leaves(shapes['params']))
    assert n_params == _expected_param_count(RESNET_SPECS[name], num_blocks)

    # Unit counts per block, straight off the variable tree names
    for block_idx, (num_units, _) in enumerate(
            RESNET_SPECS[name][:num_blocks]):
        units = [k for k in shapes['params']
                 if k.startswith(f'block{block_idx + 1}_unit')]
        assert len(units) == num_units, (
            f'{name} block{block_idx + 1}: {len(units)} units constructed, '
            f'spec says {num_units}')


def test_space_to_batch_atrous_conv_matches_dilated():
    """The space-to-batch path of _conv_same must be numerically
    identical to the plain dilated SAME conv, including non-divisible
    spatial sizes (pad+crop edges)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monopsr_tpu.models import resnet as resnet_lib

    class ConvSame(nn.Module):
        rate: int

        @nn.compact
        def __call__(self, x):
            return resnet_lib._conv_same(
                x, 8, 3, 1, self.rate, jnp.float32, 'conv')

    rng = np.random.RandomState(0)
    for rate, shape in ((2, (2, 13, 17, 5)), (3, (1, 9, 16, 4)),
                        (4, (2, 12, 12, 6)), (4, (1, 10, 41, 3))):
        x = rng.randn(*shape).astype(np.float32)
        module = ConvSame(rate=rate)
        variables = module.init(jax.random.PRNGKey(0), x)
        got = module.apply(variables, x)

        kernel = variables['params']['conv']['kernel']
        want = jax.lax.conv_general_dilated(
            x, np.asarray(kernel), (1, 1), 'SAME',
            rhs_dilation=(rate, rate),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg='rate %d shape %r' % (rate, shape))


def test_phase_space_blocks_match_per_conv_dilation():
    """Block-level space-to-batch execution of atrous runs must equal
    the per-conv path on the same parameters (float32, both tower
    input shapes)."""
    import numpy as np

    rng = np.random.RandomState(1)
    for shape in ((2, 48, 48, 3), (1, 64, 96, 3)):
        x = rng.randn(*shape).astype(np.float32)
        phase = ResNetV1(spec=RESNET_SPECS['resnet_tiny'], output_stride=4,
                         dtype=jnp.float32, use_phase_space=True)
        flat = ResNetV1(spec=RESNET_SPECS['resnet_tiny'], output_stride=4,
                        dtype=jnp.float32, use_phase_space=False)
        variables = phase.init(jax.random.PRNGKey(0), x)
        got = phase.apply(variables, x)
        want = flat.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=str(shape))


def test_remat_matches_plain_values_and_grads():
    """remat=True must change neither the parameter tree, the forward
    values, nor the gradients — it only changes what the backward pass
    stores vs recomputes."""
    import numpy as np

    rng = np.random.RandomState(2)
    x = rng.randn(2, 48, 48, 3).astype(np.float32)

    plain = ResNetV1(spec=RESNET_SPECS['resnet_tiny'], output_stride=4,
                     dtype=jnp.float32, remat=False)
    remat = ResNetV1(spec=RESNET_SPECS['resnet_tiny'], output_stride=4,
                     dtype=jnp.float32, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(remat.init(
        jax.random.PRNGKey(0), x)) ==
        jax.tree_util.tree_structure(variables))

    def loss(module):
        def fn(params):
            y = module.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']}, x)
            return jnp.sum(y ** 2)
        return jax.jit(jax.value_and_grad(fn))

    v_plain, g_plain = loss(plain)(variables['params'])
    v_remat, g_remat = loss(remat)(variables['params'])
    np.testing.assert_allclose(float(v_plain), float(v_remat),
                               rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_plain),
            jax.tree_util.tree_leaves_with_path(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=str(kp))
