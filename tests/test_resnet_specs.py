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
