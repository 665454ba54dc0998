"""Converter name map vs the documented OD-API zoo-checkpoint layout.

VERDICT r4 #4: the pretrained converter had only been exercised against
a synthetic checkpoint whose names the test itself invented — the name
map could drift from the real ``faster_rcnn_resnet101_kitti`` layout
without any test noticing. ``monopsr_tpu.tools.odapi_manifest`` now
encodes that layout explicitly (from the slim resnet_v1 structure,
ref: src/object_detection/nets/resnet_v1.py:310-334, restore scopes
src/monopsr/core/models/monopsr/monopsr_model.py:1258-1263, remap
src/monopsr/core/checkpoint_utils.py:64-117); these tests pin the
converter 1:1 against it:

- every manifest variable maps to an NPZ key, injectively;
- the mapped key set covers EXACTLY the Flax trunk's parameter +
  batch-stats leaves (nothing missing, nothing extra), with shapes
  matching the manifest's;
- the dual-scope model-graph names rewrite onto manifest names 1:1;
- every documented distractor (RPN heads, optimizer slots, block4,
  global_step) is rejected.

Any rename in the converter, the manifest, or the Flax module breaks
the equality.
"""

import re

import jax
import numpy as np
import pytest

from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1
from monopsr_tpu.tools import odapi_manifest
from monopsr_tpu.tools.convert_tf_resnet import map_slim_name


def _flatten(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            # value is an array or a jax.eval_shape ShapeDtypeStruct
            out['/'.join(path)] = tuple(value.shape)
    return out


@pytest.fixture(scope='module')
def manifest():
    return odapi_manifest.trunk_manifest(depth=101)


def test_manifest_size_matches_slim_resnet101_trunk(manifest):
    # conv1 (1 conv + 4 BN leaves) + per-unit (3 convs + 12 BN leaves)
    # + per-block first-unit shortcut (1 conv + 4 BN leaves)
    num_units = sum(n for n, _ in RESNET_SPECS['resnet101'][:3])  # 30
    assert num_units == 30
    expected = 5 + num_units * 15 + 3 * 5
    assert len(manifest) == expected


def test_every_manifest_name_maps_injectively(manifest):
    mapped = {}
    for name in manifest:
        key = map_slim_name(name)
        assert key is not None, 'converter drops zoo variable ' + name
        assert key not in mapped, (
            'converter maps {} and {} to the same key {}'.format(
                mapped[key], name, key))
        mapped[key] = name
    assert len(mapped) == len(manifest)


def test_mapped_keys_cover_flax_trunk_exactly(manifest):
    """Converter output == the Flax tower's loadable leaves, 1:1 + shapes."""
    tower = ResNetV1(spec=RESNET_SPECS['resnet101'], output_stride=4,
                     num_blocks=3)
    variables = jax.eval_shape(
        lambda: tower.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32)))
    flax_leaves = {}
    flax_leaves.update(_flatten(variables['params']))
    flax_leaves.update(_flatten(variables['batch_stats']))

    mapped = {map_slim_name(name): shape
              for name, shape in manifest.items()}
    assert set(mapped) == set(flax_leaves), (
        'missing from converter: {}; extra: {}'.format(
            sorted(set(flax_leaves) - set(mapped))[:5],
            sorted(set(mapped) - set(flax_leaves))[:5]))
    for key, shape in mapped.items():
        assert tuple(shape) == tuple(flax_leaves[key]), (
            '{}: manifest {} vs flax {}'.format(
                key, shape, flax_leaves[key]))


def test_dual_scope_rewrite_is_bijective_onto_manifest(manifest):
    """Model-graph tower names -> checkpoint names, per the reference remap."""
    for tower_scope in odapi_manifest.MODEL_TOWER_SCOPES:
        graph_names = odapi_manifest.trunk_manifest(
            depth=101, scope=tower_scope)
        rewritten = [odapi_manifest.rewrite_model_scope_to_checkpoint(n)
                     for n in graph_names]
        assert sorted(rewritten) == sorted(manifest)
        # And the converter reads the tower-scoped names identically
        # (its scope-stripping regex accepts any prefix before
        # resnet_v1_101/), so a graph-side dump would convert the same.
        for graph_name, ckpt_name in zip(graph_names, rewritten):
            assert map_slim_name(graph_name) == map_slim_name(ckpt_name)


def test_distractors_rejected():
    for name in odapi_manifest.distractor_names(depth=101):
        key = map_slim_name(name)
        if key is not None:
            # block4 maps to a key but is dropped by convert_checkpoint's
            # max_block=3 filter — assert it is indeed a block>3 key.
            m = re.match(r'^block(\d+)_', key)
            assert m and int(m.group(1)) > 3, (
                'distractor {} leaked through as {}'.format(name, key))
