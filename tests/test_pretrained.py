"""Pretrained-weight conversion + dual-tower remap loading tests."""


import jax
import numpy as np

from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet
from monopsr_tpu.tools.convert_torch_resnet import convert_state_dict
from monopsr_tpu.train import pretrained
from tests.test_model import TINY_CFG, make_batch


def test_convert_torch_naming():
    fake = {
        'conv1.weight': np.zeros((64, 3, 7, 7), np.float32),
        'bn1.weight': np.ones(64, np.float32),
        'bn1.running_mean': np.zeros(64, np.float32),
        'layer1.0.conv2.weight': np.zeros((4, 4, 3, 3), np.float32),
        'layer1.0.bn3.running_var': np.ones(16, np.float32),
        'layer1.0.downsample.0.weight':
            np.zeros((16, 4, 1, 1), np.float32),
        'layer1.0.downsample.1.bias': np.zeros(16, np.float32),
        'layer3.22.conv1.weight': np.zeros((4, 16, 1, 1), np.float32),
        'fc.weight': np.zeros((1000, 2048), np.float32),  # dropped
    }
    out = convert_state_dict(fake)
    assert out['conv1/kernel'].shape == (7, 7, 3, 64)
    assert 'conv1_bn/scale' in out
    assert 'conv1_bn/mean' in out
    assert out['block1_unit1/conv2/kernel'].shape == (3, 3, 4, 4)
    assert 'block1_unit1/bn3/var' in out
    assert out['block1_unit1/shortcut/kernel'].shape == (1, 1, 4, 16)
    assert 'block1_unit1/shortcut_bn/bias' in out
    assert 'block3_unit23/conv1/kernel' in out
    assert not any('fc' in k for k in out)


def test_npz_loads_into_both_towers(tmp_path):
    cfg = TINY_CFG
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    variables = jax.jit(
        lambda b: net.init(jax.random.PRNGKey(0),
                           **monopsr.net_inputs_from_batch(b),
                           train=False))(batch)
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])

    # Build an NPZ from tower_crop's own weights, shifted by +1
    trunk = params['backbone']['tower_crop']
    trunk_stats = stats['backbone']['tower_crop']

    npz = {}

    def collect(tree, prefix):
        for key, value in tree.items():
            if isinstance(value, dict):
                collect(value, prefix + key + '/')
            else:
                npz[prefix + key] = np.asarray(value) + 1.0

    collect(trunk, '')
    collect(trunk_stats, '')
    npz_path = str(tmp_path / 'trunk.npz')
    np.savez(npz_path, **npz)

    mutable_params = pretrained._to_mutable(params)
    mutable_stats = pretrained._to_mutable(stats)
    n_params = pretrained.load_npz_into_towers(mutable_params, npz_path)
    n_stats = pretrained.load_npz_into_towers(mutable_stats, npz_path)
    assert n_params > 0 and n_stats > 0

    # Both towers now carry the shifted trunk
    for tower in ('tower_crop', 'tower_full'):
        got = mutable_params['backbone'][tower]['conv1']['kernel']
        want = np.asarray(params['backbone']['tower_crop']
                          ['conv1']['kernel']) + 1.0
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        got_mean = mutable_stats['backbone'][tower]['conv1_bn']['mean']
        want_mean = np.asarray(stats['backbone']['tower_crop']
                               ['conv1_bn']['mean']) + 1.0
        np.testing.assert_allclose(np.asarray(got_mean), want_mean,
                                   atol=1e-6)


def test_shape_mismatch_raises(tmp_path):
    cfg = TINY_CFG
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    variables = jax.jit(
        lambda b: net.init(jax.random.PRNGKey(0),
                           **monopsr.net_inputs_from_batch(b),
                           train=False))(batch)
    params = pretrained._to_mutable(jax.device_get(variables['params']))

    npz_path = str(tmp_path / 'bad.npz')
    np.savez(npz_path, **{'conv1/kernel': np.zeros((3, 3, 3, 8))})
    import pytest
    with pytest.raises(ValueError):
        pretrained.load_npz_into_towers(params, npz_path)
