"""TF OD-API checkpoint converter tests.

Synthesizes a real checkpoint-V2 bundle (SSTable index + raw data shard,
written from scratch below — no TensorFlow in the environment) carrying
slim-named ResNet variables, then exercises the from-scratch reader, the
slim->ours name map, and the full convert->NPZ->dual-tower load chain.
Ref contract: src/monopsr/core/checkpoint_utils.py:64-117.
"""

import struct

import jax
import numpy as np
import pytest

from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet
from monopsr_tpu.tools import convert_tf_resnet as ctr
from monopsr_tpu.train import pretrained
from tests.test_model import TINY_CFG, make_batch


# ---------------------------------------------------------------------------
# Minimal TF bundle writer (test-only): one data shard, one SSTable block,
# no prefix compression, zeroed CRCs (the reader does not verify them).
# ---------------------------------------------------------------------------

def _varint(value):
    out = bytearray()
    while True:
        byte = value & 0x7f
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _proto_field(number, wire, payload):
    tag = _varint((number << 3) | wire)
    if wire == 0:
        return tag + _varint(payload)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    if wire == 5:
        return tag + struct.pack('<I', payload)
    raise ValueError(wire)


_NP_TO_DT = {np.dtype('float32'): 1, np.dtype('float64'): 2,
             np.dtype('int32'): 3, np.dtype('int64'): 9}


def _bundle_entry_proto(array, offset):
    shape_msg = b''.join(
        _proto_field(2, 2, _proto_field(1, 0, dim)) for dim in array.shape)
    return (_proto_field(1, 0, _NP_TO_DT[array.dtype]) +
            _proto_field(2, 2, shape_msg) +
            _proto_field(4, 0, offset) +
            _proto_field(5, 0, array.nbytes) +
            _proto_field(6, 5, 0))


def _sstable_block(entries):
    """entries: sorted (key_bytes, value_bytes) list -> block bytes."""
    body = bytearray()
    restarts = []
    for key, value in entries:
        restarts.append(len(body))
        body += _varint(0) + _varint(len(key)) + _varint(len(value))
        body += key + value
    for r in restarts:
        body += struct.pack('<I', r)
    body += struct.pack('<I', len(restarts))
    return bytes(body)


def write_test_checkpoint(prefix, tensors):
    """Writes <prefix>.index / <prefix>.data-00000-of-00001."""
    data = bytearray()
    index_entries = [(b'', _proto_field(1, 0, 1))]  # header: num_shards=1
    for name in sorted(tensors):
        array = np.ascontiguousarray(tensors[name])
        index_entries.append(
            (name.encode(), _bundle_entry_proto(array, len(data))))
        data += array.tobytes()

    data_block = _sstable_block(index_entries)
    file_bytes = bytearray()
    file_bytes += data_block + b'\x00' + struct.pack('<I', 0)

    meta_offset = len(file_bytes)
    meta_block = _sstable_block([])
    file_bytes += meta_block + b'\x00' + struct.pack('<I', 0)

    index_offset = len(file_bytes)
    handle = _varint(0) + _varint(len(data_block))
    index_block = _sstable_block([(index_entries[-1][0] + b'\xff', handle)])
    file_bytes += index_block + b'\x00' + struct.pack('<I', 0)

    footer = (_varint(meta_offset) + _varint(len(meta_block)) +
              _varint(index_offset) + _varint(len(index_block)))
    footer += b'\x00' * (40 - len(footer))
    footer += struct.pack('<Q', ctr._SSTABLE_MAGIC)
    file_bytes += footer

    with open(prefix + '.index', 'wb') as f:
        f.write(file_bytes)
    with open(prefix + '.data-00000-of-00001', 'wb') as f:
        f.write(data)


# ---------------------------------------------------------------------------
# Reader round-trip
# ---------------------------------------------------------------------------

def test_bundle_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        'a/weights': rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
        'b/gamma': rng.normal(size=(16,)).astype(np.float32),
        'global_step': np.asarray([7], np.int64),
        'z/bias': rng.normal(size=(2, 5)).astype(np.float64),
    }
    prefix = str(tmp_path / 'model.ckpt')
    write_test_checkpoint(prefix, tensors)

    reader = ctr.BundleReader(prefix)
    assert set(reader.variable_names()) == set(tensors)
    for name, want in tensors.items():
        got = reader.get_tensor(name)
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Name mapping
# ---------------------------------------------------------------------------

def test_map_slim_names():
    fse = 'FirstStageFeatureExtractor/resnet_v1_101/'
    assert ctr.map_slim_name(fse + 'conv1/weights') == 'conv1/kernel'
    assert (ctr.map_slim_name(fse + 'conv1/BatchNorm/gamma')
            == 'conv1_bn/scale')
    assert (ctr.map_slim_name(fse + 'conv1/BatchNorm/moving_variance')
            == 'conv1_bn/var')
    assert (ctr.map_slim_name(
        fse + 'block1/unit_2/bottleneck_v1/conv3/weights')
        == 'block1_unit2/conv3/kernel')
    assert (ctr.map_slim_name(
        fse + 'block3/unit_23/bottleneck_v1/conv2/BatchNorm/moving_mean')
        == 'block3_unit23/bn2/mean')
    assert (ctr.map_slim_name(
        fse + 'block1/unit_1/bottleneck_v1/shortcut/weights')
        == 'block1_unit1/shortcut/kernel')
    assert (ctr.map_slim_name(
        fse + 'block1/unit_1/bottleneck_v1/shortcut/BatchNorm/beta')
        == 'block1_unit1/shortcut_bn/bias')
    # Plain root scope (standalone slim checkpoints)
    assert ctr.map_slim_name('resnet_v1_101/conv1/weights') == 'conv1/kernel'
    # Non-trunk variables are dropped
    assert ctr.map_slim_name('global_step') is None
    assert ctr.map_slim_name(
        'FirstStageBoxPredictor/BoxEncodingPredictor/weights') is None
    assert ctr.map_slim_name(fse + 'conv1/weights/Momentum') is None
    assert ctr.map_slim_name(
        'SecondStageFeatureExtractor/resnet_v1_101/block4/unit_1/'
        'bottleneck_v1/conv1/weights') == 'block4_unit1/conv1/kernel'


def _tiny_slim_tensors(rng):
    """slim-named trunk variables shaped for RESNET_SPECS['resnet_tiny']."""
    spec = ((1, 4), (1, 8), (1, 16))
    fse = 'FirstStageFeatureExtractor/resnet_v1_101/'
    tensors = {}

    def add_bn(scope, features):
        for leaf in ('gamma', 'beta', 'moving_mean', 'moving_variance'):
            tensors[scope + '/BatchNorm/' + leaf] = (
                rng.normal(size=(features,)).astype(np.float32))

    tensors[fse + 'conv1/weights'] = (
        rng.normal(size=(7, 7, 3, 64)).astype(np.float32))
    add_bn(fse + 'conv1', 64)

    depth_in = 64
    for block_idx, (num_units, db) in enumerate(spec):
        depth = db * 4
        for unit in range(1, num_units + 1):
            scope = fse + 'block{}/unit_{}/bottleneck_v1/'.format(
                block_idx + 1, unit)
            tensors[scope + 'conv1/weights'] = (
                rng.normal(size=(1, 1, depth_in, db)).astype(np.float32))
            add_bn(scope + 'conv1', db)
            tensors[scope + 'conv2/weights'] = (
                rng.normal(size=(3, 3, db, db)).astype(np.float32))
            add_bn(scope + 'conv2', db)
            tensors[scope + 'conv3/weights'] = (
                rng.normal(size=(1, 1, db, depth)).astype(np.float32))
            add_bn(scope + 'conv3', depth)
            if depth_in != depth:
                tensors[scope + 'shortcut/weights'] = (
                    rng.normal(size=(1, 1, depth_in, depth))
                    .astype(np.float32))
                add_bn(scope + 'shortcut', depth)
            depth_in = depth
    # Distractors the converter must skip
    tensors['global_step'] = np.asarray([142000], np.int64)
    tensors[fse + 'conv1/weights/Momentum'] = np.zeros((7, 7, 3, 64),
                                                       np.float32)
    return tensors


def test_convert_checkpoint_end_to_end(tmp_path):
    """checkpoint -> convert -> NPZ -> both towers of a real model."""
    rng = np.random.default_rng(1)
    tensors = _tiny_slim_tensors(rng)
    prefix = str(tmp_path / 'model.ckpt')
    write_test_checkpoint(prefix, tensors)

    converted = ctr.convert_checkpoint(prefix)
    assert 'conv1/kernel' in converted
    assert 'block3_unit1/bn2/mean' in converted
    assert not any(k.startswith('block4') for k in converted)
    fse = 'FirstStageFeatureExtractor/resnet_v1_101/'
    np.testing.assert_array_equal(converted['conv1/kernel'],
                                  tensors[fse + 'conv1/weights'])

    npz_path = str(tmp_path / 'trunk.npz')
    np.savez(npz_path, **converted)

    cfg = TINY_CFG
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    variables = jax.jit(
        lambda b: net.init(jax.random.PRNGKey(0),
                           **monopsr.net_inputs_from_batch(b),
                           train=False))(batch)
    params = pretrained._to_mutable(jax.device_get(variables['params']))
    stats = pretrained._to_mutable(jax.device_get(variables['batch_stats']))

    n_params = pretrained.load_npz_into_towers(params, npz_path)
    n_stats = pretrained.load_npz_into_towers(stats, npz_path)
    assert n_params > 0 and n_stats > 0

    for tower in ('tower_crop', 'tower_full'):
        np.testing.assert_allclose(
            np.asarray(params['backbone'][tower]['conv1']['kernel']),
            tensors[fse + 'conv1/weights'], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(stats['backbone'][tower]['block1_unit1']
                       ['bn1']['mean']),
            tensors[fse + 'block1/unit_1/bottleneck_v1/conv1/'
                    'BatchNorm/moving_mean'], atol=1e-6)


def test_reader_rejects_bad_magic(tmp_path):
    path = str(tmp_path / 'junk.ckpt')
    with open(path + '.index', 'wb') as f:
        f.write(b'\x00' * 64)
    with pytest.raises(ValueError):
        ctr.BundleReader(path)
