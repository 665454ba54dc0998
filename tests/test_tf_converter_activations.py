"""Activation-parity golden test for the TF checkpoint converter.

The AP-parity contract hinges on the pretrained init: the reference
restores a slim ResNet trunk into both towers
(ref: src/monopsr/core/checkpoint_utils.py:64-117) and its numerics
flow through slim's conv2d_same padding, frozen batch norm, and
stack_blocks_dense atrous semantics
(ref: src/object_detection/nets/resnet_utils.py:126-272,
resnet_v1.py:142-258). This test validates the WHOLE converted-weights
path end to end against an independent NumPy re-derivation of those
slim semantics (plain loops + explicit padding — no code shared with
monopsr_tpu.models.resnet), plus a checked-in golden activation so the
two implementations cannot drift together unnoticed:

    TF-format checkpoint bytes (synthetic, seeded)
      -> tools/convert_tf_resnet.convert_checkpoint -> NPZ
      -> pretrained.load_npz_into_towers -> ResNetV1.apply
      == NumPy slim oracle on the same checkpoint tensors
      == tests/golden/tf_converter_block3.npz (recorded)

No TF runs in this environment; the oracle is derived from the slim
sources cited above rather than executed TF, and the golden pins it.
"""

import os

import numpy as np
import pytest

import jax

from monopsr_tpu.models.resnet import ResNetV1
from monopsr_tpu.tools import convert_tf_resnet as ctr
from monopsr_tpu.train import pretrained

from test_tf_converter import write_test_checkpoint

SPEC = ((1, 4), (2, 8), (2, 16))
BN_EPS = 1e-5
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'golden', 'tf_converter_block3.npz')


# --------------------------------------------------------------------------
# Independent NumPy slim-ResNet oracle (float64, loop convs)
# --------------------------------------------------------------------------

def _valid_conv(x, w, stride):
    """VALID conv, x (H, W, Cin), w (kh, kw, Cin, Cout)."""
    h, width, _ = x.shape
    kh, kw, _, cout = w.shape
    oh = (h - kh) // stride + 1
    ow = (width - kw) // stride + 1
    out = np.zeros((oh, ow, cout))
    for i in range(kh):
        for j in range(kw):
            patch = x[i:i + (oh - 1) * stride + 1:stride,
                      j:j + (ow - 1) * stride + 1:stride]
            out += patch @ w[i, j]
    return out


def _dilate_kernel(w, rate):
    if rate == 1:
        return w
    kh, kw = w.shape[:2]
    out = np.zeros(((kh - 1) * rate + 1, (kw - 1) * rate + 1) + w.shape[2:])
    out[::rate, ::rate] = w
    return out


def _conv2d_same(x, w, stride, rate):
    """slim conv2d_same: fixed (k_eff-1)//2 padding then VALID
    (ref: resnet_utils.py conv2d_same; equals TF SAME at stride 1)."""
    w = _dilate_kernel(w, rate)
    k_eff = w.shape[0]
    pad_total = k_eff - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    x = np.pad(x, ((pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
    return _valid_conv(x, w, stride)


def _max_pool_same(x, k, stride):
    """TF SAME max pool (pads with -inf)."""
    h, width, _ = x.shape
    oh = -(-h // stride)
    ow = -(-width // stride)
    pad_h = max((oh - 1) * stride + k - h, 0)
    pad_w = max((ow - 1) * stride + k - width, 0)
    x = np.pad(x, ((pad_h // 2, pad_h - pad_h // 2),
                   (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
               constant_values=-np.inf)
    out = np.full((oh, ow, x.shape[2]), -np.inf)
    for i in range(k):
        for j in range(k):
            out = np.maximum(
                out, x[i:i + (oh - 1) * stride + 1:stride,
                       j:j + (ow - 1) * stride + 1:stride])
    return out


def _bn(x, tensors, scope):
    gamma = tensors[scope + '/BatchNorm/gamma']
    beta = tensors[scope + '/BatchNorm/beta']
    mean = tensors[scope + '/BatchNorm/moving_mean']
    var = tensors[scope + '/BatchNorm/moving_variance']
    return (x - mean) / np.sqrt(var + BN_EPS) * gamma + beta


def _oracle_block3(tensors, image):
    """slim resnet trunk through block3 at output_stride 4, NumPy."""
    fse = 'FirstStageFeatureExtractor/resnet_v1_101/'
    x = image.astype(np.float64)

    x = _conv2d_same(x, tensors[fse + 'conv1/weights'], 2, 1)
    x = np.maximum(_bn(x, tensors, fse + 'conv1'), 0.0)
    x = _max_pool_same(x, 3, 2)

    current_stride, rate = 4, 1
    output_stride = 4
    depth_in = x.shape[-1]
    for block_idx, (num_units, db) in enumerate(SPEC):
        depth = db * 4
        for unit in range(1, num_units + 1):
            nominal = 2 if unit == num_units else 1
            if current_stride == output_stride:
                unit_stride, unit_rate = 1, rate
                rate *= nominal
            else:
                unit_stride, unit_rate = nominal, 1
                current_stride *= nominal

            scope = fse + 'block{}/unit_{}/bottleneck_v1/'.format(
                block_idx + 1, unit)
            if depth_in == depth:
                shortcut = (x if unit_stride == 1
                            else x[::unit_stride, ::unit_stride])
            else:
                shortcut = _valid_conv(
                    x, tensors[scope + 'shortcut/weights'], unit_stride)
                shortcut = _bn(shortcut, tensors, scope + 'shortcut')

            y = _valid_conv(x, tensors[scope + 'conv1/weights'], 1)
            y = np.maximum(_bn(y, tensors, scope + 'conv1'), 0.0)
            y = _conv2d_same(y, tensors[scope + 'conv2/weights'],
                             unit_stride, unit_rate)
            y = np.maximum(_bn(y, tensors, scope + 'conv2'), 0.0)
            y = _valid_conv(y, tensors[scope + 'conv3/weights'], 1)
            y = _bn(y, tensors, scope + 'conv3')

            x = np.maximum(shortcut + y, 0.0)
            depth_in = depth
    return x


def _slim_tensors(rng):
    """Realistic slim trunk tensors for SPEC (nonzero BN stats)."""
    fse = 'FirstStageFeatureExtractor/resnet_v1_101/'
    tensors = {}

    def add_bn(scope, features):
        tensors[scope + '/BatchNorm/gamma'] = rng.uniform(
            0.8, 1.2, features).astype(np.float32)
        tensors[scope + '/BatchNorm/beta'] = (
            rng.normal(0, 0.1, features).astype(np.float32))
        tensors[scope + '/BatchNorm/moving_mean'] = (
            rng.normal(0, 0.2, features).astype(np.float32))
        tensors[scope + '/BatchNorm/moving_variance'] = rng.uniform(
            0.5, 1.5, features).astype(np.float32)

    def add_conv(scope, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        tensors[scope + '/weights'] = (
            rng.normal(0, 1.0 / np.sqrt(fan_in), shape).astype(np.float32))

    add_conv(fse + 'conv1', (7, 7, 3, 64))
    add_bn(fse + 'conv1', 64)
    depth_in = 64
    for block_idx, (num_units, db) in enumerate(SPEC):
        depth = db * 4
        for unit in range(1, num_units + 1):
            scope = fse + 'block{}/unit_{}/bottleneck_v1/'.format(
                block_idx + 1, unit)
            add_conv(scope + 'conv1', (1, 1, depth_in, db))
            add_bn(scope + 'conv1', db)
            add_conv(scope + 'conv2', (3, 3, db, db))
            add_bn(scope + 'conv2', db)
            add_conv(scope + 'conv3', (1, 1, db, depth))
            add_bn(scope + 'conv3', depth)
            if depth_in != depth:
                add_conv(scope + 'shortcut', (1, 1, depth_in, depth))
                add_bn(scope + 'shortcut', depth)
            depth_in = depth
    return tensors


def _converted_tower_output(tmp_path, tensors, image, use_phase_space):
    """checkpoint bytes -> converter -> loader -> ResNetV1 block3."""
    prefix = str(tmp_path / 'model.ckpt')
    write_test_checkpoint(prefix, tensors)
    npz_path = str(tmp_path / 'trunk.npz')
    np.savez(npz_path, **ctr.convert_checkpoint(prefix))

    tower = ResNetV1(spec=SPEC, output_stride=4, dtype=np.float32,
                     use_phase_space=use_phase_space)
    variables = jax.jit(tower.init)(jax.random.PRNGKey(0), image[None])
    params = pretrained._to_mutable(jax.device_get(variables['params']))
    stats = pretrained._to_mutable(
        jax.device_get(variables['batch_stats']))

    # The dual-tower loader operates on the full-model layout; wrap the
    # bare tower so both remap targets are exercised.
    wrapped_p = {'backbone': {'tower_crop': params, 'tower_full': params}}
    wrapped_s = {'backbone': {'tower_crop': stats, 'tower_full': stats}}
    n_p = pretrained.load_npz_into_towers(wrapped_p, npz_path)
    n_s = pretrained.load_npz_into_towers(wrapped_s, npz_path)
    n_conv = sum(1 for k in tensors if k.endswith('/weights'))
    n_bn = sum(1 for k in tensors if '/BatchNorm/' in k)
    assert n_p == 2 * (n_conv + n_bn // 2)   # kernels + gamma/beta
    assert n_s == 2 * (n_bn // 2)            # mean/var

    out = jax.jit(tower.apply)(
        {'params': wrapped_p['backbone']['tower_crop'],
         'batch_stats': wrapped_s['backbone']['tower_crop']},
        image[None])
    return np.asarray(out[0], np.float64)


@pytest.mark.parametrize('use_phase_space', [True, False])
def test_converted_weights_reproduce_slim_activations(
        tmp_path, use_phase_space):
    rng = np.random.default_rng(7)
    tensors = _slim_tensors(rng)
    # Odd spatial dims exercise the SAME/fixed padding edge semantics
    image = rng.normal(0, 1, (21, 29, 3)).astype(np.float32)

    got = _converted_tower_output(tmp_path, tensors, image,
                                  use_phase_space)
    want = _oracle_block3(tensors, image)

    assert got.shape == want.shape
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


def test_converted_activations_match_checked_in_golden(tmp_path):
    """Pins the numbers: both the oracle and the model must reproduce
    the recorded golden (regenerate with
    `python tests/test_tf_converter_activations.py regen`)."""
    rng = np.random.default_rng(7)
    tensors = _slim_tensors(rng)
    image = rng.normal(0, 1, (21, 29, 3)).astype(np.float32)

    golden = np.load(GOLDEN)['block3']
    want = _oracle_block3(tensors, image)
    np.testing.assert_allclose(want, golden, atol=1e-6)

    got = _converted_tower_output(tmp_path, tensors, image, True)
    scale = np.maximum(np.abs(golden), 1.0)
    np.testing.assert_allclose(got / scale, golden / scale, atol=2e-4)


if __name__ == '__main__':
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == 'regen':
        rng = np.random.default_rng(7)
        tensors = _slim_tensors(rng)
        image = rng.normal(0, 1, (21, 29, 3)).astype(np.float32)
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, block3=_oracle_block3(tensors, image))
        print('wrote', GOLDEN)
