"""Pretrained backbone weight loading with dual-tower remapping.

Equivalent of the reference's OD-API checkpoint remap
(ref: src/monopsr/core/checkpoint_utils.py:64-117): one pretrained
ResNet trunk initializes BOTH towers (FirstStageFeatureExtractor_crop
and _full in the reference; backbone/tower_crop and backbone/tower_full
here).

Weights are read from an NPZ of flat 'scope/leaf' arrays under
data/pretrained/<name>.npz (produce it once offline with
tools/convert_tf_resnet.py from a TF OD-API checkpoint). Missing files
fall back to random init with a warning — there is no network access in
CI/TPU pods, so pretrained weights are an optional acceleration, not a
requirement.
"""

import os

import jax.numpy as jnp
import numpy as np

import monopsr_tpu


def _flatten(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = value
    return out


def _set_path(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def load_npz_into_towers(state_dict, npz_path, towers=('tower_crop',
                                                       'tower_full')):
    """Loads trunk weights from an NPZ into every tower.

    Args:
        state_dict: mutable nested dict of params (and batch_stats).
        npz_path: NPZ with keys like 'block1_unit1/conv1/kernel'.
        towers: tower module names under 'backbone'.

    Returns:
        number of arrays loaded.
    """
    data = np.load(npz_path)
    loaded = 0
    flat = _flatten(state_dict)

    for tower in towers:
        for key in data.files:
            parts = ('backbone', tower) + tuple(key.split('/'))
            if parts in flat:
                expected = flat[parts]
                value = data[key]
                if expected.shape != value.shape:
                    raise ValueError(
                        'Shape mismatch for {}: {} vs {}'.format(
                            '/'.join(parts), expected.shape, value.shape))
                _set_path(state_dict, parts,
                          jnp.asarray(value, expected.dtype))
                loaded += 1
    return loaded


def maybe_load_pretrained(state, model_config):
    """Loads pretrained tower weights per the net_config, if available."""
    net_config = getattr(model_config.net_config, model_config.net_type)
    weights_type = net_config.get('pretrained_weights_type')
    if not weights_type or weights_type in ('none', None):
        return state

    name = net_config.get('pretrained_weights_name')
    npz_path = os.path.join(monopsr_tpu.data_dir(), 'pretrained',
                            '{}.npz'.format(name))
    if not os.path.exists(npz_path):
        print('[pretrained] {} not found; training from random init'
              .format(npz_path))
        return state

    import jax
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    mutable = {'params': _to_mutable(params),
               'batch_stats': _to_mutable(batch_stats)}

    n_params = load_npz_into_towers(mutable['params'], npz_path)
    n_stats = load_npz_into_towers(mutable['batch_stats'], npz_path)
    print('[pretrained] loaded {} param / {} stat arrays from {}'.format(
        n_params, n_stats, npz_path))

    state = state.replace(params=mutable['params'],
                          batch_stats=mutable['batch_stats'])
    if state.ema_params is not None:
        state = state.replace(
            ema_params=jax.tree.map(jnp.copy, mutable['params']))
    return state


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
