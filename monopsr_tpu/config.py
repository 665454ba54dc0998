"""YAML experiment configuration.

Parses the same YAML schema as the reference's canonical config
(ref: src/monopsr/configs/monopsr_model_000.yaml, parsed by
src/monopsr/core/config_utils.py:8-85): nested maps become attribute
namespaces, duplicate keys are rejected, and the experiment identity is
the config file basename. Output locations derive from
`data/outputs/<config_name>/`.
"""

import os
import shutil
import time

import yaml

import monopsr_tpu


class ConfigObj:
    """A plain attribute namespace built from a nested dict.

    Nested dicts become nested ConfigObj instances; lists and scalars are
    stored as-is. Attribute access on a missing key raises AttributeError
    (same contract as the reference's anonymous config objects).
    """

    def __init__(self, entries=None):
        if entries:
            for key, value in entries.items():
                setattr(self, key, _convert(value))

    def __repr__(self):
        return 'ConfigObj({})'.format(self.__dict__)

    def __eq__(self, other):
        if not isinstance(other, ConfigObj):
            return NotImplemented
        return self.__dict__ == other.__dict__

    def get(self, key, default=None):
        return self.__dict__.get(key, default)

    def to_dict(self):
        out = {}
        for key, value in self.__dict__.items():
            out[key] = value.to_dict() if isinstance(value, ConfigObj) else value
        return out


def _convert(value):
    if isinstance(value, dict):
        return ConfigObj(value)
    return value


class _StrictLoader(yaml.SafeLoader):
    """SafeLoader that rejects duplicate mapping keys.

    Matches the duplicate-key check of the reference loader
    (ref: src/monopsr/core/config_utils.py:34-47).
    """


def _no_duplicates_constructor(loader, node, deep=False):
    mapping = {}
    for key_node, value_node in node.value:
        key = loader.construct_object(key_node, deep=deep)
        if key in mapping:
            raise yaml.constructor.ConstructorError(
                'while constructing a mapping', node.start_mark,
                'found duplicate key ({})'.format(key), key_node.start_mark)
        mapping[key] = loader.construct_object(value_node, deep=deep)
    return mapping


_StrictLoader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _no_duplicates_constructor)


def load_yaml(path):
    with open(path, 'r') as f:
        return yaml.load(f, Loader=_StrictLoader)


def parse_yaml_config(yaml_path, output_base_dir=None):
    """Parses a YAML config file into a ConfigObj and derives output paths.

    Args:
        yaml_path: path to the YAML config file.
        output_base_dir: optional override for the outputs root
            (defaults to <repo>/data/outputs).

    Returns:
        config: ConfigObj with `dataset_config`, `model_config`,
            `train_config` sections plus derived fields:
            `config_name`, `exp_output_dir`, `checkpoint_dir`, `logdir`,
            `pred_dir`.
    """
    raw = load_yaml(yaml_path)
    config = ConfigObj(raw)

    config_name = os.path.splitext(os.path.basename(yaml_path))[0]
    config.config_name = config_name

    if output_base_dir is None:
        output_base_dir = os.path.join(monopsr_tpu.data_dir(), 'outputs')

    exp_output_dir = os.path.join(output_base_dir, config_name)
    config.exp_output_dir = exp_output_dir
    config.checkpoint_dir = os.path.join(exp_output_dir, 'checkpoints')
    config.logdir = os.path.join(exp_output_dir, 'logs')
    config.pred_dir = os.path.join(exp_output_dir, 'predictions')

    # Checkpoint name matches the config name (reference contract)
    config.checkpoint_name = config_name

    return config


def copy_config_into_experiment_dir(yaml_path, config):
    """Freezes the config into the experiment dir, backing up on drift.

    Mirrors the config drift detection of the reference
    (ref: src/monopsr/experiments/run_training.py:52-66): if a config copy
    exists and differs from the current file, the old one is backed up with
    a timestamp before being replaced.
    """
    os.makedirs(config.exp_output_dir, exist_ok=True)
    dst = os.path.join(config.exp_output_dir, os.path.basename(yaml_path))

    if os.path.exists(dst):
        with open(yaml_path, 'rb') as f_new, open(dst, 'rb') as f_old:
            if f_new.read() != f_old.read():
                backup = dst + '.bak.{}'.format(int(time.time()))
                shutil.move(dst, backup)
                shutil.copyfile(yaml_path, dst)
    else:
        shutil.copyfile(yaml_path, dst)

    return dst
