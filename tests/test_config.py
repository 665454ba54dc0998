"""Config-system tests: YAML parsing, strictness, derived paths."""

import os

import pytest

from monopsr_tpu import config as config_utils

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANONICAL = os.path.join(REPO, 'configs', 'monopsr_model_000.yaml')


def test_parse_canonical_config():
    config = config_utils.parse_yaml_config(CANONICAL)
    assert config.config_name == 'monopsr_model_000'
    assert config.dataset_config.num_boxes == 32
    assert config.dataset_config.classes == ['Car']
    assert config.model_config.image_input_shape == [320, 1216]
    assert config.model_config.output_config.alpha == 'dc'
    assert config.model_config.loss_config.inst_xyz_map_local == \
        ['smooth_l1_nonzero', 100.0]
    assert config.train_config.max_iterations == 142000
    opt = config.train_config.optimizer.adam_optimizer
    assert opt.initial_learning_rate == 0.00008
    assert opt.use_moving_average is True

    # Derived paths hang off data/outputs/<name>
    assert config.exp_output_dir.endswith('monopsr_model_000')
    assert config.checkpoint_dir.startswith(config.exp_output_dir)
    assert config.logdir.startswith(config.exp_output_dir)


def test_duplicate_keys_rejected(tmp_path):
    bad = tmp_path / 'bad.yaml'
    bad.write_text('a: 1\nb:\n  c: 2\n  c: 3\n')
    import yaml
    with pytest.raises(yaml.constructor.ConstructorError):
        config_utils.parse_yaml_config(str(bad))


def test_config_obj_access(tmp_path):
    path = tmp_path / 'c.yaml'
    path.write_text('x: 5\nnested:\n  y: [1, 2]\n  z: !!null\n')
    config = config_utils.parse_yaml_config(str(path))
    assert config.x == 5
    assert config.nested.y == [1, 2]
    assert config.nested.z is None
    assert config.nested.get('missing', 'd') == 'd'
    with pytest.raises(AttributeError):
        _ = config.nested.missing
    # Round trip through to_dict
    assert config.nested.to_dict() == {'y': [1, 2], 'z': None}


def test_config_freeze_and_drift_backup(tmp_path):
    path = tmp_path / 'exp.yaml'
    path.write_text('a: 1\n')
    config = config_utils.parse_yaml_config(
        str(path), output_base_dir=str(tmp_path / 'outputs'))
    dst = config_utils.copy_config_into_experiment_dir(str(path), config)
    assert os.path.exists(dst)

    # Unchanged config: no backup
    config_utils.copy_config_into_experiment_dir(str(path), config)
    backups = [f for f in os.listdir(config.exp_output_dir)
               if '.bak.' in f]
    assert not backups

    # Drifted config: old copy backed up
    path.write_text('a: 2\n')
    config_utils.copy_config_into_experiment_dir(str(path), config)
    backups = [f for f in os.listdir(config.exp_output_dir)
               if '.bak.' in f]
    assert len(backups) == 1
    assert open(dst).read() == 'a: 2\n'
