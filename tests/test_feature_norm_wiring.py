"""normalize_appended_ests modes, incl. the by_class_mean path that
wires geometry.feature_normalization into the regression trunk."""

import dataclasses

import jax
import numpy as np
import pytest

from monopsr_tpu import constants as C
from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import (MonoPSRNet,
                                            _appended_norm_mode)
from tests.test_model import TINY_CFG, make_batch


def test_mode_mapping():
    assert _appended_norm_mode(True) == 'constant'
    assert _appended_norm_mode(False) == 'none'
    assert _appended_norm_mode(None) == 'none'
    assert _appended_norm_mode('by_class_mean') == 'by_class_mean'
    with pytest.raises(ValueError):
        _appended_norm_mode('bogus')


@pytest.mark.parametrize('mode', ['constant', 'by_class_mean', 'none'])
def test_forward_runs_each_mode(mode):
    cfg = dataclasses.replace(TINY_CFG, appended_est_norm=mode,
                              class_names=('Car',))
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)

    def run(b):
        variables = net.init(jax.random.PRNGKey(0),
                             **monopsr.net_inputs_from_batch(b),
                             train=False)
        return net.apply(variables, **monopsr.net_inputs_from_batch(b),
                         train=False)

    outputs = jax.device_get(jax.jit(run)(batch))
    assert np.isfinite(outputs[C.KEY_CENTROIDS]).all()


def test_modes_change_regression_inputs():
    """Same params, different normalization -> different cen_z head out."""
    outs = {}
    for mode in ('constant', 'by_class_mean'):
        cfg = dataclasses.replace(TINY_CFG, appended_est_norm=mode,
                                  class_names=('Car',))
        net = MonoPSRNet(cfg=cfg)
        batch = make_batch(cfg)

        def run(b, net=net):
            variables = net.init(jax.random.PRNGKey(0),
                                 **monopsr.net_inputs_from_batch(b),
                                 train=False)
            return net.apply(variables,
                             **monopsr.net_inputs_from_batch(b),
                             train=False)

        outs[mode] = jax.device_get(jax.jit(run)(batch))
    assert not np.allclose(outs['constant'][C.KEY_CEN_Z],
                           outs['by_class_mean'][C.KEY_CEN_Z])
