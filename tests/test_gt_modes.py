"""Tests for the 'gt' debug output modes (head passthroughs)."""

import dataclasses

import jax
import numpy as np

from monopsr_tpu import constants as C
from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet
from tests.test_model import TINY_CFG, make_batch


def test_gt_passthrough_modes():
    cfg = dataclasses.replace(
        TINY_CFG, lwh_type='gt', alpha_type='gt', view_ang_type='gt',
        cen_y_type='gt')
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    n = cfg.num_boxes

    gt_inputs = {
        'lwh': batch[C.SAMPLE_LABEL_BOXES_3D][:, 3:6],
        'alpha_bins': batch[C.SAMPLE_ALPHA_BINS],
        'alpha_regs': batch[C.SAMPLE_ALPHA_REGS],
        'view_angs': batch[C.SAMPLE_VIEWING_ANGLES_3D][:, None],
        'cen_y': (batch[C.SAMPLE_LABEL_BOXES_3D][:, 1:2] -
                  batch[C.SAMPLE_LABEL_BOXES_3D][:, 5:6] / 2),
    }

    def init_apply(b):
        variables = net.init(jax.random.PRNGKey(0),
                             **monopsr.net_inputs_from_batch(b),
                             gt_inputs=gt_inputs, train=False)
        return net.apply(variables, **monopsr.net_inputs_from_batch(b),
                         gt_inputs=gt_inputs, train=False)

    outputs = jax.device_get(jax.jit(init_apply)(batch))

    np.testing.assert_allclose(outputs[C.KEY_LWH], gt_inputs['lwh'],
                               atol=1e-6)
    np.testing.assert_array_equal(
        np.argmax(outputs[C.KEY_ALPHA_BINS], axis=1),
        gt_inputs['alpha_bins'])
    np.testing.assert_allclose(outputs[C.KEY_ALPHA_REGS],
                               gt_inputs['alpha_regs'], atol=1e-6)
    np.testing.assert_allclose(outputs[C.KEY_VIEW_ANG],
                               gt_inputs['view_angs'], atol=1e-6)
    np.testing.assert_allclose(outputs[C.KEY_CEN_Y],
                               gt_inputs['cen_y'], atol=1e-5)
    assert outputs[C.KEY_CENTROIDS].shape == (n, 3)
