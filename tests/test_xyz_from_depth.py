"""xyz-from-depth head variant tests (ref: monopsr_output_builder.py:774-802).

Config-driven like tests/test_gt_modes.py: with
output_config.inst_xyz_map_global_from_depth enabled, the global depth
map is backprojected into a global xyz map, the loss contributes to the
total, and one gradient step runs through the variant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from monopsr_tpu import constants as C
from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet, NetConfig
from tests.test_model import LOSS_CONFIG, TINY_CFG, make_batch

FD_CFG = dataclasses.replace(TINY_CFG, xyz_from_depth=True)
FD_LOSS_CONFIG = dict(LOSS_CONFIG,
                      inst_xyz_map_global_from_depth=['smooth_l1_nonzero',
                                                      1.0])


def _forward_with_globals(cfg, loss_config, batch):
    net = MonoPSRNet(cfg=cfg)

    def run(b):
        variables = net.init(jax.random.PRNGKey(0),
                             **monopsr.net_inputs_from_batch(b),
                             train=False)
        outputs = net.apply(variables,
                            **monopsr.net_inputs_from_batch(b),
                            train=False)
        gt = monopsr.build_gt_dict(cfg, b, outputs)
        outputs, gt = monopsr.add_global_outputs(cfg, b, outputs, gt)
        losses, total = monopsr.compute_losses(cfg, loss_config,
                                               outputs, gt)
        return outputs, gt, losses, total

    return jax.device_get(jax.jit(run)(batch))


def test_from_depth_output_shape_and_consistency():
    batch = make_batch(FD_CFG)
    outputs, gt, losses, _ = _forward_with_globals(
        FD_CFG, FD_LOSS_CONFIG, batch)

    n, (rh, rw) = FD_CFG.num_boxes, FD_CFG.map_roi_size
    from_depth = outputs[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH]
    assert from_depth.shape == (n, rh, rw, 3)

    # The z channel is exactly the predicted global depth map
    np.testing.assert_allclose(
        from_depth[..., 2],
        outputs[C.KEY_INST_DEPTH_MAP_GLOBAL][..., 0], atol=1e-5)

    # GT for the variant is the global instance xyz crop
    np.testing.assert_allclose(
        gt[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH],
        gt[C.KEY_INST_XYZ_MAP_GLOBAL], atol=0)

    # Backprojection sanity: x = (u - cu) * z / f on the ROI pixel grid.
    # Check one box's centre-ish pixel against the host formula.
    cam_p = batch[C.SAMPLE_CAM_P]
    box = batch[C.SAMPLE_LABEL_BOXES_2D][0]
    y1, x1, y2, x2 = box
    pw = (x2 - x1) / rw
    u = x1 + pw / 2.0 + (rw // 2) * pw
    z = from_depth[0, rh // 2, rw // 2, 2]
    x_expected = (u - cam_p[0, 2]) * z / cam_p[0, 0]
    np.testing.assert_allclose(from_depth[0, rh // 2, rw // 2, 0],
                               x_expected, rtol=1e-4, atol=1e-4)

    assert C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH in losses
    assert np.isfinite(losses[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH])


def test_from_depth_off_by_default():
    batch = make_batch(TINY_CFG)
    outputs, gt, losses, _ = _forward_with_globals(
        TINY_CFG, LOSS_CONFIG, batch)
    assert C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH not in outputs
    assert C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH not in losses


def test_from_depth_grad_step():
    """One gradient step flows through the from-depth loss."""
    batch = make_batch(FD_CFG)
    net = MonoPSRNet(cfg=FD_CFG)

    def init(b):
        return net.init(jax.random.PRNGKey(0),
                        **monopsr.net_inputs_from_batch(b), train=False)

    variables = jax.jit(init)(batch)

    def loss_fn(params, b):
        outputs = net.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            **monopsr.net_inputs_from_batch(b), train=False)
        gt = monopsr.build_gt_dict(FD_CFG, b, outputs)
        outputs, gt = monopsr.add_global_outputs(FD_CFG, b, outputs, gt)
        _, total = monopsr.compute_losses(FD_CFG, FD_LOSS_CONFIG,
                                          outputs, gt)
        return total

    grads = jax.jit(jax.grad(loss_fn))(variables['params'], batch)
    leaf_norms = [float(jnp.max(jnp.abs(g)))
                  for g in jax.tree.leaves(grads)]
    assert np.isfinite(leaf_norms).all()
    assert max(leaf_norms) > 0.0


def test_config_plumbs_from_depth_flag():
    from monopsr_tpu.config import ConfigObj
    oc = {'inst_xyz_map_local': 'map', 'lwh': 'offset', 'alpha': 'dc',
          'view_ang': 'est', 'cen_x': 'from_view_ang_and_z',
          'cen_y': 'offset', 'cen_z': 'offset', 'centroids': 'xyz',
          'inst_xyz_map_global': 'projection',
          'inst_depth_map_global': 'map',
          'inst_xyz_map_global_from_depth': 'from_depth'}
    model_config = ConfigObj({
        'output_config': oc,
        'image_input_shape': [96, 320],
        'resized_full_img_shape': [48, 160],
        'img_roi_size': [48, 48], 'map_roi_size': [48, 48],
        'proposal_fc_layers': {'layer_sizes': [64, 64],
                               'dropout_keep_prob': 1.0},
        'regression_fc_layers': {'layer_sizes': [64, 64],
                                 'dropout_keep_prob': 1.0},
        'mean_sub_type': 'kitti', 'rotate_view': True,
        'centroid_type': 'middle',
    })
    dataset_config = ConfigObj({
        'num_boxes': 4, 'num_alpha_bins': 12, 'alpha_bin_overlap': 0.0,
        'classes': ['Car'],
        'obj_filter_config': {'depth_range': [5, 45]},
    })
    cfg = NetConfig.from_model_config(model_config, dataset_config)
    assert cfg.xyz_from_depth

    oc2 = dict(oc)
    del oc2['inst_xyz_map_global_from_depth']
    model_config2 = ConfigObj(dict(model_config.to_dict(),
                                   output_config=oc2))
    cfg2 = NetConfig.from_model_config(model_config2, dataset_config)
    assert not cfg2.xyz_from_depth
