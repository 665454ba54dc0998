"""End-to-end model tests: forward, GT assembly, losses, gradients.

Pattern follows the reference's fake-model trainer test
(ref: src/monopsr/core/trainer_test.py:20-110): a tiny backbone exercises
the full graph shape-correctly without TPU-scale compute.
"""

import jax
import numpy as np
import pytest

from monopsr_tpu import constants as C
from monopsr_tpu.datasets.kitti import kitti_dataset as kd
from monopsr_tpu.models import monopsr
from monopsr_tpu.models.monopsr_net import MonoPSRNet, NetConfig

RNG = np.random.RandomState(3)

TINY_CFG = NetConfig(
    num_boxes=4,
    num_alpha_bins=12,
    num_classes=1,
    image_input_shape=(96, 320),
    resized_full_img_shape=(48, 160),
    img_roi_size=(48, 48),
    map_roi_size=(48, 48),
    proposal_fc_sizes=(64, 64),
    regression_fc_sizes=(64, 64),
    max_depth=45.0,
    resnet='resnet_tiny',
    compute_dtype='float32',
)

LOSS_CONFIG = {
    'inst_xyz_map_local': ['smooth_l1_nonzero', 100.0],
    'valid_mask_maps': ['sigmoid_ce', 0.1],
    'lwh': ['smooth_l1', 1.0],
    'alpha_cls': ['softmax', 0.3, 0.001],
    'alpha_reg': ['smooth_l1', 1.0],
    'view_ang': ['smooth_l1', 0.1],
    'cen_y': ['smooth_l1', 0.1],
    'cen_z': ['smooth_l1', 0.1],
    'inst_xyz_map_global': ['smooth_l1_nonzero', 0.1],
    'inst_depth_map_global': ['smooth_l1_nonzero', 10.0],
}


def make_batch(cfg, h=96, w=320):
    n = cfg.num_boxes
    image = RNG.randint(0, 255, (cfg.image_input_shape[0],
                                 cfg.image_input_shape[1], 3)
                        ).astype(np.float32)
    cam_p = np.array([[300.0, 0.0, w / 2, 20.0],
                      [0.0, 300.0, h / 2, 0.0],
                      [0.0, 0.0, 1.0, 0.001]], np.float32)

    depth = np.zeros((h, w), np.float32)
    inst_img = np.full((h, w), 255, np.int32)
    boxes_2d = np.zeros((n, 4), np.float32)
    boxes_3d = np.zeros((n, 7), np.float32)
    for i in range(n):
        y1 = RNG.randint(0, h - 40)
        x1 = RNG.randint(0, w - 40)
        y2, x2 = y1 + RNG.randint(15, 35), x1 + RNG.randint(15, 35)
        z = RNG.uniform(10, 35)
        depth[y1:y2, x1:x2] = z
        inst_img[y1:y2, x1:x2] = i
        boxes_2d[i] = [y1, x1, y2, x2]
        boxes_3d[i] = [(x1 + x2) / 2 / w * 10 - 5, 1.5, z,
                       3.9, 1.6, 1.5, 0.2]

    alphas = RNG.uniform(-np.pi, np.pi, n).astype(np.float32)
    from monopsr_tpu.geometry import orientation
    bins, regs, valid_bins = orientation.np_orientation_to_angle_bin(
        alphas, cfg.num_alpha_bins, 0.0)

    view_2d = np.arctan2(
        ((boxes_2d[:, 1] + boxes_2d[:, 3]) / 2 - cam_p[0, 2]) / cam_p[0, 0],
        1.0).astype(np.float32)
    view_3d = np.arctan2(boxes_3d[:, 0] - (-cam_p[0, 3] / cam_p[0, 0]),
                         boxes_3d[:, 2]).astype(np.float32)

    return {
        'image': image,
        C.SAMPLE_LABEL_BOXES_2D: boxes_2d,
        C.SAMPLE_LABEL_BOXES_2D_NORM:
            boxes_2d / np.array([h, w, h, w], np.float32),
        C.SAMPLE_LABEL_BOXES_3D: boxes_3d,
        C.SAMPLE_VIEWING_ANGLES_2D: view_2d,
        C.SAMPLE_VIEWING_ANGLES_3D: view_3d,
        C.SAMPLE_LABEL_CLASS_INDICES: np.ones((n, 1), np.int32),
        C.SAMPLE_MEAN_LWH:
            np.tile([[3.892, 1.619, 1.530]], (n, 1)).astype(np.float32),
        C.SAMPLE_PROP_CEN_Z_OFFSET: np.full(n, 2.178, np.float32),
        kd.SAMPLE_CEN_Y_OFFSETS: np.full(n, 0.0648, np.float32),
        C.SAMPLE_CAM_P: cam_p,
        C.SAMPLE_DEPTH_MAP: depth,
        kd.SAMPLE_INSTANCE_IMAGE: inst_img,
        kd.SAMPLE_INSTANCE_INDICES: np.arange(n, dtype=np.int32),
        C.SAMPLE_ALPHAS: alphas,
        C.SAMPLE_ALPHA_BINS: bins.astype(np.int32),
        C.SAMPLE_ALPHA_REGS: regs.astype(np.float32),
        C.SAMPLE_ALPHA_VALID_BINS: valid_bins.astype(np.float32),
        C.SAMPLE_NUM_OBJS: n,
    }


@pytest.fixture(scope='module')
def model_and_batch():
    cfg = TINY_CFG
    net = MonoPSRNet(cfg=cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda b: net.init(rng, **monopsr.net_inputs_from_batch(b),
                           train=False))(batch)
    return cfg, net, batch, variables


@pytest.fixture(scope='module')
def forward_outputs(model_and_batch):
    """Outputs computed once via one jitted program, shared by tests."""
    cfg, net, batch, variables = model_and_batch
    outputs = jax.jit(
        lambda v, b: net.apply(v, **monopsr.net_inputs_from_batch(b),
                               train=False))(variables, batch)
    return jax.device_get(outputs)


class TestForward:

    def test_output_shapes(self, model_and_batch, forward_outputs):
        cfg, net, batch, variables = model_and_batch
        outputs = forward_outputs
        n = cfg.num_boxes
        assert outputs[C.KEY_INST_XYZ_MAP_LOCAL].shape == (n, 48, 48, 3)
        assert outputs[C.KEY_VALID_MASK_MAPS].shape == (n, 48, 48, 1)
        assert outputs[C.KEY_LWH].shape == (n, 3)
        assert outputs[C.KEY_ALPHA_BINS].shape == (n, 12)
        assert outputs[C.KEY_ALPHA_REGS].shape == (n, 12)
        assert outputs[C.KEY_CENTROIDS].shape == (n, 3)
        for key, val in outputs.items():
            assert np.all(np.isfinite(np.asarray(val))), key

    def test_gt_losses_and_metrics(self, model_and_batch,
                                   forward_outputs):
        cfg, net, batch, variables = model_and_batch

        def gt_loss_metrics(outputs, batch):
            gt = monopsr.build_gt_dict(cfg, batch, outputs)
            outputs2, gt = monopsr.add_global_outputs(
                cfg, batch, dict(outputs), gt)
            losses, total = monopsr.compute_losses(
                cfg, LOSS_CONFIG, outputs2, gt)
            metrics = monopsr.compute_metrics(cfg, outputs2, gt)
            return losses, total, metrics, gt

        losses, total, metrics, gt = jax.jit(gt_loss_metrics)(
            forward_outputs, batch)
        assert np.isfinite(float(total))
        assert float(total) > 0
        for name, val in losses.items():
            assert np.isfinite(float(val)), name
        assert float(losses[C.KEY_INST_XYZ_MAP_LOCAL]) > 0
        for name, val in metrics.items():
            assert np.all(np.isfinite(np.asarray(val))), name
        assert metrics[C.METRIC_EMD].shape == (cfg.num_boxes,)
        # Synthetic scene: every box contains its constant-depth instance
        valid = np.asarray(gt[C.KEY_VALID_MASK_MAPS])
        assert np.all(valid.sum(axis=(1, 2, 3)) > 100)

    def test_gradients_flow(self, model_and_batch):
        cfg, net, batch, variables = model_and_batch

        def loss_fn(params):
            outs = net.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                **monopsr.net_inputs_from_batch(batch), train=False)
            gt = monopsr.build_gt_dict(cfg, batch, outs)
            outs, gt = monopsr.add_global_outputs(cfg, batch, outs, gt)
            _, total = monopsr.compute_losses(cfg, LOSS_CONFIG, outs, gt)
            return total

        grads = jax.jit(jax.grad(loss_fn))(variables['params'])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)
        # The vast majority of parameters should receive gradient
        assert nonzero > 0.8 * len(flat)


def test_batched_image_forward_matches_per_sample():
    """The image axis is a plain vmap batch axis (serving mode,
    bench.bench_batched): stacked frames produce the same outputs as
    per-sample forwards."""
    from monopsr_tpu.train import trainer as trainer_lib

    cfg = TINY_CFG
    net = MonoPSRNet(cfg=cfg)
    samples = [make_batch(cfg) for _ in range(2)]
    variables = net.init(jax.random.PRNGKey(0),
                         **monopsr.net_inputs_from_batch(samples[0]),
                         train=False)

    def forward(v, s):
        return net.apply(v, **monopsr.net_inputs_from_batch(s),
                         train=False)

    stacked = trainer_lib.stack_samples(
        [{k: np.asarray(v) for k, v in s.items()} for s in samples])
    batched = jax.jit(
        lambda v, b: jax.vmap(lambda s: forward(v, s))(b))(
            variables, stacked)

    for i, sample in enumerate(samples):
        single = jax.jit(forward)(variables, sample)
        for key in single:
            np.testing.assert_allclose(
                np.asarray(batched[key][i]), np.asarray(single[key]),
                rtol=2e-4, atol=2e-4, err_msg=key)


class TestBatchNativeForward:
    """The batch-native multi-image path must equal vmapping the
    single-sample forward (same params, same inputs)."""

    def test_batched_matches_vmapped_single(self):
        cfg = TINY_CFG
        net = MonoPSRNet(cfg=cfg)
        samples = [make_batch(cfg) for _ in range(3)]
        stacked = {k: np.stack([s[k] for s in samples])
                   for k in samples[0]}

        variables = jax.jit(
            lambda s: net.init(jax.random.PRNGKey(0),
                               **monopsr.net_inputs_from_batch(s),
                               train=False))(samples[0])

        vmapped = jax.jit(lambda v, b: jax.vmap(
            lambda s: net.apply(v, **monopsr.net_inputs_from_batch(s),
                                train=False))(b))(variables, stacked)
        batched = jax.jit(lambda v, b: net.apply(
            v, **monopsr.net_inputs_from_batch(b),
            train=False))(variables, stacked)

        assert sorted(vmapped) == sorted(batched)
        for key in vmapped:
            a, b = np.asarray(vmapped[key]), np.asarray(batched[key])
            assert a.shape == b.shape, key
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=2e-6, err_msg=key)

    def test_single_sample_is_unbatched_shape(self):
        cfg = TINY_CFG
        net = MonoPSRNet(cfg=cfg)
        sample = make_batch(cfg)
        variables = jax.jit(
            lambda s: net.init(jax.random.PRNGKey(0),
                               **monopsr.net_inputs_from_batch(s),
                               train=False))(sample)
        out = jax.jit(lambda v, s: net.apply(
            v, **monopsr.net_inputs_from_batch(s),
            train=False))(variables, sample)
        assert out[C.KEY_CENTROIDS].shape == (cfg.num_boxes, 3)
        assert out[C.KEY_INST_XYZ_MAP_LOCAL].shape == (
            cfg.num_boxes, 48, 48, 3)


def test_remat_towers_flag_reaches_towers():
    """NetConfig.remat_towers must thread through the backbone: the
    traced forward contains remat primitives iff the flag is set
    (trace-only — numerical equivalence is covered at the ResNet level
    in test_resnet_specs.py)."""
    import dataclasses

    import jax.numpy as jnp

    def jaxpr_text(cfg):
        net = MonoPSRNet(cfg=cfg)
        sample = make_batch(cfg)
        variables = jax.eval_shape(
            lambda s: net.init(jax.random.PRNGKey(0),
                               **monopsr.net_inputs_from_batch(s),
                               train=False), sample)
        variables = jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype), variables)
        return str(jax.make_jaxpr(
            lambda v, s: net.apply(
                v, **monopsr.net_inputs_from_batch(s), train=False))(
                    variables, sample))

    base = TINY_CFG
    with_remat = dataclasses.replace(base, remat_towers=True)
    assert 'remat' in jaxpr_text(with_remat)
    assert 'remat' not in jaxpr_text(base)
