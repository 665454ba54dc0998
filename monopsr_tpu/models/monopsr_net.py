"""MonoPSR network: dual towers + map heads + proposal/regression FC heads.

Behavioral twin of the reference model graph
(ref: src/monopsr/core/models/monopsr/monopsr_model.py:138-492 and
monopsr_output_builder.py:36-802), restructured as a single Flax module
whose batch axis is the proposal axis (fixed `num_boxes` slots).

Output-type coverage (canonical config monopsr_model_000.yaml):
    inst_xyz_map_local: 'map'     valid_mask_maps: 'mask' (always on)
    lwh: 'offset' | 'est'         alpha: 'dc' | 'prob'
    view_ang: 'est' | 'offset'    cen_x: 'from_view_ang_and_z'
    cen_y: 'offset' | 'est'       cen_z: 'offset' | 'direct'

The global-map heads and the projection-alignment error are assembled
outside the module (they consume GT viewing angles during train/val);
see monopsr_tpu.models.monopsr.
"""

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monopsr_tpu import constants
from monopsr_tpu.geometry import class_stats, instance
from monopsr_tpu.models.backbone import Resnet101_4xSquash
from monopsr_tpu.ops import crop_resize

_XAVIER = nn.initializers.xavier_uniform()


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Static model configuration (hashable for jit)."""
    num_boxes: int = 32
    num_alpha_bins: int = 12
    num_classes: int = 1
    image_input_shape: Tuple[int, int] = (320, 1216)
    resized_full_img_shape: Tuple[int, int] = (160, 608)
    img_roi_size: Tuple[int, int] = (48, 48)
    map_roi_size: Tuple[int, int] = (48, 48)
    proposal_fc_sizes: Tuple[int, ...] = (1024, 1024)
    regression_fc_sizes: Tuple[int, ...] = (1024, 1024)
    dropout_keep_prob: float = 1.0
    max_depth: float = 45.0
    mean_sub_type: str = 'kitti'
    output_stride: int = 4
    resnet: str = 'resnet101'
    compute_dtype: str = 'bfloat16'
    # Phase-space (space-to-batch) form of the atrous ResNet blocks:
    # numerically identical to dilated convs (see models/resnet.py) and
    # ~1.5x faster on TPU, but its reshape-heavy graph is pathologically
    # slow for XLA:CPU to compile at full image shapes — CPU validation
    # meshes may turn it off without changing the math.
    use_phase_space: bool = True
    # Rematerialize tower bottlenecks on the backward pass (train-time
    # memory/FLOPs trade; see models/resnet.py). Opt-in via the YAML
    # model_config.remat_towers — lifts the train step's batch-width
    # ceiling at ~1/3 extra tower FLOPs.
    remat_towers: bool = False
    remat_policy: str = 'unit'
    # Output types
    lwh_type: str = 'offset'
    alpha_type: str = 'dc'
    view_ang_type: str = 'est'
    cen_y_type: str = 'offset'
    cen_z_type: str = 'offset'
    rotate_view: bool = True
    centroid_type: str = 'middle'
    # xyz-from-depth head variant: backproject the predicted global depth
    # map through cam_p over the box ROI grid into a global xyz map
    # (ref: monopsr_output_builder.py:774-802, loss monopsr_model.py:927-955)
    xyz_from_depth: bool = False
    # Normalization of the appended prop_cen_y/z estimates in the
    # regression trunk: 'constant' = /1.666754 and /max_depth (the
    # reference's hardcoded recipe, monopsr_output_builder.py:246-248),
    # 'by_class_mean' = per-class mean tables
    # (geometry.feature_normalization, ref feature_normalization.py:4-107),
    # 'none' = raw values.
    appended_est_norm: str = 'constant'
    class_names: Tuple[str, ...] = ('Car',)

    @staticmethod
    def from_model_config(model_config, dataset_config):
        oc = model_config.output_config
        return NetConfig(
            num_boxes=dataset_config.num_boxes,
            num_alpha_bins=dataset_config.num_alpha_bins,
            num_classes=len(dataset_config.classes),
            image_input_shape=tuple(model_config.image_input_shape),
            resized_full_img_shape=tuple(
                model_config.resized_full_img_shape),
            img_roi_size=tuple(model_config.img_roi_size),
            map_roi_size=tuple(model_config.map_roi_size),
            proposal_fc_sizes=tuple(
                model_config.proposal_fc_layers.layer_sizes),
            regression_fc_sizes=tuple(
                model_config.regression_fc_layers.layer_sizes),
            dropout_keep_prob=float(
                model_config.proposal_fc_layers.dropout_keep_prob),
            max_depth=float(
                dataset_config.obj_filter_config.depth_range[1]),
            mean_sub_type=model_config.mean_sub_type,
            compute_dtype=model_config.get('compute_dtype', 'bfloat16'),
            resnet=model_config.get('resnet', 'resnet101'),
            output_stride=model_config.get('output_stride', 4),
            remat_towers=bool(model_config.get('remat_towers', False)),
            remat_policy=str(model_config.get('remat_policy', 'unit')),
            lwh_type=oc.lwh,
            alpha_type=oc.alpha,
            view_ang_type=oc.view_ang,
            cen_y_type=oc.cen_y,
            cen_z_type=oc.cen_z,
            rotate_view=model_config.rotate_view,
            centroid_type=model_config.centroid_type,
            xyz_from_depth=bool(
                oc.get('inst_xyz_map_global_from_depth')),
            appended_est_norm=_appended_norm_mode(
                model_config.get('normalize_appended_ests', True)),
            class_names=tuple(dataset_config.classes),
        )


def _appended_norm_mode(value):
    """Maps the YAML normalize_appended_ests value to a mode string."""
    if value is True:
        return 'constant'
    if value in (False, None):
        return 'none'
    if value in ('constant', 'by_class_mean', 'none'):
        return value
    raise ValueError('Invalid normalize_appended_ests: ' + repr(value))


def _box_feature_concat(boxes_2d, view_angs, class_indices, cam_p,
                        image_shape, num_classes):
    """Shared normalized box/camera feature block for the FC trunks
    (ref: monopsr_output_builder.py:142-180, 226-248).

    Batch-native: boxes_2d (B, N, 4), view_angs (B, N, 1),
    class_indices (B, N, 1), cam_p (B, 3, 4). Returns flat (B*N, F)
    feature blocks.
    """
    b, n = boxes_2d.shape[0], boxes_2d.shape[1]
    cu = cam_p[:, 0, 2][:, None, None]
    cv = cam_p[:, 1, 2][:, None, None]
    box_ij = boxes_2d - jnp.concatenate(
        [cv, cu, cv, cu], axis=-1)                       # (B, N, 4)
    half = jnp.asarray([image_shape[0] / 2.0, image_shape[1] / 2.0,
                        image_shape[0] / 2.0, image_shape[1] / 2.0])
    box_ij_norm = (box_ij / half).reshape(b * n, 4)

    box_h_norm = ((boxes_2d[:, :, 2] - boxes_2d[:, :, 0]) /
                  image_shape[0]).reshape(b * n, 1)

    # Class indices are 1-based (0 = background). one_hot with the raw
    # index maps out-of-range (idx == num_classes) to all-zeros — the
    # reference's exact behavior (monopsr_output_builder.py:158-160),
    # including the all-zero embedding for single-class runs.
    class_one_hot = jax.nn.one_hot(
        class_indices.reshape(b * n), num_classes)

    cam_norm = (cam_p.reshape(b, 12) /
                jnp.asarray([1000.0, 1.0, 1000.0, 100.0,
                             1.0, 1000.0, 1000.0, 1.0,
                             1.0, 1.0, 1.0, 1.0]))
    cam_tiled = jnp.repeat(cam_norm, n, axis=0)          # (B*N, 12)

    return [box_ij_norm, box_h_norm, view_angs.reshape(b * n, 1),
            class_one_hot, cam_tiled]


class FCTrunk(nn.Module):
    """img_fc(1024) on flattened box features, concat extras, FC stack."""
    layer_sizes: Sequence[int]
    dropout_keep_prob: float = 1.0

    @nn.compact
    def __call__(self, box_features, extras, train):
        flat = box_features.reshape(box_features.shape[0], -1)
        img_fc = nn.relu(nn.Dense(1024, kernel_init=_XAVIER,
                                  name='img_fc')(flat))
        x = jnp.concatenate([img_fc] + extras, axis=1)
        for i, size in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(size, kernel_init=_XAVIER,
                                 name='fc{}'.format(i))(x))
            if self.dropout_keep_prob < 1.0:
                x = nn.Dropout(rate=1.0 - self.dropout_keep_prob,
                               deterministic=not train,
                               name='fc{}_drop'.format(i))(x)
        return x


class MonoPSRNet(nn.Module):
    """Full MonoPSR forward network over one image's proposal slots."""
    cfg: NetConfig

    @nn.compact
    def __call__(self, image, boxes_2d, boxes_2d_norm, view_angs,
                 class_indices, mean_lwh, prop_cen_z_offsets,
                 cen_y_offsets, cam_p, train=False, gt_inputs=None):
        """
        Args:
            image: (H_in, W_in, 3) RGB image already resized to
                image_input_shape (raw 0-255 values; mean sub here) —
                or (B, H_in, W_in, 3) for the batch-native multi-image
                path (every other arg then carries a leading B axis and
                outputs are (B, N, ...)).
            boxes_2d: (N, 4) [y1, x1, y2, x2] original-pixel boxes.
            boxes_2d_norm: (N, 4) boxes normalized by the original image
                shape.
            view_angs: (N,) 2D-box viewing-angle estimates.
            class_indices: (N, 1) 1-based class indices.
            mean_lwh: (N, 3) per-class mean dimensions.
            prop_cen_z_offsets: (N,) per-class proposal depth offsets.
            cen_y_offsets: (N,) per-class cen_y trend offsets.
            cam_p: (3, 4) camera projection matrix.
            train: training mode.
            gt_inputs: optional dict of GT arrays, required only when an
                output type is 'gt' (debug paths; keys: 'lwh' (N, 3),
                'alpha_bins' (N,), 'alpha_regs' (N, nb),
                'view_angs' (N, 1), 'cen_y' (N, 1)).

        Returns:
            dict of outputs keyed by monopsr_tpu.constants KEY_*.

        TPU note: multi-image batches fold into one flat (B*N) box axis
        for the crop tower, FC trunks, and heads, and a true (B,) batch
        for the full-image tower — NOT jax.vmap, whose batched
        phase-space reshapes and conv batching rules measure ~1.7x
        slower on the towers (scripts/diag_forward_bisect.py).
        """
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32

        batched = image.ndim == 4
        if not batched:
            image = image[None]
            boxes_2d = boxes_2d[None]
            boxes_2d_norm = boxes_2d_norm[None]
            view_angs = view_angs[None]
            class_indices = class_indices[None]
            mean_lwh = mean_lwh[None]
            prop_cen_z_offsets = prop_cen_z_offsets[None]
            cen_y_offsets = cen_y_offsets[None]
            cam_p = cam_p[None]
            if gt_inputs is not None:
                gt_inputs = jax.tree.map(lambda x: x[None], gt_inputs)

        b, n = boxes_2d.shape[0], boxes_2d.shape[1]

        def flat(x):
            return x.reshape((b * n,) + x.shape[2:])

        # Per-row (B*N,) camera scalars for the per-box geometry
        f_row = jnp.repeat(cam_p[:, 0, 0], n)
        cv_row = jnp.repeat(cam_p[:, 1, 2], n)
        x_offset_row = jnp.repeat(-cam_p[:, 0, 3] / cam_p[:, 0, 0], n)

        # Preprocess: mean subtraction (ref: img_preprocessor.py:12-35)
        means = (class_stats.KITTI_CHANNEL_MEANS
                 if cfg.mean_sub_type == 'kitti'
                 else class_stats.IMAGENET_CHANNEL_MEANS)
        img = image.astype(jnp.float32) - jnp.asarray(means)

        # Per-box RGB crops (ref: monopsr_model.py:222-226)
        rgb_crops = jax.vmap(
            crop_resize.crop_and_resize_bilinear,
            in_axes=(0, 0, None))(img, boxes_2d_norm, cfg.img_roi_size)
        rgb_crops = flat(rgb_crops)                    # (B*N, 48, 48, 3)

        # Resized full images (ref: monopsr_model.py:228-233)
        full_imgs = crop_resize.resize_bilinear_align_corners(
            img, cfg.resized_full_img_shape)

        features_for_map, features_for_box_3d = Resnet101_4xSquash(
            map_roi_size=cfg.map_roi_size,
            output_stride=cfg.output_stride,
            resnet=cfg.resnet, dtype=dtype,
            use_phase_space=cfg.use_phase_space,
            remat_towers=cfg.remat_towers,
            remat_policy=cfg.remat_policy, name='backbone')(
                rgb_crops, full_imgs, boxes_2d_norm, train)

        # Normalized box/camera features while the (B, N) axes are
        # still separate (per-image camera scalars), then everything
        # below operates on the flat (B*N,) box axis
        extras = _box_feature_concat(
            boxes_2d, view_angs[..., None], class_indices, cam_p,
            cfg.image_input_shape, cfg.num_classes)

        boxes_2d = flat(boxes_2d)
        view_angs = flat(view_angs)
        mean_lwh = flat(mean_lwh)
        prop_cen_z_offsets = flat(prop_cen_z_offsets)
        cen_y_offsets = flat(cen_y_offsets)
        if gt_inputs is not None:
            gt_inputs = jax.tree.map(flat, gt_inputs)

        outputs = {}

        # Map heads (ref: monopsr_output_builder.py:95-120)
        outputs[constants.KEY_INST_XYZ_MAP_LOCAL] = nn.Conv(
            3, (3, 3), padding='SAME', kernel_init=_XAVIER,
            name='inst_xyz_map_local')(features_for_map)
        outputs[constants.KEY_VALID_MASK_MAPS] = nn.Conv(
            1, (3, 3), padding='SAME', kernel_init=_XAVIER,
            name='valid_mask_maps')(features_for_map)

        # Proposal FC trunk
        view_angs_col = view_angs[:, None]
        prop_fc = FCTrunk(cfg.proposal_fc_sizes, cfg.dropout_keep_prob,
                          name='proposal_fc')(
            features_for_box_3d, extras, train)

        # lwh head (ref: monopsr_output_builder.py:625-661)
        if cfg.lwh_type == 'offset':
            lwh_offs = nn.Dense(3, kernel_init=_XAVIER, name='lwh')(prop_fc)
            pred_lwh = mean_lwh + lwh_offs
        elif cfg.lwh_type == 'est':
            lwh_offs = mean_lwh
            pred_lwh = mean_lwh
        elif cfg.lwh_type == 'gt':
            pred_lwh = gt_inputs['lwh']
            lwh_offs = pred_lwh - mean_lwh
        else:
            raise NotImplementedError('lwh type ' + cfg.lwh_type)
        outputs[constants.KEY_LWH + '_offs'] = lwh_offs
        outputs[constants.KEY_LWH] = pred_lwh

        # alpha head (ref: monopsr_output_builder.py:276-393)
        nb = cfg.num_alpha_bins
        if cfg.alpha_type == 'dc':
            ori = nn.Dense(nb * 2, kernel_init=_XAVIER,
                           name='alpha')(prop_fc)
            outputs[constants.KEY_ALPHA_BINS] = ori[:, 0:nb]
            outputs[constants.KEY_ALPHA_REGS] = ori[:, nb:nb * 2]
        elif cfg.alpha_type == 'dc_rotation':
            # Bins + per-bin (sin, cos) residuals, L2-normalized then
            # decoded with atan2 (ref: monopsr_output_builder.py:304-338)
            ori = nn.Dense(nb * 3, kernel_init=_XAVIER,
                           name='alpha')(prop_fc)
            comps = ori[:, nb:nb * 3].reshape(-1, nb, 2)
            comps = comps / jnp.maximum(
                jnp.linalg.norm(comps, axis=2, keepdims=True), 1e-12)
            outputs[constants.KEY_ALPHA_BINS] = ori[:, 0:nb]
            outputs[constants.KEY_ALPHA_REGS] = jnp.arctan2(
                comps[:, :, 1], comps[:, :, 0])
        elif cfg.alpha_type == 'prob':
            bins = nn.Dense(nb, kernel_init=_XAVIER, name='alpha')(prop_fc)
            softmax = nn.softmax(bins)
            half_bin = jnp.pi / nb
            centres = jnp.linspace(half_bin, 2 * jnp.pi - half_bin, nb)
            comp = softmax @ jnp.stack(
                [jnp.cos(centres), jnp.sin(centres)], axis=1)
            outputs[constants.KEY_ALPHA_BINS] = bins
            outputs[constants.KEY_ALPHA] = (
                jnp.arctan2(comp[:, 1], comp[:, 0])[:, None])
        elif cfg.alpha_type == 'gt':
            # Debug passthrough: bin logits that argmax to the GT bin
            outputs[constants.KEY_ALPHA_BINS] = jax.nn.one_hot(
                gt_inputs['alpha_bins'], nb) * 10.0
            outputs[constants.KEY_ALPHA_REGS] = gt_inputs['alpha_regs']
        else:
            raise NotImplementedError('alpha type ' + cfg.alpha_type)

        # Viewing-angle head (ref: monopsr_output_builder.py:509-549)
        if cfg.view_ang_type == 'est':
            pred_view_angs = view_angs_col
            view_ang_offs = jnp.zeros_like(view_angs_col)
        elif cfg.view_ang_type == 'offset':
            view_ang_offs = nn.Dense(1, kernel_init=_XAVIER,
                                     name='view_ang')(prop_fc)
            pred_view_angs = view_angs_col + view_ang_offs
        elif cfg.view_ang_type == 'gt':
            pred_view_angs = gt_inputs['view_angs']
            view_ang_offs = pred_view_angs - view_angs_col
        else:
            raise NotImplementedError('view_ang ' + cfg.view_ang_type)
        outputs[constants.KEY_VIEW_ANG + '_offs'] = view_ang_offs
        outputs[constants.KEY_VIEW_ANG] = pred_view_angs

        # Centroid proposals, flat-batch form of
        # instance.prop_cen_z_from_box_height / est_y_from_box_2d_and_depth
        # (ref: monopsr_output_builder.py:407-438) with per-row camera
        # scalars (f_row, cv_row carry each image's calibration)
        boxes_h = boxes_2d[:, 2] - boxes_2d[:, 0]
        prop_cen_z = (f_row * pred_lwh[:, 2] / boxes_h
                      + prop_cen_z_offsets)[:, None]
        outputs[constants.KEY_PROP_CEN_Z] = prop_cen_z
        centre_v = ((boxes_2d[:, 2] + boxes_2d[:, 0]) / 2.0
                    - cv_row)[:, None]
        prop_cen_y = (centre_v * (prop_cen_z / f_row[:, None])
                      - cen_y_offsets.reshape(-1, 1))

        # Regression FC trunk with appended early estimates
        # (ref: monopsr_output_builder.py:200-274)
        if cfg.appended_est_norm == 'constant':
            prop_cen_y_norm = prop_cen_y / class_stats.PROP_CEN_Y_NORM
            prop_cen_z_norm = prop_cen_z / cfg.max_depth
        elif cfg.appended_est_norm == 'by_class_mean':
            from monopsr_tpu.geometry import feature_normalization as fn
            prop_cen_y_norm = fn.normalize_cen_y_by_mean(
                prop_cen_y, class_indices, cfg.class_names)
            prop_cen_z_norm = fn.normalize_cen_z_by_mean(
                prop_cen_z, class_indices, cfg.class_names)
        else:
            prop_cen_y_norm = prop_cen_y
            prop_cen_z_norm = prop_cen_z
        reg_extras = extras + [
            lwh_offs,
            outputs[constants.KEY_ALPHA_BINS],
            outputs.get(constants.KEY_ALPHA_REGS,
                        jnp.zeros_like(outputs[constants.KEY_ALPHA_BINS])),
            prop_cen_y_norm,
            prop_cen_z_norm,
        ]
        reg_fc = FCTrunk(cfg.regression_fc_sizes, cfg.dropout_keep_prob,
                         name='regression_fc')(
            features_for_box_3d, reg_extras, train)

        # cen_y head (ref: monopsr_output_builder.py:573-609)
        if cfg.cen_y_type == 'offset':
            cen_y_offs = nn.Dense(1, kernel_init=_XAVIER,
                                  name='cen_y')(reg_fc)
            pred_cen_y = prop_cen_y + cen_y_offs
        elif cfg.cen_y_type == 'est':
            cen_y_offs = jnp.zeros_like(prop_cen_y)
            pred_cen_y = prop_cen_y
        elif cfg.cen_y_type == 'gt':
            pred_cen_y = gt_inputs['cen_y']
            cen_y_offs = pred_cen_y - prop_cen_y
        else:
            raise NotImplementedError('cen_y ' + cfg.cen_y_type)
        outputs[constants.KEY_CEN_Y + '_offs'] = cen_y_offs
        outputs[constants.KEY_CEN_Y] = pred_cen_y
        outputs['prop_cen_y'] = prop_cen_y

        # cen_z head (ref: monopsr_output_builder.py:441-507)
        if cfg.cen_z_type == 'offset':
            cen_z_offs = nn.Dense(1, kernel_init=_XAVIER,
                                  name='cen_z')(reg_fc)
            pred_cen_z = prop_cen_z + cen_z_offs
        elif cfg.cen_z_type == 'direct':
            pred_cen_z = nn.Dense(1, kernel_init=_XAVIER,
                                  name='cen_z')(reg_fc)
            cen_z_offs = pred_cen_z - prop_cen_z
        else:
            raise NotImplementedError('cen_z ' + cfg.cen_z_type)
        outputs[constants.KEY_CEN_Z + '_offs'] = cen_z_offs
        outputs[constants.KEY_CEN_Z] = pred_cen_z

        # cen_x from viewing angle and depth
        # (ref: monopsr_output_builder.py:551-571)
        pred_cen_x = (pred_cen_z * jnp.tan(pred_view_angs)
                      + x_offset_row[:, None])
        outputs[constants.KEY_CEN_X] = pred_cen_x

        outputs[constants.KEY_CENTROIDS] = jnp.concatenate(
            [pred_cen_x, pred_cen_y, pred_cen_z], axis=1)

        if batched:
            # (B*N, ...) -> (B, N, ...); the single-sample path's flat
            # (1*N, ...) arrays already ARE the per-sample shapes
            outputs = {k: v.reshape((b, n) + v.shape[1:])
                       for k, v in outputs.items()}
        return outputs
