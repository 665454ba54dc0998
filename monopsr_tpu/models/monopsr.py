"""MonoPSR model orchestration: forward, GT assembly, losses, metrics.

Behavioral twin of the reference model's build()/loss()/
evaluate_predictions() (ref: src/monopsr/core/models/monopsr/
monopsr_model.py:138-958, 1104-1223), restructured as pure jittable
functions over one sample's fixed-shape batch dict. The per-box
GT-crop loops become one batched gather (geometry.instance), and the
whole step — GT crops, forward, losses — compiles into a single XLA
program.
"""

import jax
import jax.numpy as jnp

from monopsr_tpu import constants
from monopsr_tpu.datasets.kitti import kitti_dataset as kd
from monopsr_tpu.geometry import instance
from monopsr_tpu.models import losses as loss_lib
from monopsr_tpu.models.monopsr_net import MonoPSRNet, NetConfig
from monopsr_tpu.ops import chamfer as chamfer_ops
from monopsr_tpu.ops import emd as emd_ops

C = constants


def create_net(model_config, dataset_config):
    cfg = NetConfig.from_model_config(model_config, dataset_config)
    return MonoPSRNet(cfg=cfg), cfg


def decode_device_sample(batch):
    """Upcasts compactly-encoded device inputs to compute dtypes.

    trainer.prepare_sample ships the big per-sample arrays in their
    source encodings to minimize host->device bytes (the image is
    uint8-valued after augmentation, the depth map is a uint16 png of
    metres*256, the instance image holds indices < 255): uint8 image ->
    float32, uint16 depth -> float32 metres, uint8 instance image ->
    int32. Lossless vs the source files; no-op on already-decoded
    batches, so every device-side consumer can call it defensively.
    """
    out = dict(batch)
    image = out.get('image')
    if image is not None and image.dtype == jnp.uint8:
        out['image'] = image.astype(jnp.float32)
    depth = out.get(C.SAMPLE_DEPTH_MAP)
    if depth is not None and depth.dtype == jnp.uint16:
        out[C.SAMPLE_DEPTH_MAP] = depth.astype(jnp.float32) / 256.0
    inst = out.get(kd.SAMPLE_INSTANCE_IMAGE)
    if inst is not None and inst.dtype == jnp.uint8:
        out[kd.SAMPLE_INSTANCE_IMAGE] = inst.astype(jnp.int32)
    return out


# Sample keys the forward pass consumes (net_inputs_from_batch); GT-only
# keys (depth map, instance image/indices, alphas...) are not in this
# set, so inference paths can skip shipping them to the device entirely.
NET_INPUT_SAMPLE_KEYS = (
    'image',
    C.SAMPLE_LABEL_BOXES_2D, C.SAMPLE_LABEL_BOXES_2D_NORM,
    C.SAMPLE_VIEWING_ANGLES_2D, C.SAMPLE_LABEL_CLASS_INDICES,
    C.SAMPLE_MEAN_LWH, C.SAMPLE_PROP_CEN_Z_OFFSET,
    kd.SAMPLE_CEN_Y_OFFSETS, C.SAMPLE_CAM_P,
)


def strip_to_net_inputs(batch):
    """Drops GT-only keys from a device sample (inference mode)."""
    return {k: v for k, v in batch.items()
            if k in NET_INPUT_SAMPLE_KEYS}


def net_inputs_from_batch(batch):
    """Extracts the MonoPSRNet call arguments from a sample batch dict."""
    batch = decode_device_sample(batch)
    return dict(
        image=batch['image'],
        boxes_2d=batch[C.SAMPLE_LABEL_BOXES_2D],
        boxes_2d_norm=batch[C.SAMPLE_LABEL_BOXES_2D_NORM],
        view_angs=batch[C.SAMPLE_VIEWING_ANGLES_2D],
        class_indices=batch[C.SAMPLE_LABEL_CLASS_INDICES],
        mean_lwh=batch[C.SAMPLE_MEAN_LWH],
        prop_cen_z_offsets=batch[C.SAMPLE_PROP_CEN_Z_OFFSET],
        cen_y_offsets=batch[kd.SAMPLE_CEN_Y_OFFSETS],
        cam_p=batch[C.SAMPLE_CAM_P],
    )


def build_gt_dict(cfg: NetConfig, batch, outputs):
    """Assembles the ground-truth dict (device-side, one batched gather).

    Equivalent to the reference's in-graph GT subgraphs: the 2x32
    Python-unrolled instance crops (ref: monopsr_model.py:159-205), the
    box-GT block (:262-283), and the per-head offset targets computed in
    the output builder. Offset targets intentionally depend on live
    predictions without stop_gradient — the reference's loss couples
    through them (e.g. gt lwh offsets = gt_lwh - pred_lwh,
    ref: monopsr_output_builder.py:656).
    """
    batch = decode_device_sample(batch)
    cam_p = batch[C.SAMPLE_CAM_P]
    boxes_2d = batch[C.SAMPLE_LABEL_BOXES_2D]
    boxes_3d = batch[C.SAMPLE_LABEL_BOXES_3D]
    view_angs_2d = batch[C.SAMPLE_VIEWING_ANGLES_2D]

    gt = {}

    # GT instance crops (local + global) from the depth map
    gt_local, gt_valid = instance.instance_xyz_crop_from_depth_map(
        batch[C.SAMPLE_DEPTH_MAP],
        batch[kd.SAMPLE_INSTANCE_IMAGE],
        batch[kd.SAMPLE_INSTANCE_INDICES],
        boxes_2d, boxes_3d, view_angs_2d, cam_p,
        cfg.map_roi_size, view_norm=True,
        centroid_type=cfg.centroid_type, rotate_view=cfg.rotate_view)
    gt_global, _ = instance.instance_xyz_crop_from_depth_map(
        batch[C.SAMPLE_DEPTH_MAP],
        batch[kd.SAMPLE_INSTANCE_IMAGE],
        batch[kd.SAMPLE_INSTANCE_INDICES],
        boxes_2d, boxes_3d, view_angs_2d, cam_p,
        cfg.map_roi_size, view_norm=False,
        centroid_type=cfg.centroid_type, rotate_view=cfg.rotate_view)

    gt[C.KEY_INST_XYZ_MAP_LOCAL] = gt_local
    gt[C.KEY_INST_XYZ_MAP_GLOBAL] = gt_global
    gt[C.KEY_VALID_MASK_MAPS] = gt_valid

    # Box ground truth (ref: monopsr_model.py:262-283)
    gt_cen_x = boxes_3d[:, 0:1]
    if cfg.centroid_type == 'middle':
        gt_cen_y = boxes_3d[:, 1:2] - boxes_3d[:, 5:6] / 2.0
    else:
        gt_cen_y = boxes_3d[:, 1:2]
    gt_cen_z = boxes_3d[:, 2:3]

    gt[C.KEY_CENTROIDS] = jnp.concatenate(
        [gt_cen_x, gt_cen_y, gt_cen_z], axis=1)
    gt[C.KEY_LWH] = boxes_3d[:, 3:6]
    gt[C.KEY_ALPHA] = batch[C.SAMPLE_ALPHAS][:, None]
    gt[C.KEY_ALPHA_BINS] = batch[C.SAMPLE_ALPHA_BINS]
    gt[C.KEY_ALPHA_REGS] = batch[C.SAMPLE_ALPHA_REGS]
    gt['alpha_valid_bins'] = batch[C.SAMPLE_ALPHA_VALID_BINS]
    gt[C.KEY_VIEW_ANG] = batch[C.SAMPLE_VIEWING_ANGLES_3D][:, None]

    # Offset targets (live-prediction-coupled, see docstring)
    gt[C.KEY_LWH + '_offs'] = gt[C.KEY_LWH] - outputs[C.KEY_LWH]
    gt[C.KEY_VIEW_ANG + '_offs'] = (
        gt[C.KEY_VIEW_ANG] - view_angs_2d[:, None])
    gt[C.KEY_CEN_Y + '_offs'] = gt_cen_y - outputs['prop_cen_y']
    gt[C.KEY_CEN_Z + '_offs'] = gt_cen_z - outputs[C.KEY_PROP_CEN_Z]
    gt[C.KEY_CEN_Y] = gt_cen_y
    gt[C.KEY_CEN_Z] = gt_cen_z

    return gt


def add_global_outputs(cfg: NetConfig, batch, outputs, gt):
    """Global xyz/depth maps and the projection-alignment error.

    Equivalent to the reference's train/val global-map block
    (ref: monopsr_model.py:416-461): the predicted local xyz map is
    placed at [cen_z*tan(gt_view), pred_cen_y, pred_cen_z], rotated by
    the GT viewing angle, projected through cam_p, and compared against
    the expected ROI pixel grid.
    """
    cam_p = batch[C.SAMPLE_CAM_P]
    boxes_2d = batch[C.SAMPLE_LABEL_BOXES_2D]
    gt_view_angs = gt[C.KEY_VIEW_ANG]

    pred_local = outputs[C.KEY_INST_XYZ_MAP_LOCAL]
    pred_cen_y = outputs[C.KEY_CEN_Y]
    pred_cen_z = outputs[C.KEY_CEN_Z]

    x_offset = -cam_p[0, 3] / cam_p[0, 0]
    proj_cen_x = pred_cen_z * jnp.tan(gt_view_angs) + x_offset
    proj_cen = jnp.concatenate([proj_cen_x, pred_cen_y, pred_cen_z],
                               axis=1)

    pred_global = instance.inst_xyz_map_local_to_global(
        pred_local, gt_view_angs, proj_cen)
    outputs[C.KEY_INST_XYZ_MAP_GLOBAL] = pred_global

    outputs['proj_err_norm'] = instance.proj_err_maps_norm(
        pred_global, boxes_2d, gt[C.KEY_VALID_MASK_MAPS], cam_p,
        cfg.map_roi_size)

    # Global depth maps (ref: monopsr_model.py:449-461)
    pred_local_depth = pred_local[:, :, :, 2:3]
    outputs[C.KEY_INST_DEPTH_MAP_GLOBAL] = (
        instance.inst_depth_map_local_to_global(
            pred_local_depth, pred_cen_z, boxes_2d,
            outputs[C.KEY_VIEW_ANG], cfg.map_roi_size, cam_p,
            rotate_view=cfg.rotate_view))
    gt[C.KEY_INST_DEPTH_MAP_GLOBAL] = (
        gt[C.KEY_INST_XYZ_MAP_GLOBAL][:, :, :, 2:3])

    # xyz-from-depth variant: backproject the predicted global depth map
    # over the box ROI pixel grid (ref: monopsr_output_builder.py:774-802;
    # the reference builds it per box with tf_depth_patch_to_pc_map, here
    # it is one batched op). GT is the global instance xyz crop.
    if cfg.xyz_from_depth:
        from monopsr_tpu.geometry import projection
        depth_global = outputs[C.KEY_INST_DEPTH_MAP_GLOBAL][:, :, :, 0]
        outputs[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH] = (
            projection.depth_patch_to_pc_map_batch(
                depth_global, boxes_2d, cam_p, cfg.map_roi_size))
        gt[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH] = (
            gt[C.KEY_INST_XYZ_MAP_GLOBAL])

    return outputs, gt


def compute_losses(cfg: NetConfig, loss_config, outputs, gt):
    """Full loss stack (ref: monopsr_model.py:554-958).

    Args:
        loss_config: dict of {name: [loss_type, weight, ...]} from YAML.

    Returns:
        (losses_dict, total_loss scalar)
    """
    num_boxes = cfg.num_boxes
    roi_pixels = cfg.map_roi_size[0] * cfg.map_roi_size[1]
    ones_mask = jnp.ones((1, num_boxes, 1), jnp.float32)

    losses = {}
    total = 0.0

    # Local instance xyz maps
    xyz_loss = loss_lib.apply_loss(
        loss_config['inst_xyz_map_local'],
        outputs[C.KEY_INST_XYZ_MAP_LOCAL],
        gt[C.KEY_INST_XYZ_MAP_LOCAL],
        gt[C.KEY_VALID_MASK_MAPS]) / num_boxes
    losses[C.KEY_INST_XYZ_MAP_LOCAL] = xyz_loss
    total += xyz_loss

    # Valid mask maps: label smoothing, per-pixel normalize, sum over N
    gt_masks_smoothed = gt[C.KEY_VALID_MASK_MAPS] * 0.998 + 0.001
    mask_map_loss = loss_lib.apply_loss(
        loss_config['valid_mask_maps'],
        outputs[C.KEY_VALID_MASK_MAPS], gt_masks_smoothed,
        jnp.ones_like(gt_masks_smoothed))
    mask_loss = jnp.sum(jnp.sum(mask_map_loss, axis=(1, 2)) / roi_pixels)
    losses[C.KEY_VALID_MASK_MAPS] = mask_loss
    total += mask_loss

    # lwh offsets
    if cfg.lwh_type == 'offset':
        lwh_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['lwh'],
            outputs[C.KEY_LWH + '_offs'][None],
            gt[C.KEY_LWH + '_offs'][None], ones_mask)) / num_boxes
        losses[C.KEY_LWH + '_offs'] = lwh_loss
        total += lwh_loss

    # alpha (discrete-continuous)
    if cfg.alpha_type in ('dc', 'dc_rotation'):
        eps = loss_config['alpha_cls'][2]
        nb = cfg.num_alpha_bins
        one_hot = (jnp.eye(nb)[gt[C.KEY_ALPHA_BINS]] *
                   (1.0 - eps - eps / nb) + eps / nb)
        bins_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['alpha_cls'],
            outputs[C.KEY_ALPHA_BINS][None], one_hot[None],
            ones_mask)) / num_boxes
        regs_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['alpha_reg'],
            outputs[C.KEY_ALPHA_REGS][None],
            gt[C.KEY_ALPHA_REGS][None],
            gt['alpha_valid_bins'][None])) / num_boxes
        losses[C.KEY_ALPHA_BINS] = bins_loss
        losses[C.KEY_ALPHA_REGS] = regs_loss
        total += bins_loss + regs_loss

    # alpha (prob variant): softmax-temperature CE on the bin logits vs
    # one-hot GT bins, plus regression on the decoded alpha (the softmax
    # expectation over bin centres) vs GT alpha
    # (ref: monopsr_model.py:714-760)
    elif cfg.alpha_type == 'prob':
        nb = cfg.num_alpha_bins
        one_hot = jnp.eye(nb)[gt[C.KEY_ALPHA_BINS]]
        bins_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['alpha_cls_temp'],
            outputs[C.KEY_ALPHA_BINS][None], one_hot[None],
            ones_mask)) / num_boxes
        alpha_reg_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['alpha_reg'],
            outputs[C.KEY_ALPHA][None],
            gt[C.KEY_ALPHA][None], ones_mask)) / num_boxes
        losses[C.KEY_ALPHA_BINS] = bins_loss
        losses[C.KEY_ALPHA] = alpha_reg_loss
        total += bins_loss + alpha_reg_loss

    # cen_z offsets
    if cfg.cen_z_type == 'offset':
        cen_z_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['cen_z'],
            outputs[C.KEY_CEN_Z + '_offs'][None],
            gt[C.KEY_CEN_Z + '_offs'][None], ones_mask)) / num_boxes
        losses[C.KEY_CEN_Z + '_offs'] = cen_z_loss
        total += cen_z_loss

    # view angle offsets
    if cfg.view_ang_type == 'offset':
        va_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['view_ang'],
            outputs[C.KEY_VIEW_ANG + '_offs'][None],
            gt[C.KEY_VIEW_ANG + '_offs'][None], ones_mask)) / num_boxes
        losses[C.KEY_VIEW_ANG + '_offs'] = va_loss
        total += va_loss

    # cen_y offsets
    if cfg.cen_y_type == 'offset':
        cen_y_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['cen_y'],
            outputs[C.KEY_CEN_Y + '_offs'][None],
            gt[C.KEY_CEN_Y + '_offs'][None], ones_mask)) / num_boxes
        losses[C.KEY_CEN_Y + '_offs'] = cen_y_loss
        total += cen_y_loss

    # Projection-alignment loss. The reference adds the unsummed (1, N)
    # loss tensor to the scalar; TF's implicit-sum gradient makes that
    # equivalent to a sum with no /num_boxes (ref: monopsr_model.py:876-897)
    if 'proj_err_norm' in outputs:
        proj_err = outputs['proj_err_norm'].reshape(1, -1, 1)
        proj_loss = jnp.sum(loss_lib.apply_loss(
            loss_config['inst_xyz_map_global'],
            proj_err, jnp.zeros_like(proj_err), ones_mask))
        losses['proj_err'] = proj_loss
        total += proj_loss

    # Global depth maps
    if C.KEY_INST_DEPTH_MAP_GLOBAL in outputs:
        depth_loss = loss_lib.apply_loss(
            loss_config['inst_depth_map_global'],
            outputs[C.KEY_INST_DEPTH_MAP_GLOBAL],
            gt[C.KEY_INST_DEPTH_MAP_GLOBAL],
            gt[C.KEY_VALID_MASK_MAPS]) / num_boxes
        losses[C.KEY_INST_DEPTH_MAP_GLOBAL] = depth_loss
        total += depth_loss

    # xyz-from-depth global maps (ref: monopsr_model.py:927-955). The
    # reference accidentally masks with the GT xyz map itself
    # (monopsr_model.py:935 reuses the xyz-map dict entry as the mask);
    # the valid-mask maps are the intended mask and are used here.
    if C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH in outputs:
        from_depth_loss = loss_lib.apply_loss(
            loss_config[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH],
            outputs[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH],
            gt[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH],
            gt[C.KEY_VALID_MASK_MAPS]) / num_boxes
        losses[C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH] = from_depth_loss
        total += from_depth_loss

    losses['total_loss'] = total
    return losses, total


def slice_box_slots(tree, num_boxes, max_slots):
    """Truncates every per-box leaf (leading dim == num_boxes) to
    max_slots slots. Downstream consumers only read [0:num_objs] rows,
    so any max_slots >= the batch's max num_objs is lossless."""
    if max_slots is None or max_slots >= num_boxes:
        return tree
    return jax.tree.map(
        lambda x: x[:max_slots]
        if (hasattr(x, 'ndim') and x.ndim >= 1 and
            x.shape[0] == num_boxes) else x,
        tree)


def pack_outputs_for_host(outputs, num_boxes=None, max_slots=None):
    """Shrinks the per-sample output dict for device->host transfer.

    The instance xyz maps dominate transfer bytes; they are saved as
    float16 anyway (eval/predictions.save_predictions casts), and the
    mask logits are only ever thresholded at 0 — so cast/threshold on
    device and halve (xyz) / eighth (mask) the bytes before the pull.
    With num_boxes + max_slots, additionally truncates the per-box axis
    to max_slots slots (callers pick a bucket >= the batch's max
    num_objs, cutting the pull bytes ~4x when most slots are padding).
    Pure transfer-layer optimization: host consumers see identical
    results.
    """
    packed = dict(outputs)
    if C.KEY_INST_XYZ_MAP_LOCAL in packed:
        packed[C.KEY_INST_XYZ_MAP_LOCAL] = (
            packed[C.KEY_INST_XYZ_MAP_LOCAL].astype(jnp.float16))
    if C.KEY_VALID_MASK_MAPS in packed:
        packed[C.KEY_VALID_MASK_MAPS] = (
            packed[C.KEY_VALID_MASK_MAPS] > 0.0)
    # Train/val-only diagnostic maps are recomputable host-side and not
    # part of the per-sample deliverable; keep the transfer lean.
    packed.pop(C.KEY_INST_XYZ_MAP_GLOBAL, None)
    packed.pop(C.KEY_INST_DEPTH_MAP_GLOBAL, None)
    packed.pop(C.KEY_INST_XYZ_MAP_GLOBAL_FROM_DEPTH, None)
    if num_boxes is not None:
        packed = slice_box_slots(packed, num_boxes, max_slots)
    return packed


def compute_metrics(cfg: NetConfig, outputs, gt):
    """In-graph eval metrics (ref: monopsr_model.py:1104-1223).

    Returns per-box arrays over all slots; the caller slices [0:num_objs]
    host-side like the reference.
    """
    metrics = {}

    valid = gt[C.KEY_VALID_MASK_MAPS]
    pred_pts = (outputs[C.KEY_INST_XYZ_MAP_LOCAL] * valid).reshape(
        cfg.num_boxes, -1, 3)
    gt_pts = (gt[C.KEY_INST_XYZ_MAP_LOCAL] * valid).reshape(
        cfg.num_boxes, -1, 3)
    num_valid = jnp.maximum(jnp.sum(valid, axis=(1, 2, 3)), 1.0)

    emd_all = emd_ops.emd_cost_fused(pred_pts, gt_pts)
    metrics[C.METRIC_EMD] = emd_all / num_valid

    dist1, _, dist2, _ = chamfer_ops.nn_distance(pred_pts, gt_pts)
    chamfer_all = jnp.sum(dist1, axis=1) + jnp.sum(dist2, axis=1)
    metrics[C.METRIC_CHAMFER] = chamfer_all / num_valid

    gt_cens = gt[C.KEY_CENTROIDS]
    pred_cens = outputs[C.KEY_CENTROIDS]
    cen_errs = gt_cens - pred_cens
    metrics[C.METRIC_PROP_CEN_Z_ERR] = (
        gt_cens[:, 2:3] - outputs[C.KEY_PROP_CEN_Z])[:, 0]
    metrics[C.METRIC_CEN_X_ERR] = cen_errs[:, 0]
    metrics[C.METRIC_CEN_Y_ERR] = cen_errs[:, 1]
    metrics[C.METRIC_CEN_Z_ERR] = cen_errs[:, 2]

    metrics[C.METRIC_DIM_ERR] = (
        gt[C.KEY_LWH + '_offs'] - outputs[C.KEY_LWH + '_offs'])
    metrics[C.METRIC_VIEW_ANG_ERR] = (
        gt[C.KEY_VIEW_ANG] - outputs[C.KEY_VIEW_ANG])[:, 0]

    return metrics
