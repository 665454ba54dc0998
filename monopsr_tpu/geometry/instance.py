"""Batched instance-crop geometry (JAX, jit/TPU-native).

This is the geometric heart of MonoPSR. The reference builds these per box
with Python-unrolled TF subgraphs (ref: monopsr_model.py:159-205 looping
instance_utils.tf_instance_xyz_crop_from_depth_map, instance_utils.py:395-481);
here every op is batched over the proposal axis with static shapes:

- GT instance xyz crops from a depth map + instance image (one gather)
- local <-> global instance map transforms
- expected-projection error maps (projection-alignment loss)
- proposal centroid estimates (cen_y from box projection)

All GT-producing functions stop gradients (the reference wraps crops in
tf.stop_gradient, ref: instance_utils.py:481).
"""

import jax
import jax.numpy as jnp

from monopsr_tpu.geometry import projection, transforms


def instance_xyz_crop_from_depth_map(depth_map,
                                     instance_img,
                                     inst_indices,
                                     boxes_2d,
                                     boxes_3d,
                                     view_angs,
                                     cam_p,
                                     roi_size,
                                     view_norm,
                                     centroid_type='middle',
                                     rotate_view=True):
    """Builds GT instance xyz maps for all boxes in one batched gather.

    Equivalent to the reference's per-box mask + crop +
    resize_nearest(align_corners=True) + backproject + view-normalize
    pipeline (ref: instance_utils.py:395-481), restructured so the mask
    multiply happens at the 48x48 gathered samples instead of at full
    resolution (identical result, ~300x less memory traffic).

    Args:
        depth_map: (H, W) depth map (padded to a static bucket; padding
            must be zero so it is masked out as invalid).
        instance_img: (H, W) int32 instance image; each pixel holds the
            original label index, 255 = background.
        inst_indices: (N,) int32 original label index per box slot.
        boxes_2d: (N, 4) [y1, x1, y2, x2] pixel boxes (unrounded).
        boxes_3d: (N, 7) GT boxes_3d.
        view_angs: (N,) viewing angles used for view normalization.
        cam_p: (3, 4) camera projection matrix.
        roi_size: (h, w) static ROI size.
        view_norm: whether to shift (and optionally rotate) into the local
            instance frame.
        centroid_type: 'middle' or 'bottom'.
        rotate_view: rotate by -viewing angle during view normalization.

    Returns:
        xyz_out: (N, h, w, 3) instance xyz maps (stop-gradient).
        valid_mask: (N, h, w, 1) valid-pixel mask.
    """
    roi_h, roi_w = roi_size
    depth_map = jnp.asarray(depth_map)
    instance_img = jnp.asarray(instance_img)
    height, width = depth_map.shape

    boxes_r = jnp.round(boxes_2d).astype(jnp.int32)
    y1, x1, y2, x2 = (boxes_r[:, i] for i in range(4))
    ch = jnp.maximum(y2 - y1, 1)
    cw = jnp.maximum(x2 - x1, 1)

    # Nearest align_corners sampling grid into the full-res maps.
    iy = jnp.arange(roi_h, dtype=jnp.float32)[None, :]
    ix = jnp.arange(roi_w, dtype=jnp.float32)[None, :]
    scale_y = (ch - 1).astype(jnp.float32) / max(roi_h - 1, 1)
    scale_x = (cw - 1).astype(jnp.float32) / max(roi_w - 1, 1)
    src_y = y1[:, None] + jnp.round(iy * scale_y[:, None]).astype(jnp.int32)
    src_x = x1[:, None] + jnp.round(ix * scale_x[:, None]).astype(jnp.int32)
    src_y = jnp.clip(src_y, 0, height - 1)
    src_x = jnp.clip(src_x, 0, width - 1)

    # One-hot matmul selection instead of a flat gather: the (N,48,48)
    # nearest sample of both full-res maps is two MXU contractions per
    # map. Measured 17.7x over the gather form at batch-8 production
    # shapes (9.5 -> 0.53 ms/step, scripts/diag_gt_gather.py) — row
    # gathers serialize on the sparse core. Precision.HIGHEST makes the
    # select BIT-EXACT: 3-pass bf16 covers the full f32 mantissa and
    # every product is value*1.0 (the default single-pass would round
    # depth to bf16).
    ar_h = jnp.arange(height, dtype=jnp.int32)
    ar_w = jnp.arange(width, dtype=jnp.int32)
    sel_y = (ar_h == src_y[..., None]).astype(jnp.float32)  # (N, h, H)
    sel_x = (ar_w == src_x[..., None]).astype(jnp.float32)  # (N, w, W)
    both = jnp.stack([depth_map.astype(jnp.float32),
                      instance_img.astype(jnp.float32)])    # (2, H, W)
    tmp = jnp.einsum('nyh,chw->ncyw', sel_y, both,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    samples = jnp.einsum('ncyw,nxw->ncyx', tmp, sel_x,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    depth_samples = samples[:, 0]
    inst_samples = samples[:, 1].astype(jnp.int32)

    mask = (inst_samples == inst_indices[:, None, None]).astype(
        depth_samples.dtype)
    depth_resized = depth_samples * mask

    # Valid pixels: nonzero masked depth (ref: instance_utils.py:436-437)
    valid_mask = (jnp.abs(depth_resized) >= 0.1).astype(depth_samples.dtype)

    # Backproject with pixel-centre sampling over the unrounded box.
    pc_map = projection.depth_patch_to_pc_map_batch(
        depth_resized, boxes_2d, cam_p, roi_size, use_pixel_centres=True)

    if view_norm:
        x_offset = -cam_p[0, 3] / cam_p[0, 0]
        cen = boxes_3d[:, 0:3] - jnp.stack(
            [jnp.full_like(boxes_3d[:, 0], x_offset),
             jnp.zeros_like(boxes_3d[:, 0]),
             jnp.zeros_like(boxes_3d[:, 0])], axis=1)
        if centroid_type == 'middle':
            half_h = boxes_3d[:, 5] / 2.0
            cen = cen - jnp.stack(
                [jnp.zeros_like(half_h), half_h,
                 jnp.zeros_like(half_h)], axis=1)

        points = pc_map.reshape(pc_map.shape[0], -1, 3)
        if rotate_view:
            # T(-c) then R(-view): rotate(points - c, -view)
            points_local = transforms.rotate_y_batch(
                points - cen[:, None, :], -view_angs)
        else:
            points_local = points - cen[:, None, :]
        xyz_out = points_local.reshape(pc_map.shape) * valid_mask[..., None]
    else:
        xyz_out = pc_map * valid_mask[..., None]

    return jax.lax.stop_gradient(xyz_out), valid_mask[..., None]


def inst_xyz_map_local_to_global(inst_xyz_map_local, view_angs, centroids):
    """Local instance xyz maps -> global camera-frame maps.

    Rotate by +viewing angle, then translate to the centroid
    (ref: instance_utils.py:567-604).

    Args:
        inst_xyz_map_local: (N, h, w, 3).
        view_angs: (N,) or (N, 1) viewing angles.
        centroids: (N, 3) centroids.

    Returns:
        (N, h, w, 3) global instance xyz maps.
    """
    n, h, w, _ = inst_xyz_map_local.shape
    view_angs = jnp.reshape(view_angs, (-1,))
    points = inst_xyz_map_local.reshape(n, h * w, 3)
    rotated = transforms.rotate_y_batch(points, view_angs)
    global_points = rotated + centroids[:, None, :]
    return global_points.reshape(n, h, w, 3)


def inst_depth_map_local_to_global(inst_depth_map_local, global_depth,
                                   boxes_2d=None, inst_view_ang=None,
                                   map_roi_size=None, cam_p=None,
                                   rotate_view=False):
    """Local instance depth maps -> global depth maps.

    Adds the predicted centroid depth; with rotate_view, also undoes the
    view rotation's depth skew by linearly interpolating a per-column
    depth offset between the box's left and right viewing-angle edges
    (ref: instance_utils.py:607-681).

    Deviation from the reference: the interpolated offset varies along the
    map's width axis (the horizontal direction it is derived from); the
    reference tiles it along the height axis (instance_utils.py:662-669),
    which transposes the correction on non-square ROIs.

    Args:
        inst_depth_map_local: (N, h, w, 1).
        global_depth: (N, 1) predicted cen_z.
        boxes_2d: (N, 4) 2D boxes.
        inst_view_ang: (N, 1) viewing angles.
        map_roi_size: (h, w).
        cam_p: (3, 4).
        rotate_view: undo view normalization rotation.

    Returns:
        (N, h, w, 1) global depth maps.
    """
    cen_z = global_depth.reshape(-1, 1, 1, 1)

    if not rotate_view:
        return inst_depth_map_local + cen_z

    roi_h, roi_w = map_roi_size
    cu = cam_p[0, 2]
    f = cam_p[0, 0]

    box_x1 = boxes_2d[:, 1]
    box_x2 = boxes_2d[:, 3]

    # Account for pixel centres
    grid_spacing = (box_x2 - box_x1) / roi_w / 2.0
    box_x1 = box_x1 + grid_spacing
    box_x2 = box_x2 - grid_spacing

    view_ang = jnp.reshape(inst_view_ang, (-1,))
    view_l = jnp.arctan2((box_x1 - cu) / f, 1.0)
    view_r = jnp.arctan2((box_x2 - cu) / f, 1.0)

    def safe_cos(a):
        c = jnp.cos(a)
        return jnp.where(jnp.abs(c) < 1e-3,
                         jnp.where(c < 0, -1e-3, 1e-3), c)

    inst_xz = jnp.reshape(global_depth, (-1,)) / safe_cos(view_ang)
    l_o = inst_xz / safe_cos(view_l - view_ang)
    r_o = inst_xz / safe_cos(view_r - view_ang)
    x_l = l_o * jnp.sin(view_l - view_ang)
    x_r = r_o * jnp.sin(view_r - view_ang)
    offset_l = x_l * jnp.sin(view_ang)
    offset_r = x_r * jnp.sin(view_ang)

    t = jnp.linspace(0.0, 1.0, roi_w)[None, :]
    col_offset = (-offset_l)[:, None] + t * (offset_l - offset_r)[:, None]
    col_offset = col_offset[:, None, :, None]   # (N, 1, w, 1)

    return inst_depth_map_local + cen_z + col_offset


def proj_err_maps_norm(pred_inst_xyz_map_global, pred_boxes_2d,
                       valid_mask_maps, cam_p, map_roi_size):
    """Normalized projection-alignment error per box.

    Projects predicted global instance points through cam_p, subtracts the
    expected evenly-spaced ROI pixel grid, normalizes by box size, masks,
    clips to +-2, and averages over valid pixels
    (ref: monopsr_output_builder.py:681-746).

    Returns:
        (N,) mean normalized projection error per box.
    """
    n, h, w, _ = pred_inst_xyz_map_global.shape

    pc_global = jnp.transpose(
        pred_inst_xyz_map_global, (0, 3, 1, 2)).reshape(n, 3, h * w)

    exp_uv = projection.get_exp_proj_uv_map_batch(
        pred_boxes_2d, map_roi_size, use_pixel_centres=True)

    proj_uv = projection.project_pc_to_image_batch(pc_global, cam_p)
    proj_uv_map = jnp.transpose(proj_uv, (0, 2, 1)).reshape(n, h, w, 2)

    err = exp_uv - proj_uv_map

    boxes_h = pred_boxes_2d[:, 2] - pred_boxes_2d[:, 0]
    boxes_w = pred_boxes_2d[:, 3] - pred_boxes_2d[:, 1]
    boxes_wh = jnp.stack([boxes_w, boxes_h], axis=1).reshape(n, 1, 1, 2)

    err_norm = err / boxes_wh
    # where (not multiply): invalid pixels may hold z=0 points whose
    # projection is NaN, and NaN * 0 would poison the reduction.
    err_norm = jnp.where(valid_mask_maps > 0, err_norm,
                         jnp.zeros((), err_norm.dtype))
    err_norm = jnp.clip(err_norm, -2.0, 2.0)

    num_valid = jnp.sum(valid_mask_maps, axis=(1, 2, 3))
    num_valid = jnp.where(num_valid < 1.0, jnp.ones_like(num_valid),
                          num_valid)

    return jnp.sum(err_norm, axis=(1, 2, 3)) / num_valid


def est_y_from_box_2d_and_depth(cam_p, boxes_2d, depth, cen_y_offsets):
    """Estimates cen_y by projecting the 2D box centre at the given depth.

    The per-class trend offset is supplied per box (host side computes it
    from class strings; ref: instance_utils.py:907-953 hardcodes a single
    class per run).

    Args:
        cam_p: (3, 4).
        boxes_2d: (N, 4) [y1, x1, y2, x2].
        depth: (N, 1) depth estimates.
        cen_y_offsets: (N,) per-box trend offsets (subtracted).

    Returns:
        (N, 1) cen_y estimates.
    """
    f = cam_p[0, 0]
    cv = cam_p[1, 2]
    centre_v = ((boxes_2d[:, 2] + boxes_2d[:, 0]) / 2.0 - cv)[:, None]
    return centre_v * (depth / f) - cen_y_offsets.reshape(-1, 1)


def prop_cen_z_from_box_height(cam_p, boxes_2d, est_obj_h, offsets):
    """Pinhole similar-triangles depth proposal: f * h3d / h2d + offset
    (ref: monopsr_output_builder.py:407-431).

    Args:
        cam_p: (3, 4).
        boxes_2d: (N, 4).
        est_obj_h: (N,) estimated 3D object heights.
        offsets: (N,) per-class proposal offsets.

    Returns:
        (N, 1) proposal cen_z.
    """
    f = cam_p[0, 0]
    boxes_h = boxes_2d[:, 2] - boxes_2d[:, 0]
    return (f * est_obj_h / boxes_h + offsets)[:, None]
