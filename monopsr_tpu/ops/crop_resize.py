"""ROI crop-and-resize ops with TF semantics, as batched XLA gathers.

Replaces the reference's `tf.image.crop_and_resize` (bilinear, normalized
boxes; ref: monopsr_model.py:223-226, net_builder.py:56-60) and the per-box
`crop + tf.image.resize_nearest_neighbor(align_corners=True)` pattern
(ref: instance_utils.py:419-429) with fully batched flat gathers over a
static (N, roi_h, roi_w) output — no dynamic shapes, no per-box loops.

All gathers index a flattened (H*W, C) view so intermediates stay at the
output size (important for the wide full-image feature map).
"""

import jax.numpy as jnp


def _flat_gather(image_flat, width, yi, xi):
    """Gathers (..., C) values at integer coords from an (H*W, C) view."""
    return image_flat[yi * width + xi]


def _bilinear_sample(image, in_y, in_x):
    """Bilinear-samples (H, W, C) `image` at float coord grids.

    Selection-matrix formulation: separable bilinear sampling is two
    matmuls with sparse row/col weight matrices (2 nonzeros per output
    coordinate), contracted on the MXU. On TPU this beats the
    4-corner-gather formulation ~10x at the backbone's feature-crop
    shapes — gathers serialize on the sparse core while the "wasted"
    zero-weight FLOPs (~11 GFLOP here) are noise on the MXU — and its
    VJP is two transposed matmuls instead of 4 scatter-adds.

    The larger image axis is contracted first so the intermediate stays
    at (N, out, min(H, W), C).

    Args:
        image: (H, W, C).
        in_y: (N, h) per-box row coordinates.
        in_x: (N, w) per-box column coordinates.

    Out-of-range samples return 0 (TF crop_and_resize extrapolation_value).

    Returns:
        (N, h, w, C) float32 samples.
    """
    height, width, _ = image.shape

    y_valid = (in_y >= 0) & (in_y <= height - 1)
    x_valid = (in_x >= 0) & (in_x <= width - 1)

    y = jnp.clip(in_y, 0, height - 1)
    x = jnp.clip(in_x, 0, width - 1)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0).astype(jnp.float32)
    wx = (x - x0).astype(jnp.float32)

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, height - 1)
    x1i = jnp.minimum(x0i + 1, width - 1)

    # (N, h, H) / (N, w, W) weight matrices. At a boundary clamp
    # (y0i == y1i) the two terms share an index and sum to 1, matching
    # the gather formulation exactly.
    ar_h = jnp.arange(height, dtype=jnp.int32)
    ar_w = jnp.arange(width, dtype=jnp.int32)
    sel_y = ((ar_h == y0i[..., None]) * (1.0 - wy[..., None]) +
             (ar_h == y1i[..., None]) * wy[..., None])
    sel_y = sel_y * y_valid[..., None]
    sel_x = ((ar_w == x0i[..., None]) * (1.0 - wx[..., None]) +
             (ar_w == x1i[..., None]) * wx[..., None])
    sel_x = sel_x * x_valid[..., None]

    # Low-precision images contract in their own dtype (the bf16 weight
    # rounding, <=2^-9 relative, is below the values' own quantization);
    # float32 images keep the exact float32 path.
    dt = image.dtype if image.dtype == jnp.bfloat16 else jnp.float32
    image = image.astype(dt)
    sel_y = sel_y.astype(dt)
    sel_x = sel_x.astype(dt)

    if width >= height:
        tmp = jnp.einsum('njx,yxc->njyc', sel_x, image,
                         preferred_element_type=jnp.float32).astype(dt)
        out = jnp.einsum('niy,njyc->nijc', sel_y, tmp,
                         preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum('niy,yxc->nixc', sel_y, image,
                         preferred_element_type=jnp.float32).astype(dt)
        out = jnp.einsum('njx,nixc->nijc', sel_x, tmp,
                         preferred_element_type=jnp.float32)
    return out


def crop_and_resize_bilinear(image, boxes_norm, crop_size):
    """TF `crop_and_resize` twin: bilinear, normalized [y1, x1, y2, x2] boxes.

    Args:
        image: (H, W, C) single image (all boxes crop from it).
        boxes_norm: (N, 4) normalized boxes [y1, x1, y2, x2].
        crop_size: (crop_h, crop_w) static output size.

    Returns:
        (N, crop_h, crop_w, C) crops.
    """
    crop_h, crop_w = crop_size
    height, width = image.shape[0], image.shape[1]

    y1, x1, y2, x2 = (boxes_norm[:, i] for i in range(4))

    if crop_h > 1:
        t = jnp.linspace(0.0, 1.0, crop_h, dtype=boxes_norm.dtype)[None, :]
        in_y = (y1[:, None] + t * (y2 - y1)[:, None]) * (height - 1)
    else:
        in_y = 0.5 * (y1 + y2)[:, None] * (height - 1)

    if crop_w > 1:
        t = jnp.linspace(0.0, 1.0, crop_w, dtype=boxes_norm.dtype)[None, :]
        in_x = (x1[:, None] + t * (x2 - x1)[:, None]) * (width - 1)
    else:
        in_x = 0.5 * (x1 + x2)[:, None] * (width - 1)

    return _bilinear_sample(image, in_y, in_x)


def crop_and_resize_nearest(image, boxes_2d, roi_size):
    """Crop (pixel boxes, rounded) + nearest resize with align_corners=True.

    Equivalent to `map[y1:y2, x1:x2]` followed by
    `tf.image.resize_nearest_neighbor(roi_size, align_corners=True)` —
    per TF1 semantics: scale = (in - 1) / (out - 1), src = round(i * scale)
    — computed as one batched gather with static output shape.

    Args:
        image: (H, W) or (H, W, C) input map.
        boxes_2d: (N, 4) pixel boxes [y1, x1, y2, x2] (unrounded; rounded
            internally like the reference).
        roi_size: (roi_h, roi_w) static output size.

    Returns:
        (N, roi_h, roi_w[, C]) nearest-resampled crops.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]

    roi_h, roi_w = roi_size
    height, width, channels = image.shape
    image_flat = image.reshape(height * width, channels)

    boxes_r = jnp.round(boxes_2d).astype(jnp.int32)
    y1, x1, y2, x2 = (boxes_r[:, i] for i in range(4))

    # Crop spans; invalid boxes fall back to a single pixel
    # (matching get_valid_inst_box_2d_crop, ref: instance_utils.py:51-78).
    ch = jnp.maximum(y2 - y1, 1)
    cw = jnp.maximum(x2 - x1, 1)

    iy = jnp.arange(roi_h, dtype=jnp.float32)[None, :]
    ix = jnp.arange(roi_w, dtype=jnp.float32)[None, :]

    scale_y = (ch - 1).astype(jnp.float32) / max(roi_h - 1, 1)
    scale_x = (cw - 1).astype(jnp.float32) / max(roi_w - 1, 1)

    src_y = y1[:, None] + jnp.round(iy * scale_y[:, None]).astype(jnp.int32)
    src_x = x1[:, None] + jnp.round(ix * scale_x[:, None]).astype(jnp.int32)

    src_y = jnp.clip(src_y, 0, height - 1)
    src_x = jnp.clip(src_x, 0, width - 1)

    out = _flat_gather(image_flat, width,
                       src_y[:, :, None], src_x[:, None, :])

    if squeeze:
        out = out[..., 0]
    return out


def resize_bilinear_align_corners(images, out_size):
    """`tf.image.resize_images(..., align_corners=True)` twin for a batch.

    Args:
        images: (N, H, W, C) batch.
        out_size: (out_h, out_w).

    Returns:
        (N, out_h, out_w, C) bilinear-resized batch.
    """
    out_h, out_w = out_size
    n, height, width, _ = images.shape

    # align_corners=True: endpoints map exactly; same sampling grid for
    # every image. The grid is shared and constant, so the resize is two
    # dense matmuls with constant (out, in) bilinear weight matrices
    # (2 nonzeros per row) — MXU work instead of 4 corner gathers,
    # whose VJP is a transposed matmul instead of a scatter-add.
    def weights(out_n, in_n):
        coords = jnp.linspace(0.0, in_n - 1, out_n)
        i0 = jnp.floor(coords).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        frac = (coords - jnp.floor(coords)).astype(jnp.float32)
        ar = jnp.arange(in_n, dtype=jnp.int32)
        return ((ar[None, :] == i0[:, None]) * (1.0 - frac[:, None]) +
                (ar[None, :] == i1[:, None]) * frac[:, None])

    dt = images.dtype if images.dtype == jnp.bfloat16 else jnp.float32
    images = images.astype(dt)
    sel_y = weights(out_h, height).astype(dt)
    sel_x = weights(out_w, width).astype(dt)

    if width >= height:
        tmp = jnp.einsum('px,nyxc->npyc', sel_x, images,
                         preferred_element_type=jnp.float32).astype(dt)
        out = jnp.einsum('oy,npyc->nopc', sel_y, tmp,
                         preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum('oy,nyxc->noxc', sel_y, images,
                         preferred_element_type=jnp.float32).astype(dt)
        out = jnp.einsum('px,noxc->nopc', sel_x, tmp,
                         preferred_element_type=jnp.float32)
    return out.astype(dt)
