"""ip_basic multi-scale depth completion (host, OpenCV).

Behavioral twin of the reference depth-completion recipe
(ref: src/ip_basic/ip_basic.py:40-193): depth-binned dilation with cross
kernels (3/5/7 by range), morphological closure, median/bilateral blurs,
top-mask extension, all in inverted-depth space around max_depth.
"""

import collections

import cv2
import numpy as np


def _cross_kernel(size):
    kernel = np.zeros((size, size), np.uint8)
    kernel[size // 2, :] = 1
    kernel[:, size // 2] = 1
    return kernel


FULL_KERNEL_5 = np.ones((5, 5), np.uint8)
FULL_KERNEL_9 = np.ones((9, 9), np.uint8)
FULL_KERNEL_31 = np.ones((31, 31), np.uint8)
CROSS_KERNEL_3 = _cross_kernel(3)
CROSS_KERNEL_5 = _cross_kernel(5)
CROSS_KERNEL_7 = _cross_kernel(7)


def fill_in_multiscale(depth_map, max_depth=100.0,
                       dilation_kernel_far=CROSS_KERNEL_3,
                       dilation_kernel_med=CROSS_KERNEL_5,
                       dilation_kernel_near=CROSS_KERNEL_7,
                       extrapolate=False,
                       blur_type='bilateral',
                       show_process=False):
    """Densifies a sparse projected-LiDAR depth map.

    Depth bins: near (0.1, 15], med (15, 30], far (30, inf); each bin is
    dilated with progressively smaller kernels (nearer objects appear
    larger). Work happens in inverted depth (max_depth - d) so dilation
    prefers closer surfaces.

    Args:
        depth_map: (H, W) sparse depths (0 = empty).
        max_depth: inversion offset.
        extrapolate: extend each column's top-most depth to the image top.
        blur_type: 'bilateral' (structure-preserving) or 'gaussian'.
        show_process: also return intermediate stages.

    Returns:
        (dense_depth_map, process_dict or None)
    """
    depths_in = np.float32(depth_map)

    near_mask = (depths_in > 0.1) & (depths_in <= 15.0)
    med_mask = (depths_in > 15.0) & (depths_in <= 30.0)
    far_mask = depths_in > 30.0

    # Invert
    inverted = np.copy(depths_in)
    valid = inverted > 0.1
    inverted[valid] = max_depth - inverted[valid]

    # Per-bin dilation, merged far -> near so near wins
    dilated_far = cv2.dilate(inverted * far_mask, dilation_kernel_far)
    dilated_med = cv2.dilate(inverted * med_mask, dilation_kernel_med)
    dilated_near = cv2.dilate(inverted * near_mask, dilation_kernel_near)

    dilated = np.copy(inverted)
    for layer in (dilated_far, dilated_med, dilated_near):
        mask = layer > 0.1
        dilated[mask] = layer[mask]

    # Small hole closure
    closed = cv2.morphologyEx(dilated, cv2.MORPH_CLOSE, FULL_KERNEL_5)

    # Median blur on valid pixels
    median_stage = np.copy(closed)
    blurred = cv2.medianBlur(closed, 5)
    valid = closed > 0.1
    median_stage[valid] = blurred[valid]

    # Fill holes below each column's top-most valid pixel
    top_rows = np.argmax(median_stage > 0.1, axis=0)
    rows = np.arange(median_stage.shape[0])[:, None]
    top_mask = rows >= top_rows[None, :]

    empty = (median_stage <= 0.1) & top_mask
    hole_dilated = cv2.dilate(median_stage, FULL_KERNEL_9)
    filled = np.copy(median_stage)
    filled[empty] = hole_dilated[empty]

    # Optionally extend the top-most value to the image top
    extended = np.copy(filled)
    top_rows = np.argmax(filled > 0.1, axis=0)
    top_mask = rows >= top_rows[None, :]
    if extrapolate:
        top_vals = filled[top_rows, np.arange(filled.shape[1])]
        below_top = rows < top_rows[None, :]
        extended[below_top] = np.broadcast_to(
            top_vals[None, :], extended.shape)[below_top]
        top_mask = np.ones_like(top_mask)

    # Large-hole fill: repeated masked dilation
    result = np.copy(extended)
    for _ in range(6):
        empty = (result < 0.1) & top_mask
        grown = cv2.dilate(result, FULL_KERNEL_5)
        result[empty] = grown[empty]

    # Median blur
    blurred = cv2.medianBlur(result, 5)
    valid = (result > 0.1) & top_mask
    result[valid] = blurred[valid]

    # Final smoothing
    if blur_type == 'gaussian':
        blurred = cv2.GaussianBlur(result, (5, 5), 0)
        valid = (result > 0.1) & top_mask
        result[valid] = blurred[valid]
    elif blur_type == 'bilateral':
        blurred = cv2.bilateralFilter(result, 5, 0.5, 2.0)
        result[valid] = blurred[valid]

    # Un-invert
    out = np.copy(result)
    valid = out > 0.1
    out[valid] = max_depth - out[valid]

    process_dict = None
    if show_process:
        process_dict = collections.OrderedDict(
            depths_in=depths_in, inverted=inverted, dilated=dilated,
            closed=closed, median=median_stage, filled=filled,
            extended=extended, result=result, out=out)

    return out, process_dict
