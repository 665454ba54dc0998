"""Data augmentation: image noise and 2D box jitter (host side).

Behavioral twin of the reference augmentations
(ref: src/monopsr/datasets/kitti/kitti_aug.py:124-254).
"""

import copy

import numpy as np

from monopsr_tpu.datasets.kitti import evaluation


def apply_image_noise(image_rgb, rng=None):
    """Applies the reference's random noise recipe to an RGB image.

    Channel swap (p=0.10), gaussian noise (p=0.40, sigma 10), per-channel
    shift (p=0.40, sigma 8), brightness (p=0.40, sigma 15), uniform noise
    (p=0.40, amplitude U[0, 10]).
    """
    if rng is None:
        rng = np.random
    image_rgb = np.asarray(image_rgb, dtype=np.uint8)
    image_out = image_rgb

    random_values = rng.rand(5)

    if random_values[0] < 0.10:
        image_out = np.copy(image_rgb)
        image_out[:, :, 1], image_out[:, :, 2] = (
            image_out[:, :, 2], image_out[:, :, 1])

    if random_values[1] < 0.40:
        noise = rng.randn(*image_rgb.shape) * 10.0
        image_out = np.uint8(np.clip(image_rgb + noise, 0.0, 255.0))

    if random_values[2] < 0.40:
        noise = rng.randn(3) * 8.0
        image_out = np.uint8(np.clip(image_rgb + noise, 0.0, 255.0))

    if random_values[3] < 0.40:
        brightness = rng.randn(1) * 15.0
        image_out = np.uint8(np.clip(image_rgb + brightness, 0.0, 255.0))

    if random_values[4] < 0.40:
        amount = rng.uniform(0, 10)
        noise = rng.uniform(-amount, amount, image_rgb.shape)
        image_out = np.uint8(np.clip(image_rgb + noise, 0.0, 255.0))

    return image_out


def jitter_obj_boxes_2d(obj_labels, iou_threshold_min, image_shape,
                        rng=None):
    """Rejection-samples gaussian-jittered 2D boxes with IoU >= threshold.

    Boxes under 10px in either dimension are returned unmodified; new boxes
    are clamped inside the image (ref: kitti_aug.py:173-254).
    """
    if rng is None:
        rng = np.random
    img_h, img_w = image_shape[0], image_shape[1]

    new_objs = []
    for obj_label in obj_labels:
        x1, y1, x2, y2 = obj_label.x1, obj_label.y1, obj_label.x2, obj_label.y2
        original_box = np.asarray([[x1, y1, x2, y2]])

        box_w, box_h = x2 - x1, y2 - y1
        half_w, half_h = box_w / 2, box_h / 2
        cx, cy = (x2 + x1) / 2, (y2 + y1) / 2

        new_obj = copy.deepcopy(obj_label)
        if box_w < 10 or box_h < 10:
            new_objs.append(new_obj)
            continue

        iou = 0.0
        while iou < iou_threshold_min:
            new_cx = rng.normal(cx, half_w / 3)
            new_cy = rng.normal(cy, half_h / 3)
            new_half_w = rng.normal(half_w, half_w / 6)
            new_half_h = rng.normal(half_h, half_h / 6)

            new_x1 = np.maximum(0, new_cx - new_half_w)
            new_x2 = np.minimum(img_w - 1, new_cx + new_half_w)
            new_y1 = np.maximum(0, new_cy - new_half_h)
            new_y2 = np.minimum(img_h - 1, new_cy + new_half_h)

            new_box = np.asarray([new_x1, new_y1, new_x2, new_y2])
            iou = evaluation.two_d_iou(new_box, original_box)

        new_obj.x1, new_obj.y1 = new_x1, new_y1
        new_obj.x2, new_obj.y2 = new_x2, new_y2
        new_objs.append(new_obj)

    return np.asarray(new_objs)
