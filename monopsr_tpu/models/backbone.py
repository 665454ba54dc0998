"""Dual-tower feature extraction: resnet101_4x_squash.

Behavioral twin of the reference net builder
(ref: src/monopsr/builders/net_builder.py:30-96): two ResNet-101 stride-4
encoders (48x48 RGB crops per box, resized full image), per-box crop of
the full-image features, concat, 1x1 squash conv + max pool for box
features, and a 2-stage resize+conv decoder for 48x48 map features.

TPU notes: the module is BATCH-NATIVE — the crop tower and everything
per-box runs on one flat (B*N) axis, and the full-image tower on a true
(B,) image batch. Running the multi-image serving/training paths through
`jax.vmap` instead costs ~1.7x on the towers (the vmapped phase-space
reshapes and conv batching rules lower poorly on TPU; measured in
scripts/diag_forward_bisect.py), which is why the batch axis is folded
here rather than mapped.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1
from monopsr_tpu.ops import crop_resize


class MapDecoder(nn.Module):
    """resize -> 2x conv3x3(256) BN -> resize -> 2x conv3x3(128) BN."""
    map_roi_size: tuple = (48, 48)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        half = (self.map_roi_size[0] // 2, self.map_roi_size[1] // 2)
        x = crop_resize.resize_bilinear_align_corners(x, half)
        for i in range(2):
            x = nn.Conv(256, (3, 3), padding='SAME', dtype=self.dtype,
                        name='conv2_{}'.format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                             epsilon=1e-5, dtype=self.dtype,
                             name='conv2_{}_bn'.format(i + 1))(x)
            x = nn.relu(x)
        x = crop_resize.resize_bilinear_align_corners(x, self.map_roi_size)
        for i in range(2):
            x = nn.Conv(128, (3, 3), padding='SAME', dtype=self.dtype,
                        name='conv3_{}'.format(i + 1))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                             epsilon=1e-5, dtype=self.dtype,
                             name='conv3_{}_bn'.format(i + 1))(x)
            x = nn.relu(x)
        return x


class Resnet101_4xSquash(nn.Module):
    """Two-tower encoder producing map features and box-3d features.

    Batch-native: `rgb_crops` carries all images' crops on one flat
    (B*N) axis; `full_imgs` is a true (B, H, W, 3) batch.

    Returns:
        features_for_map: (B*N, 48, 48, 128)
        features_for_box_3d: (B*N, 6, 6, 512)
    """
    map_roi_size: tuple = (48, 48)
    output_stride: int = 4
    resnet: str = 'resnet101'
    dtype: jnp.dtype = jnp.bfloat16
    use_phase_space: bool = True
    remat_towers: bool = False
    remat_policy: str = 'unit'

    @nn.compact
    def __call__(self, rgb_crops, full_imgs, boxes_2d_norm, train):
        """
        Args:
            rgb_crops: (B*N, 48, 48, 3) preprocessed per-box crops.
            full_imgs: (B, H, W, 3) preprocessed resized full images.
            boxes_2d_norm: (B, N, 4) normalized boxes for feature crops.
            train: training mode (affects decoder BN only).
        """
        spec = RESNET_SPECS[self.resnet]
        b, n = boxes_2d_norm.shape[0], boxes_2d_norm.shape[1]

        crop_feats = ResNetV1(
            spec=spec, output_stride=self.output_stride, dtype=self.dtype,
            use_phase_space=self.use_phase_space,
            remat=self.remat_towers,
            remat_policy=self.remat_policy,
            name='tower_crop')(rgb_crops)            # (B*N, 12, 12, 1024)
        full_feats = ResNetV1(
            spec=spec, output_stride=self.output_stride, dtype=self.dtype,
            use_phase_space=self.use_phase_space,
            remat=self.remat_towers,
            remat_policy=self.remat_policy,
            name='tower_full')(full_imgs)            # (B, H/4, W/4, 1024)

        # Per-box crop of the full-image features: crop_and_resize to
        # half the map ROI, then 2x2 max pool (ref: net_builder.py:54-60)
        half = (self.map_roi_size[0] // 2, self.map_roi_size[1] // 2)
        full_crops = jax.vmap(
            crop_resize.crop_and_resize_bilinear,
            in_axes=(0, 0, None))(
                full_feats, boxes_2d_norm.astype(jnp.float32), half)
        full_crops = full_crops.reshape((b * n,) + full_crops.shape[2:])
        full_crops = nn.max_pool(full_crops, (2, 2), strides=(2, 2))

        concat = jnp.concatenate(
            [crop_feats, full_crops.astype(self.dtype)], axis=-1)

        squashed = nn.Conv(512, (1, 1), dtype=self.dtype,
                           name='squash_1x1')(concat)
        squashed = nn.relu(squashed)
        pooled = nn.max_pool(squashed, (2, 2), strides=(2, 2))

        map_features = MapDecoder(
            map_roi_size=self.map_roi_size, dtype=self.dtype,
            name='map_decoder')(squashed, train)

        return (map_features.astype(jnp.float32),
                pooled.astype(jnp.float32))
