"""Attribute the batched-8 forward's in-program time by stage stubbing.

diag_batched.py measures stages in ISOLATION; their x8 sum (~4.8
ms/frame) undershoots the measured full program (~6.7 ms/frame), so
~2 ms/frame hides in stage interactions the isolated measurements
can't see. This script measures the FULL vmapped forward, then
re-measures with one stage at a time replaced by a cheap
data-dependent stub (mean(x) * ones(out_shape) — keeps the input alive
so upstream stages are not dead-code-eliminated). The delta is that
stage's true in-program cost.

Run on the real chip:  python scripts/diag_forward_bisect.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
import __graft_entry__ as graft
from monopsr_tpu import constants as C
from monopsr_tpu.models import backbone as backbone_lib
from monopsr_tpu.models import monopsr
from monopsr_tpu.models import resnet as resnet_lib
from monopsr_tpu.ops import crop_resize
from monopsr_tpu.train import trainer as trainer_lib


def _stub(out_shape, dtype):
    def fn(x):
        dep = jnp.mean(x.astype(jnp.float32)) * 1e-30
        return jnp.full(out_shape, 0.0, dtype) + dep.astype(dtype)
    return fn


def measure(forward, variables, dev_batch, n_iters=8):
    fwdb = jax.jit(lambda v, b: jax.vmap(lambda s: forward(v, s))(b))

    def step(carry, variables, b):
        b2 = dict(b)
        b2['image'] = b2['image'] + (carry * 1e-30).astype(
            b2['image'].dtype)
        out = fwdb(variables, b2)
        return jnp.sum(out[C.KEY_CENTROIDS]).astype(jnp.float32)

    fps = bench._chained_scan_rate(step, (variables, dev_batch),
                                   n_iters=n_iters)
    return 1000.0 / fps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print('devices:', jax.devices(), flush=True)

    forward, (variables, _) = graft.entry()
    cfg = graft._flagship_config()[1]
    samples = [graft._synthetic_sample(cfg, seed=i) for i in range(batch)]
    stacked = trainer_lib.stack_samples(samples)
    stacked['image'] = np.clip(
        np.rint(stacked['image']), 0, 255).astype(np.uint8)
    dev_batch = jax.device_put(stacked)

    base_ms = measure(forward, variables, dev_batch)
    print('full forward x{}: {:.2f} ms ({:.2f} ms/frame)'.format(
        batch, base_ms, base_ms / batch), flush=True)

    n = cfg.num_boxes
    # (stub name, patch target holder, attr, stub fn or None for custom)
    resnet_call = resnet_lib.ResNetV1.__call__
    decoder_call = backbone_lib.MapDecoder.__call__
    cr_bilinear = crop_resize.crop_and_resize_bilinear
    resize_ac = crop_resize.resize_bilinear_align_corners

    def patched(name, do_patch, undo_patch):
        do_patch()
        try:
            ms = measure(forward, variables, dev_batch)
        finally:
            undo_patch()
        print('{:28s} stubbed: {:8.2f} ms  (delta {:+6.2f} ms, '
              '{:+5.2f} ms/frame)'.format(
                  name, ms, ms - base_ms, (ms - base_ms) / batch),
              flush=True)

    # 1. RGB crop_and_resize + feats crop (both call sites)
    def stub_crop_bilinear(image, boxes_norm, crop_size):
        dep = jnp.mean(image.astype(jnp.float32)) * 1e-30
        dep = dep + jnp.sum(boxes_norm.astype(jnp.float32)) * 1e-30
        out = jnp.zeros((boxes_norm.shape[0],) + tuple(crop_size)
                        + (image.shape[-1],), jnp.float32)
        return out + dep

    patched(
        'crop_and_resize (both)',
        lambda: setattr(crop_resize, 'crop_and_resize_bilinear',
                        stub_crop_bilinear),
        lambda: setattr(crop_resize, 'crop_and_resize_bilinear',
                        cr_bilinear))

    # 2. full-image resize
    def stub_resize(images, out_size):
        dep = jnp.mean(images.astype(jnp.float32)) * 1e-30
        out = jnp.zeros((images.shape[0],) + tuple(out_size)
                        + (images.shape[-1],), images.dtype)
        return out + dep.astype(images.dtype)

    patched(
        'resize_bilinear',
        lambda: setattr(crop_resize, 'resize_bilinear_align_corners',
                        stub_resize),
        lambda: setattr(crop_resize, 'resize_bilinear_align_corners',
                        resize_ac))

    # 3. both resnet towers
    def stub_resnet(self, x):
        h = x.shape[1] // 4
        w = x.shape[2] // 4
        dep = jnp.mean(x.astype(jnp.float32)) * 1e-30
        return (jnp.zeros((x.shape[0], h, w, 1024), self.dtype)
                + dep.astype(self.dtype))

    patched(
        'resnet towers (both)',
        lambda: setattr(resnet_lib.ResNetV1, '__call__', stub_resnet),
        lambda: setattr(resnet_lib.ResNetV1, '__call__', resnet_call))

    # 4. map decoder
    def stub_decoder(self, x, train):
        dep = jnp.mean(x.astype(jnp.float32)) * 1e-30
        return (jnp.zeros((x.shape[0],) + tuple(self.map_roi_size)
                          + (128,), self.dtype) + dep.astype(self.dtype))

    patched(
        'map_decoder',
        lambda: setattr(backbone_lib.MapDecoder, '__call__',
                        stub_decoder),
        lambda: setattr(backbone_lib.MapDecoder, '__call__',
                        decoder_call))


if __name__ == '__main__':
    main()
