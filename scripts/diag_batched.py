"""Localize the batched-8 serving penalty: per-stage batch-scaling bench.

The single-frame forward reaches ~89% MFU on a v5e chip while the
8-frame vmapped program delivers only ~46% per-frame MFU
(BENCH_r03 batched8). StableHLO op histograms are identical, so the
regression comes from XLA:TPU lowering of some stage at the larger
batch. This script times each stage of the forward in isolation at its
single-frame batch and at the vmapped-8 equivalent batch, printing
per-frame ms for both so the offender is visible directly.

Run on the real chip:  python scripts/diag_batched.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
import __graft_entry__ as graft
from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1
from monopsr_tpu.models.backbone import MapDecoder
from monopsr_tpu.ops import crop_resize


def rate_ms(step_fn, args, n_iters=8):
    """Per-iteration ms via the chained-scan measurement from bench.py."""
    fps = bench._chained_scan_rate(step_fn, args, n_iters=n_iters)
    return 1000.0 / fps


def report(name, t1, tb, frames):
    print(f'{name:28s} b1 {t1:8.2f} ms   x{int(frames)} '
          f'{tb:8.2f} ms ({tb / frames:8.2f} ms/frame, '
          f'{tb / frames / t1:5.2f}x)', flush=True)


def bench_jitted(name, fn, args1, argsb, frames, vmapped=False):
    """Times jit(fn)(*args1) vs its `frames`-stacked counterpart."""
    jfn1 = jax.jit(fn)
    jfnb = jax.jit(jax.vmap(fn) if vmapped else fn)

    def step1(carry, *args):
        a0 = args[0] * (1.0 + carry * 1e-30).astype(args[0].dtype)
        return jnp.sum(jfn1(a0, *args[1:])).astype(jnp.float32)

    def stepb(carry, *args):
        a0 = args[0] * (1.0 + carry * 1e-30).astype(args[0].dtype)
        return jnp.sum(jfnb(a0, *args[1:])).astype(jnp.float32)

    t1 = rate_ms(step1, tuple(jax.device_put(a) for a in args1))
    tb = rate_ms(stepb, tuple(jax.device_put(a) for a in argsb))
    report(name, t1, tb, frames)
    return t1, tb


def bench_tower(name, shape_1, shape_b, spec_name='resnet101'):
    spec = RESNET_SPECS[spec_name]
    tower = ResNetV1(spec=spec, output_stride=4, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x1 = jax.device_put(jax.random.normal(key, shape_1, jnp.bfloat16))
    xb = jax.device_put(jax.random.normal(key, shape_b, jnp.bfloat16))
    params = jax.jit(tower.init)(key, x1)
    fn = jax.jit(tower.apply)

    def step(carry, params, x):
        out = fn(params, x * (1.0 + carry * 1e-30))
        return jnp.sum(out).astype(jnp.float32)

    t1 = rate_ms(step, (params, x1))
    tb = rate_ms(step, (params, xb))
    report(name, t1, tb, shape_b[0] / shape_1[0])
    return t1, tb


def main():
    print('devices:', jax.devices())
    cfg = graft._flagship_config()[1]
    h, w = cfg.image_input_shape
    fh, fw = cfg.resized_full_img_shape
    n = cfg.num_boxes
    B = 8
    key = jax.random.PRNGKey(1)

    # 0a. Full-image resize (H, W) -> resized_full_img_shape
    img1 = jax.random.uniform(key, (1, h, w, 3), jnp.float32) * 255.0
    imgb = jax.random.uniform(key, (B, h, w, 3), jnp.float32) * 255.0
    bench_jitted(
        'resize_full_img',
        lambda im: crop_resize.resize_bilinear_align_corners(im, (fh, fw)),
        (img1,), (imgb,), B)

    # 0b. RGB box crops from the input image
    boxes1 = jnp.stack([
        jnp.full((n,), 0.1), jnp.full((n,), 0.1),
        jnp.full((n,), 0.6), jnp.full((n,), 0.5)], axis=1)
    boxesb = jnp.tile(boxes1[None], (B, 1, 1))
    bench_jitted(
        'rgb crop_and_resize 48x48',
        lambda im, bx: crop_resize.crop_and_resize_bilinear(
            im, bx, (48, 48)),
        (img1[0], boxes1), (imgb, boxesb), B, vmapped=True)

    # 1. Full-image tower: the FLOPs king (160x608 ResNet-101 @ stride 4)
    bench_tower(f'tower_full {fh}x{fw}', (1, fh, fw, 3), (B, fh, fw, 3))

    # 2. Crop tower: (32, 48, 48, 3) -> (256, 48, 48, 3)
    bench_tower('tower_crop 48x48', (n, 48, 48, 3), (B * n, 48, 48, 3))

    # 3. Per-box feature crop of full-image features
    ffh, ffw, ffc = fh // 4, fw // 4, 1024
    feats1 = jax.random.normal(key, (ffh, ffw, ffc), jnp.bfloat16)
    featsb = jax.random.normal(key, (B, ffh, ffw, ffc), jnp.bfloat16)
    bench_jitted(
        'crop_and_resize feats',
        lambda f, bx: crop_resize.crop_and_resize_bilinear(
            f, bx, (24, 24)),
        (feats1, boxes1), (featsb, boxesb), B, vmapped=True)

    # 4. Map decoder: (32, 12, 12, 512) -> (256, 12, 12, 512)
    dec = MapDecoder(dtype=jnp.bfloat16)
    d1 = jax.random.normal(key, (n, 12, 12, 512), jnp.bfloat16)
    db = jax.random.normal(key, (B * n, 12, 12, 512), jnp.bfloat16)
    params = jax.jit(lambda x: dec.init(key, x, train=False))(d1)
    dfn = jax.jit(lambda p, x: dec.apply(p, x, train=False))

    def dstep(carry, params, x):
        out = dfn(params, x * (1.0 + carry * 1e-30))
        return jnp.sum(out).astype(jnp.float32)

    t1 = rate_ms(dstep, (params, jax.device_put(d1)))
    tbd = rate_ms(dstep, (params, jax.device_put(db)))
    report('map_decoder', t1, tbd, B)


if __name__ == '__main__':
    main()
