"""GT instance-crop sampling: flat gather vs one-hot matmul, on chip.

The r5 xplane profile shows the train step's two GT-crop gathers
(depth map + instance image, (8x32,48,48) samples from (384,1248)
maps) as ~9.3 ms/step custom fusions — gathers serialize on the
sparse core. Nearest-neighbour sampling is a one-hot row/col
selection, i.e. two matmuls per map (the same trick ops/crop_resize
uses for bilinear): measure both, fwd only (the GT path is
stop-gradient).

Run:  python scripts/diag_gt_gather.py [batch_images]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from monopsr_tpu.utils import compile_cache

compile_cache.enable()

H, W = 384, 1248
N = 32
ROI = 48


def make_inputs(b, rng):
    depth = jnp.asarray(rng.uniform(1, 60, (b, H, W)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 255, (b, H, W)), jnp.int32)
    src_y = jnp.asarray(rng.integers(0, H, (b, N, ROI)), jnp.int32)
    src_x = jnp.asarray(rng.integers(0, W, (b, N, ROI)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 32, (b, N)), jnp.int32)
    return depth, inst, src_y, src_x, idx


def gather_form(depth, inst, src_y, src_x, idx):
    def per_image(d, im, sy, sx, ix):
        flat = sy[:, :, None] * W + sx[:, None, :]
        ds = d.reshape(-1)[flat]
        es = im.reshape(-1)[flat]
        mask = (es == ix[:, None, None]).astype(jnp.float32)
        return ds * mask
    return jax.vmap(per_image)(depth, inst, src_y, src_x, idx)


def matmul_form(depth, inst, src_y, src_x, idx):
    def per_image(d, im, sy, sx, ix):
        ar_h = jnp.arange(H, dtype=jnp.int32)
        ar_w = jnp.arange(W, dtype=jnp.int32)
        sel_y = (ar_h == sy[..., None]).astype(jnp.float32)  # (N,R,H)
        sel_x = (ar_w == sx[..., None]).astype(jnp.float32)  # (N,R,W)
        both = jnp.stack([d, im.astype(jnp.float32)])        # (2,H,W)
        # HIGHEST: 3-pass bf16 covers the f32 mantissa exactly; with
        # one-hot operands every product is value*1.0, so the select
        # is bit-exact (the default single-pass would round to bf16)
        tmp = jnp.einsum('nyh,chw->ncyw', sel_y, both,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum('ncyw,nxw->ncyx', tmp, sel_x,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        ds, es = out[:, 0], out[:, 1]
        mask = (es.astype(jnp.int32) == ix[:, None, None]).astype(
            jnp.float32)
        return ds * mask
    return jax.vmap(per_image)(depth, inst, src_y, src_x, idx)


def time_fn(name, fn, args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(out[0, 0, 0, 0])

    def step(carry, *a):
        d2 = a[0] + (carry * 1e-30).astype(a[0].dtype)
        return jnp.sum(jfn(d2, *a[1:])[:, :, ::17, ::17]).astype(
            jnp.float32)

    fps = bench._chained_scan_rate(step, args, n_iters=30, repeats=3)
    ms = 1000.0 / fps
    print(f'{name:16s} {ms:7.3f} ms', flush=True)
    return jfn, ms


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print('devices:', jax.devices(), 'batch:', b, flush=True)
    rng = np.random.default_rng(0)
    args = make_inputs(b, rng)
    jg, t_g = time_fn('flat gather', gather_form, args)
    jm, t_m = time_fn('one-hot matmul', matmul_form, args)
    print(f'speedup {t_g / t_m:.2f}x', flush=True)
    a = np.asarray(jg(*args))
    c = np.asarray(jm(*args))
    print('exact match:', np.array_equal(a, c),
          'maxdiff', float(np.max(np.abs(a - c))), flush=True)


if __name__ == '__main__':
    main()
