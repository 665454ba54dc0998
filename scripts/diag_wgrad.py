"""Is XLA's conv weight-gradient lowering the train-step bottleneck?

The r5 xplane profile shows wgrad fusions running at 8-38% MFU (e.g.
f32[3,3,256,256] crop-tower wgrads at ~13 ms/step where the math is
~5 ms at peak). The wgrad of a conv is just a matmul contracted over
batch*space — this measures, for the production conv shapes, fwd+bwd
of (a) the stock lax conv and (b) the same conv with a custom VJP
whose wgrad is expressed as per-tap shifted matmuls (and whose dgrad
is the stock transposed conv), to see how much a matmul wgrad buys.

Run:  python scripts/diag_wgrad.py
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

V5E_PEAK = 197e12


def cost(jitted, *args):
    try:
        a = jitted.lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0] if a else {}
        return float(a.get('flops', 0.0))
    except Exception:
        return 0.0


def conv_same(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def make_matmul_wgrad_conv(kh, kw):
    """SAME conv whose custom VJP computes wgrad as shifted matmuls."""

    @jax.custom_vjp
    def conv(x, w):
        return conv_same(x, w)

    def fwd(x, w):
        return conv_same(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        n, h, width, cin = x.shape
        cout = w.shape[-1]
        # dgrad: stock transposed conv (already efficient)
        dx = jax.lax.conv_transpose(
            g.astype(x.dtype), w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            transpose_kernel=True)
        # wgrad: one [N*H*W, Cin]^T @ [N*H*W, Cout] matmul per tap,
        # with x shifted by the tap offset (zero padding = SAME).
        ph, pw = kh // 2, kw // 2
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        g2 = g.astype(x.dtype).reshape(n * h * width, cout)
        taps = []
        for di in range(kh):
            row = []
            for dj in range(kw):
                xs = xp[:, di:di + h, dj:dj + width, :]
                xs2 = xs.reshape(n * h * width, cin)
                row.append(
                    jnp.einsum('pi,po->io', xs2, g2,
                               preferred_element_type=jnp.float32))
            taps.append(jnp.stack(row))
        dw = jnp.stack(taps).astype(w.dtype)
        return dx, dw

    conv.defvjp(fwd, bwd)
    return conv


def time_cell(name, f, x, w):
    def loss(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32))

    def vg(x, w):
        val, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return (val + jnp.sum(jnp.abs(gx).astype(jnp.float32)) +
                jnp.sum(jnp.abs(gw).astype(jnp.float32)))

    jvg = jax.jit(vg)
    flops = cost(jvg, x, w)

    def step(carry, x, w):
        return jvg(x + (carry * 1e-30).astype(x.dtype), w)

    fps = bench._chained_scan_rate(step, (x, w), n_iters=80, repeats=3)
    ms = 1000.0 / fps
    mfu = flops / (ms / 1e3) / V5E_PEAK * 100.0
    print(f'{name:34s} {flops/1e9:8.1f} GFLOP  {ms:7.2f} ms  '
          f'{mfu:5.1f}% MFU', flush=True)
    return ms


def main():
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # Production backward shapes (batch-8 step): crop tower block3
    # 3x3 (per-conv space-to-batch phases of rate 2: batch 1024 at
    # 6x6), crop tower 1x1s at (256,12,12), decoder 3x3 at 24/48.
    cases = [
        ('crop 3x3 rate2-phase 1024x6x6x256', (1024, 6, 6, 256), (3, 3, 256, 256)),
        ('crop 1x1 256x12x12 1024->256', (256, 12, 12, 1024), (1, 1, 1024, 256)),
        ('crop 1x1 256x12x12 256->1024', (256, 12, 12, 256), (1, 1, 256, 1024)),
        ('decoder 3x3 256x24x24 512->256', (256, 24, 24, 512), (3, 3, 512, 256)),
        ('decoder 3x3 256x48x48 256->128', (256, 48, 48, 256), (3, 3, 256, 128)),
        ('full 3x3 phase 128x10x38x256', (128, 10, 38, 256), (3, 3, 256, 256)),
    ]
    for name, xs, ws in cases:
        x = jnp.asarray(rng.normal(0, 1, xs), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, ws), jnp.bfloat16)
        t_stock = time_cell(name + ' [stock]', conv_same, x, w)
        mm = make_matmul_wgrad_conv(ws[0], ws[1])
        t_mm = time_cell(name + ' [mm-wgrad]', mm, x, w)
        print(f'  -> speedup {t_stock / t_mm:.2f}x', flush=True)


if __name__ == '__main__':
    main()
