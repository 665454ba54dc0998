"""Microbench the map decoder's fwd+bwd: where do 22 ms fusions come from?

The r5 xplane profile of the batch-8 train step (scripts/xplane_ops.py
on diag_train_profile.py's trace) shows the decoder's convolutions
running far off roofline (e.g. a (f32[128],f32[128],bf16[256,48,48,128])
convert_reduce fusion at 1.87 ms/step where the raw conv is ~0.3 ms).
Candidate causes: the training-BatchNorm stat reduce fused into the
conv epilogue; the bilinear resize fused into the conv input; or the
conv shapes themselves. Each cell below isolates one:

  full/train      the production decoder, train=True
  full/eval       same, train=False (no stat computation)
  frozen-bn       BN replaced by affine (no stats at all)
  barrier         optimization_barrier between conv and BN (unfuses
                  the stat reduce from the conv epilogue)
  convs@24        the two 24x24 convs alone on a fixed input
  convs@48        the two 48x48 convs alone on a fixed input
  resizes         the two bilinear resizes alone

Run on the real chip:  python scripts/diag_decoder.py [batch_images]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

import bench
from monopsr_tpu.models.backbone import MapDecoder
from monopsr_tpu.ops import crop_resize
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


def time_cell(name, apply_fn, variables, x, train=None):
    """fwd+bwd wrt params+input of apply_fn(variables, x)."""
    def loss(v, inp):
        kwargs = {} if train is None else {'train': train}
        out = apply_fn(v, inp, **kwargs)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32))

    def vg(v, inp):
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(v, inp)
        return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                         for g in jax.tree.leaves(grads))

    jvg = jax.jit(vg)
    flops = cost(jvg, variables, x)

    def step(carry, v, inp):
        inp2 = inp + (carry * 1e-30).astype(inp.dtype)
        return jvg(v, inp2).astype(jnp.float32)

    fps = bench._chained_scan_rate(step, (variables, x), n_iters=10)
    ms = 1000.0 / fps
    mfu = flops / (ms / 1e3) / V5E_PEAK * 100.0
    print(f'{name:14s} {flops/1e9:8.1f} GFLOP  {ms:7.2f} ms  '
          f'{mfu:5.1f}% MFU', flush=True)


class BarrierBN(nn.Module):
    """BatchNorm whose input is barriered (stat reduce can't fuse
    into the producing conv's epilogue)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        x = jax.lax.optimization_barrier(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.997, epsilon=1e-5,
                            dtype=self.dtype)(x)


class DecoderVariant(nn.Module):
    bn: str = 'train'   # train | frozen | barrier

    @nn.compact
    def __call__(self, x, train=True):
        dtype = jnp.bfloat16
        for stage, (size, feats) in enumerate((( (24, 24), 256),
                                               ((48, 48), 128))):
            x = crop_resize.resize_bilinear_align_corners(x, size)
            for i in range(2):
                x = nn.Conv(feats, (3, 3), padding='SAME', dtype=dtype)(x)
                if self.bn == 'frozen':
                    s = self.param('s%d%d' % (stage, i),
                                   nn.initializers.ones, (feats,))
                    b = self.param('b%d%d' % (stage, i),
                                   nn.initializers.zeros, (feats,))
                    x = x * s.astype(dtype) + b.astype(dtype)
                elif self.bn == 'barrier':
                    x = BarrierBN(dtype=dtype)(x, train)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.997, epsilon=1e-5,
                                     dtype=dtype)(x)
                x = nn.relu(x)
        return x


class ConvsOnly(nn.Module):
    feats: int = 256

    @nn.compact
    def __call__(self, x, train=True):
        dtype = jnp.bfloat16
        for _ in range(2):
            x = nn.Conv(self.feats, (3, 3), padding='SAME', dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.997, epsilon=1e-5, dtype=dtype)(x)
            x = nn.relu(x)
        return x


def init_and_time(name, module, x, train=True):
    variables = jax.jit(functools.partial(
        module.init, train=train))(jax.random.PRNGKey(0), x)

    def apply_fn(v, inp, train):
        out = module.apply(v, inp, train=train,
                           mutable=['batch_stats'] if train else [])
        return out[0] if isinstance(out, tuple) else out

    time_cell(name, apply_fn, variables, x, train=train)


def main():
    batch = (int(sys.argv[1]) if len(sys.argv) > 1 else 8) * 32
    print('devices:', jax.devices(), 'flat batch:', batch, flush=True)
    rng = np.random.default_rng(0)
    x12 = jnp.asarray(rng.normal(0, 1, (batch, 12, 12, 512)), jnp.bfloat16)
    x24 = jnp.asarray(rng.normal(0, 1, (batch, 24, 24, 512)), jnp.bfloat16)
    x48 = jnp.asarray(rng.normal(0, 1, (batch, 48, 48, 256)), jnp.bfloat16)

    init_and_time('full/train', MapDecoder(dtype=jnp.bfloat16), x12,
                  train=True)
    init_and_time('full/eval', MapDecoder(dtype=jnp.bfloat16), x12,
                  train=False)
    init_and_time('frozen-bn', DecoderVariant(bn='frozen'), x12)
    init_and_time('barrier', DecoderVariant(bn='barrier'), x12)
    init_and_time('convs@24', ConvsOnly(feats=256), x24)
    init_and_time('convs@48', ConvsOnly(feats=128), x48)

    def resizes(v, inp):
        y = crop_resize.resize_bilinear_align_corners(inp, (24, 24))
        return crop_resize.resize_bilinear_align_corners(
            jnp.tile(y, (1, 1, 1, 1)), (48, 48))

    time_cell('resizes', resizes, {}, x12)


if __name__ == '__main__':
    main()
