"""Probe the crop tower's batch-scaling curve on the real chip.

BENCH_r03 showed the 48x48 crop tower at 1.66x worse per-frame ms when
the box batch grows 32 -> 256 (8-image serving mode). This sweeps the
batch axis, toggles the phase-space atrous mode, and tries chunked
(lax.scan over sub-batches) execution to find where the cliff is and
which formulation restores single-frame efficiency.

Run on the real chip:  python scripts/diag_croptower.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1


def rate_ms(step_fn, args, n_iters=8):
    fps = bench._chained_scan_rate(step_fn, args, n_iters=n_iters)
    return 1000.0 / fps


def tower_ms(batch, phase=True, chunk=None, spec_name='resnet101',
             hw=48):
    spec = RESNET_SPECS[spec_name]
    tower = ResNetV1(spec=spec, output_stride=4, dtype=jnp.bfloat16,
                     use_phase_space=phase)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(
        jax.random.normal(key, (batch, hw, hw, 3), jnp.bfloat16))
    params = jax.jit(tower.init)(key, jnp.zeros((1, hw, hw, 3),
                                                jnp.bfloat16))

    if chunk is None:
        fn = jax.jit(tower.apply)
    else:
        n_chunks = batch // chunk

        @jax.jit
        def fn(params, x):
            xs = x.reshape(n_chunks, chunk, *x.shape[1:])
            def body(_, xc):
                return 0.0, tower.apply(params, xc)
            _, ys = jax.lax.scan(body, 0.0, xs)
            return ys.reshape(batch, *ys.shape[2:])

    def step(carry, params, x):
        out = fn(params, x * (1.0 + carry * 1e-30))
        return jnp.sum(out).astype(jnp.float32)

    return rate_ms(step, (params, x))


def main():
    print('devices:', jax.devices(), flush=True)
    for batch in (32, 64, 128, 256):
        t = tower_ms(batch, phase=True)
        print(f'phase=T  batch {batch:4d}: {t:8.2f} ms '
              f'({t / batch * 32:6.3f} ms per 32 crops)', flush=True)
    for batch in (32, 256):
        t = tower_ms(batch, phase=False)
        print(f'phase=F  batch {batch:4d}: {t:8.2f} ms '
              f'({t / batch * 32:6.3f} ms per 32 crops)', flush=True)
    for chunk in (32, 64, 128):
        t = tower_ms(256, phase=True, chunk=chunk)
        print(f'chunked {chunk:3d} batch 256: {t:8.2f} ms '
              f'({t / 8:6.3f} ms per 32 crops)', flush=True)


if __name__ == '__main__':
    main()
