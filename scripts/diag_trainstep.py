"""Attribute the train step's 30.8 ms: FLOPs vs HBM bytes, stage times.

BENCH_r03 put the full train step at 33.4% MFU while the forward alone
runs at 83%. This measures, on the real chip:
- param count + optimizer-state bytes (the Adam+EMA HBM floor),
- compiled flops AND bytes-accessed of (a) the full train step,
  (b) fwd+bwd only (no optimizer), (c) forward only,
- measured ms for each, so the gap decomposes into backward
  inefficiency vs optimizer/EMA memory traffic.

Run on the real chip:  python scripts/diag_trainstep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
import __graft_entry__ as graft

V5E_PEAK = 197e12
V5E_HBM_GBPS = 819e9


def cost(jitted, *args):
    try:
        a = jitted.lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0] if a else {}
        return (float(a.get('flops', 0.0)),
                float(a.get('bytes accessed', 0.0)))
    except Exception as exc:
        print('cost_analysis failed:', exc)
        return 0.0, 0.0


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print('devices:', jax.devices(), 'batch:', bs, flush=True)
    _, cfg = graft._flagship_config()
    train_step, state, batch = graft.build_train_setup(cfg, n_samples=bs)
    dev_batch = jax.device_put(batch)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    n_state = sum(x.size for x in jax.tree.leaves(state))
    print(f'params: {n_params/1e6:.1f}M   total state: {n_state/1e6:.1f}M '
          f'({n_state*4/1e9:.2f} GB f32)', flush=True)

    flops, bytes_acc = cost(train_step, state, dev_batch)
    print(f'train_step: {flops/1e9:.1f} GFLOP, {bytes_acc/1e9:.2f} GB '
          f'accessed -> compute floor {flops/V5E_PEAK*1e3:.2f} ms, '
          f'memory floor {bytes_acc/V5E_HBM_GBPS*1e3:.2f} ms', flush=True)

    ms, _ = bench.bench_train_step(n_iters=10, n_samples=bs)
    print(f'train_step measured: {ms:.2f} ms', flush=True)

    # fwd+bwd only (no optimizer update): same loss, grads returned
    from monopsr_tpu.models import monopsr
    from monopsr_tpu.models.monopsr_net import MonoPSRNet
    net = MonoPSRNet(cfg=cfg)

    def per_sample_loss(params, batch_stats, sample):
        variables = {'params': params, 'batch_stats': batch_stats}
        outputs, mutated = net.apply(
            variables, **monopsr.net_inputs_from_batch(sample),
            train=True, mutable=['batch_stats'])
        gt = monopsr.build_gt_dict(cfg, sample, outputs)
        outputs, gt = monopsr.add_global_outputs(cfg, sample, outputs, gt)
        _, total = monopsr.compute_losses(
            cfg, graft.DRYRUN_LOSS_CONFIG, outputs, gt)
        return total

    def fwd_bwd(params, batch_stats, batch):
        def loss_fn(p):
            return jnp.mean(jax.vmap(
                lambda s: per_sample_loss(p, batch_stats, s))(batch))
        total, grads = jax.value_and_grad(loss_fn)(params)
        # reduce grads to one scalar so the pull is tiny
        return total, jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
            grads, 0.0)

    jfb = jax.jit(fwd_bwd)
    flops_fb, bytes_fb = cost(jfb, state.params, state.batch_stats,
                              dev_batch)
    print(f'fwd+bwd:    {flops_fb/1e9:.1f} GFLOP, {bytes_fb/1e9:.2f} GB '
          f'-> compute floor {flops_fb/V5E_PEAK*1e3:.2f} ms, '
          f'memory floor {bytes_fb/V5E_HBM_GBPS*1e3:.2f} ms', flush=True)

    def step(carry, params, stats, b):
        b2 = dict(b)
        b2['image'] = b2['image'] + (carry * 1e-30).astype(b2['image'].dtype)
        total, gsum = jfb(params, stats, b2)
        return (total + gsum).astype(jnp.float32)

    fps = bench._chained_scan_rate(
        step, (state.params, state.batch_stats, dev_batch), n_iters=8)
    print(f'fwd+bwd measured: {1000.0/fps:.2f} ms', flush=True)

    # forward-only reference point
    def fwd_only(params, stats, b):
        out = net.apply({'params': params, 'batch_stats': stats},
                        **monopsr.net_inputs_from_batch(
                            jax.tree.map(lambda x: x[0], b)),
                        train=False)
        return jnp.sum(out['centroids'])

    jf = jax.jit(fwd_only)
    flops_f, bytes_f = cost(jf, state.params, state.batch_stats, dev_batch)

    def fstep(carry, params, stats, b):
        b2 = dict(b)
        b2['image'] = b2['image'] + (carry * 1e-30).astype(b2['image'].dtype)
        return jf(params, stats, b2).astype(jnp.float32)

    ffps = bench._chained_scan_rate(
        fstep, (state.params, state.batch_stats, dev_batch), n_iters=16)
    print(f'forward:    {flops_f/1e9:.1f} GFLOP, {bytes_f/1e9:.2f} GB, '
          f'measured {1000.0/ffps:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
