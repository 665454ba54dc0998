"""Bisect the train step's backward: towers vs heads/decoder vs GT+loss.

diag_trainstep.py (round 4) decomposed the 28.3 ms batch-1 step into
forward 4.1 ms / backward ~15.9 ms / optimizer ~8.4 ms. This attributes
the backward by timing value_and_grad of nested prefixes of the step on
the real chip (chained-scan timing, constant dispatch cost subtracted):

  A. crop tower alone           (32, 48, 48, 3) ResNet fwd+bwd
  B. full-image tower alone     (1, H, W, 3) ResNet fwd+bwd
  C. whole backbone             towers + feature crop + squash + decoder
  D. full net (train=True)      C + FC trunks + heads
  E. net + GT + losses          the train step's loss_fn (no optimizer)

Run:  python scripts/diag_bwd_bisect.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
import __graft_entry__ as graft

V5E_PEAK = 197e12


def cost(jitted, *args):
    a = jitted.lower(*args).compile().cost_analysis()
    if isinstance(a, (list, tuple)):
        a = a[0] if a else {}
    return float(a.get('flops', 0.0))


def time_grad(name, loss_fn, params, *rest):
    """Times value_and_grad(loss_fn) w.r.t. params via chained scan."""
    def vg(p, *r):
        total, grads = jax.value_and_grad(loss_fn)(p, *r)
        return total + jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
            grads, 0.0)

    jvg = jax.jit(vg)
    flops = cost(jvg, params, *rest)

    def step(carry, p, *r):
        p2 = jax.tree.map(
            lambda x: x + (carry * 1e-30).astype(x.dtype), p)
        return jvg(p2, *r).astype(jnp.float32)

    fps = bench._chained_scan_rate(step, (params,) + rest, n_iters=10)
    ms = 1000.0 / fps
    mfu = flops / (ms / 1e3) / V5E_PEAK * 100.0
    print(f'{name:36s} {flops/1e9:8.1f} GFLOP  {ms:7.2f} ms  '
          f'{mfu:5.1f}% MFU', flush=True)
    return ms


def main():
    import dataclasses
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    cells = set(sys.argv[3].upper()) if len(sys.argv) > 3 else set('ABCDE')
    print('devices:', jax.devices(), 'batch:', bs, 'remat:', remat,
          flush=True)
    _, cfg = graft._flagship_config()
    if remat:
        cfg = dataclasses.replace(cfg, remat_towers=True)
    _, state, batch = graft.build_train_setup(cfg, n_samples=bs)
    dev_batch = jax.device_put(batch)
    params, stats = state.params, state.batch_stats

    from monopsr_tpu.models import monopsr
    from monopsr_tpu.models.monopsr_net import MonoPSRNet
    from monopsr_tpu.models.resnet import RESNET_SPECS, ResNetV1
    from monopsr_tpu.models.backbone import Resnet101_4xSquash
    net = MonoPSRNet(cfg=cfg)

    # --- A/B: towers alone ---------------------------------------------
    spec = RESNET_SPECS[cfg.resnet]
    tower = ResNetV1(spec=spec, output_stride=cfg.output_stride,
                     dtype=jnp.bfloat16)
    crops = jnp.zeros((bs * cfg.num_boxes,) + tuple(cfg.img_roi_size)
                      + (3,), jnp.float32)
    full = jnp.zeros((bs,) + tuple(cfg.resized_full_img_shape) + (3,),
                     jnp.float32)
    tvars = jax.jit(tower.init)(jax.random.PRNGKey(0), crops)

    def tower_loss(p, s, x):
        out = tower.apply({'params': p, 'batch_stats': s}, x)
        return jnp.sum(out.astype(jnp.float32))

    if 'A' in cells:
        time_grad('A crop tower (%dx48x48)' % (bs * cfg.num_boxes),
                  tower_loss, tvars['params'], tvars['batch_stats'], crops)
    if 'B' in cells:
        tvars_f = jax.jit(tower.init)(jax.random.PRNGKey(0), full)
        time_grad('B full tower (%dx%dx%d)' % ((bs,) +
                  tuple(cfg.resized_full_img_shape)),
                  tower_loss, tvars_f['params'], tvars_f['batch_stats'],
                  full)

    # --- C: whole backbone ----------------------------------------------
    bb = Resnet101_4xSquash(
        map_roi_size=cfg.map_roi_size, output_stride=cfg.output_stride,
        resnet=cfg.resnet, dtype=jnp.bfloat16)
    boxes_norm = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]], jnp.float32),
                          (bs, cfg.num_boxes, 1))
    if 'C' in cells:
        bvars = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), crops,
                                        full, boxes_norm, False))()

        def bb_loss(p, s, c, f, bn):
            m, b3 = bb.apply({'params': p, 'batch_stats': s}, c, f, bn,
                             False)
            return (jnp.sum(m.astype(jnp.float32)) +
                    jnp.sum(b3.astype(jnp.float32)))

        time_grad('C backbone (towers+crop+decoder)', bb_loss,
                  bvars['params'], bvars['batch_stats'], crops, full,
                  boxes_norm)

    # --- D: full net ------------------------------------------------------
    if 'D' in cells:
        def net_loss(p, s, b):
            out, _ = net.apply({'params': p, 'batch_stats': s},
                               **monopsr.net_inputs_from_batch(b),
                               train=True, mutable=['batch_stats'])
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values())

        time_grad('D full net (train=True)', net_loss, params, stats,
                  dev_batch)

    # --- E: net + GT + losses (train-step loss_fn) -----------------------
    if 'E' not in cells:
        return

    def full_loss(p, s, b):
        out, _ = net.apply({'params': p, 'batch_stats': s},
                           **monopsr.net_inputs_from_batch(b),
                           train=True, mutable=['batch_stats'])

        def per_sample(sample, sample_outputs):
            gt = monopsr.build_gt_dict(cfg, sample, sample_outputs)
            sample_outputs, gt = monopsr.add_global_outputs(
                cfg, sample, sample_outputs, gt)
            _, total = monopsr.compute_losses(
                cfg, graft.DRYRUN_LOSS_CONFIG, sample_outputs, gt)
            return total

        return jnp.mean(jax.vmap(per_sample)(b, out))

    time_grad('E net+GT+losses (loss_fn)', full_loss, params, stats,
              dev_batch)


if __name__ == '__main__':
    main()
