"""Python-loop vs lax.scan train-step timing: how much is dispatch?

bench_train_step times K python-dispatched steps (differenced against
a 1-step run). Through this host's tunnel each dispatch costs real
milliseconds that production TPU hosts don't pay; scanning K steps
inside ONE device program measures the chip's steady-state step time
with zero dispatch overhead. If the scanned number is materially
faster, the bench should report it as the device capability.

Run:  python scripts/diag_scan_train.py [batch] [remat0/1]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as graft
import bench
from monopsr_tpu.utils import compile_cache

compile_cache.enable()

V5E_PEAK = 197e12


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    print('devices:', jax.devices(), 'batch:', bs, 'remat:', remat,
          flush=True)

    # python-loop baseline (bench methodology)
    ms_loop, flops = bench.bench_train_step(
        n_iters=8, n_samples=bs, remat=remat)
    mfu = flops / (ms_loop / 1e3) / V5E_PEAK * 100.0
    print(f'python-loop: {ms_loop:7.2f} ms/step  {mfu:5.1f}% MFU',
          flush=True)

    # scanned: K steps inside one program
    from monopsr_tpu.models import monopsr  # noqa: F401 (import cost)
    _, cfg = graft._flagship_config()
    if remat:
        cfg = dataclasses.replace(cfg, remat_towers=True)
    # build_train_setup returns the jitted step; rebuild the raw one
    # with the same ingredients
    from monopsr_tpu.config import ConfigObj
    from monopsr_tpu.models.monopsr_net import MonoPSRNet
    from monopsr_tpu.train import optimizer as opt_lib
    from monopsr_tpu.train import trainer as trainer_lib

    _, state, batch = graft.build_train_setup(cfg, n_samples=bs)
    train_config = ConfigObj({
        'optimizer': {
            'optimizer_type': 'adam_optimizer',
            'adam_optimizer': {
                'learning_rate_type': 'exponential_decay',
                'initial_learning_rate': 1e-4,
                'decay_steps': 10000,
                'decay_factor': 0.8,
                'staircase': True,
                'use_moving_average': True,
                'moving_average_decay': 0.9999,
            },
        },
    })
    tx, _, use_ema, ema_decay = opt_lib.build_optimizer(train_config)
    net = MonoPSRNet(cfg=cfg)
    raw_step = trainer_lib.make_train_step(
        net, cfg, graft.DRYRUN_LOSS_CONFIG, tx, use_ema, ema_decay,
        jit=False)

    def scan_steps(k):
        def fn(state, batch):
            def body(s, _):
                s2, losses = raw_step(s, batch)
                return s2, losses['total_loss']
            s, totals = jax.lax.scan(body, state, None, length=k)
            return s, totals[-1]
        return jax.jit(fn, donate_argnums=(0,))

    dev_batch = jax.device_put(batch)
    one, many = scan_steps(1), scan_steps(8)

    def timed(fn, s):
        start = time.time()
        s2, total = fn(s, dev_batch)
        float(total)
        return time.time() - start, s2

    # warm both programs (donation: thread the state through)
    _, state = timed(one, state)
    _, state = timed(many, state)
    t1s = []
    for _ in range(2):
        dt, state = timed(one, state)
        t1s.append(dt)
    tns = []
    for _ in range(2):
        dt, state = timed(many, state)
        tns.append(dt)
    ms_scan = (min(tns) - min(t1s)) / 7 * 1000.0
    mfu = flops / (ms_scan / 1e3) / V5E_PEAK * 100.0
    print(f'lax.scan   : {ms_scan:7.2f} ms/step  {mfu:5.1f}% MFU  '
          f'(dispatch overhead {ms_loop - ms_scan:+.2f} ms/step)',
          flush=True)


if __name__ == '__main__':
    main()
