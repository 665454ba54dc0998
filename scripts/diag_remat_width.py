"""Train-step width probe: does tower remat lift wide-batch MFU?

BENCH_r03/r04 found the per-device image-batch width curve peaks at
batch 4 (51.3% MFU) and REGRESSES at batch 8 — attributed to
activation-memory pressure (the dual ResNet-101 towers keep every
bottleneck activation live for the backward pass; at batch 8 that
footprint pushes XLA into spilling / worse scheduling).

`model_config.remat_towers` (nn.remat on the bottleneck blocks,
monopsr_tpu/models/resnet.py:189) trades those saved activations for
recompute — the classic TPU move when backward is HBM-bound. This
probe measures the full production train step (GT assembly + fwd +
loss + bwd + update in one jitted program, __graft_entry__.
build_train_setup) at widths 2/4/8, remat off vs on, and prints one
JSON line per cell so bench.py's width-curve policy can be set from
data.

Usage (TPU):
    python scripts/diag_remat_width.py [--widths 4,8] [--iters 6]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

import __graft_entry__ as graft
from monopsr_tpu.utils import compile_cache

compile_cache.enable()

V5E_BF16_PEAK_FLOPS = 197e12


def compiled_flops(jitted, *args):
    """FLOPs of the compiled program (0.0 if the backend won't say).

    Mirrors bench.py:_compiled_flops: `jitted` is already a jitted
    callable, so no second jax.jit wrap (which would compile a second
    executable), and a backend returning None/[] reports 0 instead of
    crashing the probe.
    """
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return float(cost.get('flops', 0.0))
    except Exception:
        return 0.0


def measure(bs, remat, n_iters, policy='unit'):
    _, cfg = graft._flagship_config()
    cfg = dataclasses.replace(cfg, remat_towers=remat,
                              remat_policy=policy)
    train_step, state, batch = graft.build_train_setup(cfg, n_samples=bs)
    dev_batch = jax.device_put(batch)
    flops = compiled_flops(train_step, state, dev_batch)

    state, losses = train_step(state, dev_batch)
    holder = [state]

    def run(k):
        start = time.time()
        s = holder[0]
        for _ in range(k):
            s, losses = train_step(s, dev_batch)
        holder[0] = s
        float(losses['total_loss'])
        return time.time() - start

    run(1)
    t1 = min(run(1) for _ in range(2))
    tn = min(run(n_iters) for _ in range(2))
    step_ms = (tn - t1) / (n_iters - 1) * 1000.0
    if step_ms <= 0.0:
        # t1/tn come from separate min-of-2 runs; timing noise can make
        # the subtraction non-positive at tiny iter counts. Fall back to
        # the raw n-iter average rather than report a bogus rate.
        step_ms = tn / n_iters * 1000.0
    mfu = 100.0 * flops / (step_ms / 1000.0) / V5E_BF16_PEAK_FLOPS
    return {
        'batch': bs,
        'remat_towers': remat,
        'remat_policy': policy if remat else None,
        'step_ms': round(step_ms, 2),
        'images_per_sec': round(bs * 1000.0 / step_ms, 2),
        'mfu_pct': round(mfu, 2),
        'gflops_per_step': round(flops / 1e9, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--widths', default='4,8')
    parser.add_argument('--iters', type=int, default=6)
    # step_ms below needs (iters - 1) > 0; 1-iter probes are never
    # meaningful anyway (they time only compile-adjacent noise).
    parser.add_argument('--remat', default='0,1',
                        help='comma list of 0/1 remat settings to probe')
    parser.add_argument('--policy', default='unit',
                        help="remat policy: 'unit' or 'conv_outs'")
    args = parser.parse_args()
    if args.iters < 2:
        parser.error('--iters must be >= 2 (step time is a difference '
                     'of a 1-iter and an n-iter run)')
    for bs in [int(w) for w in args.widths.split(',')]:
        for remat in [bool(int(r)) for r in args.remat.split(',')]:
            try:
                row = measure(bs, remat, args.iters, policy=args.policy)
            except Exception as exc:  # OOM at wide no-remat is a finding
                row = {'batch': bs, 'remat_towers': remat,
                       'error': str(exc)[:160]}
            print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
