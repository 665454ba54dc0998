"""Attribute the train step's optimizer delta (step - loss_fn time).

diag_bwd_bisect (r5, batch 4) measured loss_fn fwd+bwd at 66.7 ms but
the full step at 83.2 ms — a 16.4 ms update delta vs a ~5 ms HBM floor
for the Adam+EMA+grads sweep. This ablates the update chain on the
real chip: full step, no finite-guard, no EMA, and both off, to name
where the extra time lives.

Run:  python scripts/diag_optdelta.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as graft
from monopsr_tpu.utils import compile_cache

compile_cache.enable()

V5E_PEAK = 197e12


def measure(bs, label, *, guard, ema, flatten=False):
    import time
    from monopsr_tpu.train import optimizer as opt_lib

    orig_build = opt_lib.build_optimizer

    def patched(train_config, clip_gradient_norm=1.0):
        setattr(train_config, 'skip_nonfinite_updates', guard)
        tx, sched, use_ema, ema_decay = orig_build(
            train_config, clip_gradient_norm)
        if flatten:
            import optax
            tx = optax.flatten(tx)
        return tx, sched, (use_ema and ema), ema_decay

    opt_lib.build_optimizer = patched
    try:
        _, cfg = graft._flagship_config()
        train_step, state, batch = graft.build_train_setup(
            cfg, n_samples=bs)
    finally:
        opt_lib.build_optimizer = orig_build

    dev_batch = jax.device_put(batch)
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
    tn = min(run(8) for _ in range(2))
    ms = (tn - t1) / 7 * 1000.0
    print(f'{label:28s} {ms:7.2f} ms/step', flush=True)
    return ms


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print('devices:', jax.devices(), 'batch:', bs, flush=True)
    full = measure(bs, 'full (guard+ema)', guard=True, ema=True)
    ng = measure(bs, 'no finite-guard', guard=False, ema=True)
    ne = measure(bs, 'no ema', guard=True, ema=False)
    neither = measure(bs, 'neither', guard=False, ema=False)
    flat = measure(bs, 'flattened optax', guard=True, ema=True,
                   flatten=True)
    print(f'guard cost {full - ng:.2f} ms, ema cost {full - ne:.2f} ms,'
          f' both {full - neither:.2f} ms, flatten saves '
          f'{full - flat:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
