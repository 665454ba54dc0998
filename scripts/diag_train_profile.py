"""Per-op attribution of the train step on the real chip.

diag_trainstep.py (r5) shows the batch-1 backward runs at ~44% MFU
while the forward runs at 74%, and the batch-8 width curve tops out
near 50% — this traces the FULL train step (GT + fwd + loss + bwd +
update) at a chosen batch/remat setting and prints the top HLO ops by
device self time so the slow backward fusions are named, not guessed.

Run:  python scripts/diag_train_profile.py [batch] [remat0/1]
Writes the raw op CSV to /tmp/monopsr_prof/train_b<batch>_ops.csv.
"""

import csv
import dataclasses
import glob
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as graft
from monopsr_tpu.utils import compile_cache

compile_cache.enable()


def capture(tag, train_step, state, dev_batch, n_iters=12):
    out_dir = os.path.join('/tmp/monopsr_prof', tag)
    os.makedirs(out_dir, exist_ok=True)
    state, losses = train_step(state, dev_batch)  # warm (donated state)
    float(losses['total_loss'])
    with jax.profiler.trace(out_dir):
        for _ in range(n_iters):
            state, losses = train_step(state, dev_batch)
        float(losses['total_loss'])
    return out_dir


def op_rows(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins/profile/*/*.xplane.pb')))
    assert paths, 'no trace under ' + trace_dir
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], 'framework_op_stats^', {})
    if isinstance(data, bytes):
        data = data.decode('utf-8', 'replace')
    return data


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else (batch >= 8)
    print('devices:', jax.devices(), 'batch:', batch, 'remat:', remat,
          flush=True)
    _, cfg = graft._flagship_config()
    cfg = dataclasses.replace(cfg, remat_towers=remat)
    train_step, state, batch_np = graft.build_train_setup(
        cfg, n_samples=batch)
    dev_batch = jax.device_put(batch_np)

    tag = 'train_b%d%s' % (batch, 'r' if remat else '')
    d = capture(tag, train_step, state, dev_batch)
    data = op_rows(d)
    out = os.path.join('/tmp/monopsr_prof', tag + '_ops.csv')
    with open(out, 'w') as f:
        f.write(data)
    print('wrote', out, flush=True)

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print('no rows parsed; inspect', out)
        return
    key_time = next((k for k in rows[0]
                     if 'self' in k.lower() and 'time' in k.lower()
                     and 'avg' not in k.lower()), None)
    print('columns:', list(rows[0]))
    rows.sort(key=lambda r: -float(r.get(key_time, 0) or 0))
    total = sum(float(r.get(key_time, 0) or 0) for r in rows)
    print(f'\ntop ops by {key_time} (total {total:.0f}):')
    for r in rows[:28]:
        t = float(r.get(key_time, 0) or 0)
        name = (r.get('Operation') or r.get('operation') or
                r.get('Op name') or '?')
        cat = r.get('Category') or r.get('category') or '?'
        flop_rate = (r.get('GFLOPs/sec') or r.get('Normalized FLOP rate')
                     or '')
        print(f'{100*t/total:5.1f}%  {t:12.0f}  {cat:24.24s} '
              f'{flop_rate:>12.12s}  {name[:90]}')


if __name__ == '__main__':
    main()
