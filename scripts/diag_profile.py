"""Capture device traces of the single-frame vs batched-8 forward and
print per-op self-time tables, so the batched-8 MFU regression
(BENCH_r03: 83.2% single vs 45.8% batched) is attributed to specific
fused ops rather than guessed at.

Run on the real chip:
    python scripts/diag_profile.py [batch]
Writes traces under /tmp/monopsr_prof/{single,batched}/ and prints the
top-k ops by self time for each, plus the delta table (batched ms/frame
minus single ms/frame per op category).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
import __graft_entry__ as graft
from monopsr_tpu import constants as C
from monopsr_tpu.train import trainer as trainer_lib


def capture(tag, fn, args, n_iters=24):
    """Run fn(*args) n_iters times under a profiler trace."""
    out_dir = os.path.join('/tmp/monopsr_prof', tag)
    os.makedirs(out_dir, exist_ok=True)
    # warm
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(out_dir):
        acc = 0.0
        for _ in range(n_iters):
            out = fn(*args)
            acc = acc + jnp.sum(out[C.KEY_CENTROIDS])
        float(acc)
    return out_dir


def op_table(trace_dir):
    """Parse the xplane trace into (op_name, total_self_us) rows."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins/profile/*/*.xplane.pb')))
    assert paths, 'no trace found under ' + trace_dir
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], 'framework_op_stats^', {})
    return data


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print('devices:', jax.devices(), flush=True)

    forward, (variables, sample) = graft.entry()
    cfg = graft._flagship_config()[1]
    dev_sample = jax.device_put(sample)
    fwd1 = jax.jit(forward)

    samples = [graft._synthetic_sample(cfg, seed=i) for i in range(batch)]
    stacked = trainer_lib.stack_samples(samples)
    stacked['image'] = np.clip(
        np.rint(stacked['image']), 0, 255).astype(np.uint8)
    dev_batch = jax.device_put(stacked)
    fwdb = jax.jit(lambda v, b: jax.vmap(lambda s: forward(v, s))(b))

    d1 = capture('single', fwd1, (variables, dev_sample))
    db = capture('batched', fwdb, (variables, dev_batch))

    for tag, d in (('single', d1), ('batched', db)):
        print('\n=== {} ==='.format(tag), flush=True)
        try:
            data = op_table(d)
            out = os.path.join('/tmp/monopsr_prof', tag + '_ops.csv')
            with open(out, 'w') as f:
                f.write(data if isinstance(data, str)
                        else data.decode('utf-8', 'replace'))
            print('wrote', out, flush=True)
        except Exception as exc:
            print('op table failed:', repr(exc), flush=True)
            print('trace dir:', d)


if __name__ == '__main__':
    main()
