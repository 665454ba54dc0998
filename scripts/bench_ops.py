"""Kernel benchmarks at production shapes: Pallas vs XLA chamfer, EMD.

Records the evidence for the README's kernel claims and for the
eval-time metric budget (compute_metrics runs approxmatch at
(32, 2304, 2304) per sample, models/monopsr.py:285-292):

    python scripts/bench_ops.py          # writes OPS_BENCH.json

Shapes: B=32 boxes, N=M=2304 (48x48 instance maps), float32.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

from monopsr_tpu.utils import compile_cache

compile_cache.enable()

from monopsr_tpu.ops import chamfer as chamfer_ops
from monopsr_tpu.ops import emd as emd_ops

B, N = 32, 48 * 48


def _time(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - start) / iters


def main():
    rng = np.random.RandomState(0)
    xyz1 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))
    xyz2 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))

    chamfer_pallas = jax.jit(
        lambda a, b: chamfer_ops.nn_distance(a, b, use_pallas=True))
    chamfer_xla = jax.jit(
        lambda a, b: chamfer_ops.nn_distance(a, b, use_pallas=False))

    results = {'shape': [B, N, 3],
               'device': str(jax.devices()[0].platform)}

    try:
        t_pallas = _time(chamfer_pallas, xyz1, xyz2)
        results['chamfer_pallas_ms'] = round(t_pallas * 1e3, 3)
    except Exception as exc:  # Pallas path is TPU-only
        results['chamfer_pallas_ms'] = None
        results['chamfer_pallas_error'] = str(exc)[:200]

    t_xla = _time(chamfer_xla, xyz1, xyz2)
    results['chamfer_xla_ms'] = round(t_xla * 1e3, 3)
    if results['chamfer_pallas_ms']:
        results['chamfer_speedup_vs_xla'] = round(
            t_xla / t_pallas, 2)

    # EMD metric cost: the full eval-mode expression (match + cost)
    emd_fn = jax.jit(lambda a, b: emd_ops.match_cost(
        a, b, emd_ops.approx_match(a, b)))
    t_emd = _time(emd_fn, xyz1, xyz2, iters=5)
    results['emd_ms'] = round(t_emd * 1e3, 3)
    results['emd_note'] = (
        'per-sample eval metric cost at production shapes; the pipelined '
        'evaluator overlaps this with host formatting')

    out_path = os.path.join(REPO, 'OPS_BENCH.json')
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
