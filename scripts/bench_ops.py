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


def _time(fn, scalarize, a, b, iters=32):
    """Per-call seconds with a forced sequential chain.

    The remote-device transport dispatches asynchronously and its
    completion signals are unreliable for microbenchmarks (independent
    repeat calls can report dispatch latency, not execution). Chaining
    each iteration's input on the previous iteration's output forces
    the device to execute all `iters` calls back to back; one final
    scalar pull then bounds the true total.
    """
    import jax.numpy as jnp

    def step(carry, _):
        out = fn(a * (1.0 + carry * 1e-30), b)
        return scalarize(out), None

    chained = jax.jit(
        lambda a0: jax.lax.scan(step, a0, None, length=iters)[0])

    warm = chained(jnp.float32(0.0))
    jax.block_until_ready(warm)
    start = time.time()
    out = chained(jnp.float32(0.0))
    _ = float(out)  # real completion: pulls a scalar that depends on all
    return (time.time() - start) / iters


def main():
    rng = np.random.RandomState(0)
    xyz1 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))
    xyz2 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))

    def chamfer_pallas(a, b):
        return chamfer_ops.nn_distance(a, b, use_pallas=True)

    def chamfer_xla(a, b):
        return chamfer_ops.nn_distance(a, b, use_pallas=False)

    def chamfer_scalarize(out):
        return out[0].sum() + out[2].sum()

    results = {'shape': [B, N, 3],
               'device': str(jax.devices()[0].platform)}

    try:
        t_pallas = _time(chamfer_pallas, chamfer_scalarize, xyz1, xyz2)
        results['chamfer_pallas_ms'] = round(t_pallas * 1e3, 3)
    except Exception as exc:  # Pallas path is TPU-only
        results['chamfer_pallas_ms'] = None
        results['chamfer_pallas_error'] = str(exc)[:200]

    t_xla = _time(chamfer_xla, chamfer_scalarize, xyz1, xyz2)
    results['chamfer_xla_ms'] = round(t_xla * 1e3, 3)
    if results['chamfer_pallas_ms']:
        results['chamfer_speedup_vs_xla'] = round(
            t_xla / t_pallas, 2)

    # EMD metric cost: the full eval-mode expression (match + cost)
    def emd_fn(a, b):
        return emd_ops.match_cost(a, b, emd_ops.approx_match(a, b))

    t_emd = _time(emd_fn, lambda out: out.sum(), xyz1, xyz2, iters=8)
    results['emd_ms'] = round(t_emd * 1e3, 3)

    # Metric-mode fused EMD (no plan materialization)
    t_emd_fused = _time(emd_ops.emd_cost_fused, lambda out: out.sum(),
                        xyz1, xyz2, iters=8)
    results['emd_fused_ms'] = round(t_emd_fused * 1e3, 3)
    results['emd_fused_speedup'] = round(t_emd / t_emd_fused, 2)
    results['emd_note'] = (
        'per-sample eval metric cost at production shapes; the pipelined '
        'evaluator overlaps this with host formatting')

    out_path = os.path.join(REPO, 'OPS_BENCH.json')
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
