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


def _time(fn, scalarize, a, b, iters=32, repeats=3):
    """Per-call seconds with a forced sequential chain.

    The remote-device transport dispatches asynchronously and its
    completion signals are unreliable for microbenchmarks (independent
    repeat calls can report dispatch latency, not execution). Chaining
    each iteration's input on the previous iteration's output forces
    the device to execute all `iters` calls back to back; one final
    scalar pull bounds the true total. The 1-iteration chain's time
    (dispatch + the pull's round trip — tens of ms through the dev
    tunnel) is subtracted so the reported number is pure per-op cost.
    """
    import jax.numpy as jnp

    def chained_fn(length):
        def step(carry, _):
            out = fn(a * (1.0 + carry * 1e-30), b)
            return scalarize(out), None
        return jax.jit(
            lambda a0: jax.lax.scan(step, a0, None, length=length)[0])

    def measure(chained):
        start = time.time()
        _ = float(chained(jnp.float32(0.0)))  # pull forces completion
        return time.time() - start

    one = chained_fn(1)
    many = chained_fn(iters)
    float(one(jnp.float32(0.0)))   # warmup/compile
    float(many(jnp.float32(0.0)))
    t1 = min(measure(one) for _ in range(repeats))
    tk = min(measure(many) for _ in range(repeats))
    return max(tk - t1, 1e-9) / (iters - 1)


def main():
    rng = np.random.RandomState(0)
    xyz1 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))
    xyz2 = jax.device_put(rng.randn(B, N, 3).astype(np.float32))

    def chamfer_xla(a, b):
        return chamfer_ops.nn_distance(a, b)

    def chamfer_scalarize(out):
        return out[0].sum() + out[2].sum()

    results = {'shape': [B, N, 3],
               'device': str(jax.devices()[0].platform)}

    t_xla = _time(chamfer_xla, chamfer_scalarize, xyz1, xyz2)
    results['chamfer_xla_ms'] = round(t_xla * 1e3, 3)
    results['chamfer_note'] = (
        'single fused matmul+reduce pass; the round-2 hand-tiled Pallas '
        'twin measured 0.77x of this and was removed (see ops/chamfer.py)')

    # EMD metric cost: the full eval-mode expression (match + cost)
    def emd_fn(a, b):
        return emd_ops.match_cost(a, b, emd_ops.approx_match(a, b))

    t_emd = _time(emd_fn, lambda out: out.sum(), xyz1, xyz2, iters=8)
    results['emd_ms'] = round(t_emd * 1e3, 3)

    # Metric-mode fused EMD: XLA ladder vs the VMEM-resident Pallas kernel
    def emd_fused_xla(a, b):
        return emd_ops.emd_cost_fused(a, b, use_pallas=False)

    t_emd_fused = _time(emd_fused_xla, lambda out: out.sum(),
                        xyz1, xyz2, iters=8)
    results['emd_fused_ms'] = round(t_emd_fused * 1e3, 3)
    results['emd_fused_speedup'] = round(t_emd / t_emd_fused, 2)

    try:
        def emd_fused_pallas(a, b):
            return emd_ops.emd_cost_fused(a, b, use_pallas=True)

        t_emd_pallas = _time(emd_fused_pallas, lambda out: out.sum(),
                             xyz1, xyz2, iters=8)
        results['emd_pallas_ms'] = round(t_emd_pallas * 1e3, 3)
        results['emd_pallas_speedup_vs_xla'] = round(
            t_emd_fused / t_emd_pallas, 2)
    except Exception as exc:  # Pallas lowering is TPU-only
        results['emd_pallas_ms'] = None
        results['emd_pallas_error'] = str(exc)[:200]

    # Differentiable loss path (emd_distance: value + grads to BOTH
    # clouds). The XLA route materializes the plan via the annealing
    # scan; the Pallas route computes cost + plan-contracted gradient
    # accumulators in ONE VMEM-resident sweep (custom VJP, no plan in
    # HBM) — ref: tf_approxmatch.py:52-71 gradient contract.
    for label, use_pallas in (('emd_loss_xla', False),
                              ('emd_loss_pallas', True)):
        try:
            def emd_loss_vg(a, b, _p=use_pallas):
                val, (g1, g2) = jax.value_and_grad(
                    lambda x, y: emd_ops.emd_distance(
                        x, y, use_pallas=_p).sum(),
                    argnums=(0, 1))(a, b)
                return val, g1, g2

            t = _time(emd_loss_vg,
                      lambda out: out[0] + out[1].sum() + out[2].sum(),
                      xyz1, xyz2, iters=8)
            results[label + '_ms'] = round(t * 1e3, 3)
        except Exception as exc:
            results[label + '_ms'] = None
            results[label + '_error'] = str(exc)[:200]
    if results.get('emd_loss_pallas_ms') and results.get('emd_pallas_ms'):
        results['emd_loss_vs_fused_metric'] = round(
            results['emd_loss_pallas_ms'] / results['emd_pallas_ms'], 2)

    results['emd_note'] = (
        'per-sample eval metric cost at production shapes; the pipelined '
        'evaluator overlaps this with host formatting. The Pallas kernel '
        'holds the whole annealing state in VMEM (zero HBM traffic in '
        'the loop) and recomputes distance tiles on the MXU')

    out_path = os.path.join(REPO, 'OPS_BENCH.json')
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
