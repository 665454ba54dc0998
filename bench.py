"""Benchmark: MonoPSR inference frames/sec on one TPU chip.

Measures the steady-state per-frame latency of the flagship model's
jitted forward (full ResNet-101 dual towers at production shapes:
32 proposal slots, 320x1216 input image) including host->device input
transfer, and prints ONE JSON line.

Baseline: the reference reports ~0.2 s/frame on a desktop GPU
(arXiv:1904.01690; see BASELINE.md), i.e. 5 fps. vs_baseline is the
speedup over that 5 fps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

import __graft_entry__ as graft

BASELINE_FPS = 5.0  # reference: ~0.2 s/frame on GPU (BASELINE.md)


def main():
    forward, (variables, sample) = graft.entry()
    fn = jax.jit(forward)

    # Fresh host inputs each frame so the measurement includes the
    # host->device transfer, like a real inference loop.
    frames = [graft._synthetic_sample(graft._flagship_config()[1], seed=i)
              for i in range(4)]

    # Warmup / compile
    out = fn(variables, frames[0])
    jax.block_until_ready(out)

    n_iters = 20
    start = time.time()
    for i in range(n_iters):
        out = fn(variables, frames[i % len(frames)])
    jax.block_until_ready(out)
    elapsed = time.time() - start

    fps = n_iters / elapsed
    result = {
        'metric': 'inference_fps_tpu_v5e',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / BASELINE_FPS, 2),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
