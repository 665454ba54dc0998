"""Quick device_fps + batched8_fps check (subset of bench.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    import jax
    print('devices:', jax.devices(), flush=True)
    device_fps = bench.bench_device_only()
    print('device_fps: %.2f' % device_fps, flush=True)
    batched_fps, flops_frame = bench.bench_batched()
    print('batched8_fps: %.2f  (%.1f GF/frame, %.1f%% MFU)' % (
        batched_fps, flops_frame / 1e9,
        100.0 * flops_frame * batched_fps / bench.V5E_BF16_PEAK_FLOPS),
        flush=True)
    print('device MFU: %.1f%%' % (
        100.0 * bench.forward_flops() * device_fps /
        bench.V5E_BF16_PEAK_FLOPS), flush=True)


if __name__ == '__main__':
    main()
