"""Plots AP vs checkpoint step from native-eval results files.

Behavioral twin of the reference plot_ap
(ref: scripts/offline_eval/plot_ap.py:8-123): parses the
`<ckpt>_results_<thr>.txt` files produced by run_eval.sh (alternating
'step N' markers and '<curve> AP: e m h' lines) and plots AP over steps.

Usage:
    python scripts/offline_eval/plot_ap.py \
        --results_file data/outputs/<name>/predictions/<name>_results_0.1.txt \
        [--curve car_detection_3D] [--out ap_plot.png]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def parse_results_file(path):
    """Returns {curve: [(step, easy, mod, hard), ...]}."""
    curves = {}
    step = None
    with open(path) as f:
        for line in f:
            m = re.match(r'step (\d+)', line)
            if m:
                step = int(m.group(1))
                continue
            m = re.match(r'(\S+) AP: ([\d.]+) ([\d.]+) ([\d.]+)', line)
            if m and step is not None:
                curves.setdefault(m.group(1), []).append(
                    (step, float(m.group(2)), float(m.group(3)),
                     float(m.group(4))))
    return curves


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--results_file', required=True)
    parser.add_argument('--curve', default='car_detection_3D')
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    curves = parse_results_file(args.results_file)
    if args.curve not in curves:
        print('Available curves:', sorted(curves.keys()))
        return

    rows = sorted(curves[args.curve])
    print('step  easy    moderate hard')
    for step, e, m, h in rows:
        print('{:6d} {:7.3f} {:7.3f} {:7.3f}'.format(step, e, m, h))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    steps = [r[0] for r in rows]
    fig, ax = plt.subplots()
    for idx, name in ((1, 'Easy'), (2, 'Moderate'), (3, 'Hard')):
        ax.plot(steps, [r[idx] for r in rows], marker='o', label=name)
    ax.set_xlabel('step')
    ax.set_ylabel('AP')
    ax.set_title(args.curve)
    ax.legend()
    out = args.out or (args.curve + '_ap.png')
    fig.savefig(out, bbox_inches='tight')
    print('Saved', out)


if __name__ == '__main__':
    main()
