"""Plots eval metrics CSVs over checkpoint steps.

Behavioral twin of the reference plot_metrics
(ref: scripts/offline_eval/plot_metrics.py). Reads the
metrics/<step>/<split>/metrics_<stat>.csv tables written by the
evaluator and plots selected metrics across steps.

Usage:
    python scripts/offline_eval/plot_metrics.py \
        --metrics_dir data/outputs/<name>/metrics --data_split val \
        [--metrics cen_z_err chamfer] [--stat avg] [--out metrics.png]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def load_metrics(metrics_dir, data_split, stat='avg'):
    """Returns {metric: [(step, value), ...]}."""
    series = {}
    for entry in sorted(os.listdir(metrics_dir)):
        step_dir = os.path.join(metrics_dir, entry, data_split)
        csv_path = os.path.join(step_dir, 'metrics_{}.csv'.format(stat))
        if not os.path.exists(csv_path):
            continue
        step = int(entry)
        with open(csv_path) as f:
            reader = csv.reader(f)
            header = next(reader)
            values = next(reader)
        for name, value in zip(header, values):
            series.setdefault(name, []).append((step, float(value)))
    return series


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--metrics_dir', required=True)
    parser.add_argument('--data_split', default='val')
    parser.add_argument('--metrics', nargs='+', default=None)
    parser.add_argument('--stat', default='avg',
                        choices=['avg', 'std', 'avg_abs', 'std_abs'])
    parser.add_argument('--out', default='metrics_plot.png')
    args = parser.parse_args()

    series = load_metrics(args.metrics_dir, args.data_split, args.stat)
    if not series:
        print('No metrics found under', args.metrics_dir)
        return
    names = args.metrics or sorted(series.keys())

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for name in names:
        if name not in series:
            print('Unknown metric:', name, '| available:',
                  sorted(series.keys()))
            continue
        rows = sorted(series[name])
        ax.plot([r[0] for r in rows], [r[1] for r in rows],
                marker='o', label=name)
        print(name, rows)
    ax.set_xlabel('step')
    ax.set_ylabel(args.stat)
    ax.legend()
    fig.savefig(args.out, bbox_inches='tight')
    print('Saved', args.out)


if __name__ == '__main__':
    main()
