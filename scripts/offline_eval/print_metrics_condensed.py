"""Prints a condensed best-checkpoint metric summary table.

Behavioral twin of the reference summary script
(ref: scripts/offline_eval/print_metrics_condensed.py:7-173): for each
metric, shows the best value over all evaluated checkpoints and the
step where it occurred.

Usage:
    python scripts/offline_eval/print_metrics_condensed.py \
        --metrics_dir data/outputs/<name>/metrics --data_split val
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from plot_metrics import load_metrics  # noqa: E402

# Metrics where smaller absolute value is better
ABS_METRICS = ('cen_x_err', 'cen_y_err', 'cen_z_err', 'prop_cen_z_err',
               'view_ang_error', 'dim_err', 'chamfer', 'emd')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--metrics_dir', required=True)
    parser.add_argument('--data_split', default='val')
    args = parser.parse_args()

    avg = load_metrics(args.metrics_dir, args.data_split, 'avg')
    avg_abs = load_metrics(args.metrics_dir, args.data_split, 'avg_abs')

    print('{:<20s} {:>12s} {:>8s}   {:>12s} {:>8s}'.format(
        'metric', 'best avg', 'step', 'best |avg|', 'step'))
    for name in sorted(avg.keys()):
        rows = sorted(avg[name])
        abs_rows = sorted(avg_abs.get(name, rows))

        vals = np.asarray([r[1] for r in rows])
        abs_vals = np.asarray([r[1] for r in abs_rows])

        best = int(np.argmin(np.abs(vals)))
        best_abs = int(np.argmin(abs_vals))
        print('{:<20s} {:>12.4f} {:>8d}   {:>12.4f} {:>8d}'.format(
            name, vals[best], rows[best][0],
            abs_vals[best_abs], abs_rows[best_abs][0]))


if __name__ == '__main__':
    main()
