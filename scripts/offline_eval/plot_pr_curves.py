"""Renders the native evaluator's PR-curve txts to png figures.

The reference's C++ evaluator emits gnuplot scripts and runs gnuplot to
produce a png/pdf per class/metric
(ref: scripts/offline_eval/kitti_native_eval/evaluate_object_3d_offline.cpp:900-1006).
The rebuilt evaluator writes the same curves as
`<result_dir>/plot/<class>_<metric>.txt` (41 rows: recall easy mod hard);
this script draws them with matplotlib. run_eval.sh invokes it after the
binary so every eval run leaves figures where the reference produced them.

Usage:
    python scripts/offline_eval/plot_pr_curves.py <result_dir> [...]
"""

import glob
import os
import sys

import numpy as np


def plot_dir_curves(result_dir):
    """Renders every plot/*.txt under result_dir to plot/*.png."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    plot_dir = os.path.join(result_dir, 'plot')
    curve_files = sorted(glob.glob(os.path.join(plot_dir, '*.txt')))
    written = []
    for path in curve_files:
        data = np.loadtxt(path)
        if data.ndim != 2 or data.shape[1] != 4:
            continue
        name = os.path.splitext(os.path.basename(path))[0]

        fig, ax = plt.subplots(figsize=(6, 4.5))
        for col, label in ((1, 'Easy'), (2, 'Moderate'), (3, 'Hard')):
            ax.plot(data[:, 0], data[:, col], label=label, linewidth=2)
        ax.set_xlabel('Recall')
        ax.set_ylabel('Precision')
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.set_title(name.replace('_', ' '))
        ax.grid(True, alpha=0.3)
        ax.legend(loc='lower left')
        out = os.path.join(plot_dir, name + '.png')
        fig.savefig(out, dpi=100, bbox_inches='tight')
        plt.close(fig)
        written.append(out)
    return written


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    for result_dir in sys.argv[1:]:
        written = plot_dir_curves(result_dir)
        print('{}: wrote {} figure(s)'.format(result_dir, len(written)))


if __name__ == '__main__':
    main()
