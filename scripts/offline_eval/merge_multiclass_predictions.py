"""Merges per-class KITTI-format predictions into one multi-class set.

The reference (and this framework) trains/infers one class per run
(ref: kitti_dataset.py:183-190 raises on >1 class); KITTI evaluation of
all three classes therefore combines the per-run prediction files. This
tool concatenates the per-sample KITTI txts from several experiments'
kitti_predictions_3d dirs into one directory ready for
scripts/offline_eval/kitti_native_eval.

Usage:
    python scripts/offline_eval/merge_multiclass_predictions.py \
        --pred_dirs data/outputs/car_run/predictions/kitti_predictions_3d/val/0.1/100000/data \
                    data/outputs/ped_run/predictions/kitti_predictions_3d/val/0.1/90000/data \
        --out_dir merged_preds/data
"""

import argparse
import os


def merge_prediction_dirs(pred_dirs, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    sample_names = set()
    for d in pred_dirs:
        sample_names.update(
            f for f in os.listdir(d) if f.endswith('.txt'))

    for fname in sorted(sample_names):
        rows = []
        for d in pred_dirs:
            path = os.path.join(d, fname)
            if os.path.exists(path):
                with open(path, 'rb') as f:
                    content = f.read().decode().strip()
                if content:
                    rows.extend(content.split('\r\n')
                                if '\r\n' in content
                                else content.splitlines())
        with open(os.path.join(out_dir, fname), 'wb') as f:
            if rows:
                f.write(('\r\n'.join(rows) + '\r\n').encode())
    return len(sample_names)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--pred_dirs', nargs='+', required=True)
    parser.add_argument('--out_dir', required=True)
    args = parser.parse_args()
    n = merge_prediction_dirs(args.pred_dirs, args.out_dir)
    print('Merged {} sample files into {}'.format(n, args.out_dir))


if __name__ == '__main__':
    main()
