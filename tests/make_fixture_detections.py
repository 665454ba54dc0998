"""Fixture prep: pseudo-MSCNN 2D detections from jittered GT labels.

The reference consumes externally-downloaded MSCNN detections
(data/detections/mscnn/kitti_fmt/<split>/merged_0.2_0.2_0.2/data); for
the checked-in mini-KITTI fixture we synthesize equivalent files by
jittering the GT 2D boxes and assigning plausible scores. Run once; the
outputs are committed.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monopsr_tpu.datasets.kitti import obj_utils  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'datasets/Kitti/object')
OUT_BASE = os.path.join(FIXTURE, 'mscnn')

DET_CLASSES = ('Car', 'Pedestrian', 'Cyclist')


def main():
    rng = np.random.RandomState(123)
    for split, split_dir, label_src in [
            ('train', 'training', 'label_2'),
            ('val', 'training', 'label_2'),
            ('trainval', 'training', 'label_2'),
            ('test', 'testing', None)]:
        out_dir = os.path.join(OUT_BASE, split, 'merged_0.2_0.2_0.2',
                               'data')
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(FIXTURE, split + '.txt')) as f:
            names = f.read().splitlines()

        for name in names:
            rows = []
            if label_src is not None:
                labels = obj_utils.read_labels(
                    os.path.join(FIXTURE, split_dir, label_src), name)
                for obj in labels:
                    if obj.type not in DET_CLASSES:
                        continue
                    w, h = obj.x2 - obj.x1, obj.y2 - obj.y1
                    jit = rng.normal(0, 0.03, 4) * [w, h, w, h]
                    score = float(np.clip(rng.uniform(0.5, 0.99), 0, 1))
                    rows.append(
                        '{} -1 -1 -10 {:.2f} {:.2f} {:.2f} {:.2f} '
                        '-1 -1 -1 -1000 -1000 -1000 -10 {:.3f}'.format(
                            obj.type,
                            obj.x1 + jit[0], obj.y1 + jit[1],
                            obj.x2 + jit[2], obj.y2 + jit[3], score))
            else:
                # test split: a few synthetic boxes per image
                for _ in range(rng.randint(1, 4)):
                    x1 = rng.uniform(100, 900)
                    y1 = rng.uniform(140, 250)
                    w = rng.uniform(40, 160)
                    h = rng.uniform(30, 90)
                    rows.append(
                        'Car -1 -1 -10 {:.2f} {:.2f} {:.2f} {:.2f} '
                        '-1 -1 -1 -1000 -1000 -1000 -10 {:.3f}'.format(
                            x1, y1, x1 + w, y1 + h,
                            rng.uniform(0.3, 0.95)))
            with open(os.path.join(out_dir, name + '.txt'), 'w') as f:
                f.write('\n'.join(rows) + ('\n' if rows else ''))
    print('Wrote pseudo-MSCNN detections under', OUT_BASE)


if __name__ == '__main__':
    main()
