"""Accuracy regression gate: train -> eval -> native KITTI AP as one JSON.

Closes the accuracy half of the north star at the scale this environment
allows: overfits the full production model (ResNet-101 dual towers,
bf16, 320x1216, 32 proposal slots) on the checked-in mini-KITTI fixture
THROUGH the complete pipeline — MSCNN merge, oversample + box jitter,
GT instance crops, training, checkpointing, EMA weights, the evaluator,
score re-scoring, postprocess_cen_x, KITTI writers, and the native C++
evaluator — then gates on the resulting Car AP.

At convergence the predicted boxes match GT, so every AP curve
(image / BEV / 3D at 0.7 IoU) reaches the fixture's recall-grid maximum
and they all agree; any geometric-contract regression (crops, offsets,
centroid assembly, writers, protocol) breaks that agreement. This is
the fixture-scale stand-in for full-KITTI parity; see RUNBOOK.md for
the full-scale procedure and the BASELINE.md numbers it should hit.

Usage (driver-runnable, ~20 min on one TPU chip):
    python scripts/accuracy_gate.py --out ACCURACY_r02.json
    python scripts/accuracy_gate.py --steps 200 --min_ap 0  # smoke only

Ref contract: README.md:94-115 (train -> infer -> kitti_native_eval),
evaluator.py:136-383.
"""

import argparse
import json
import os
import re
import shutil
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, 'tests', 'datasets', 'Kitti', 'object')
CANONICAL = os.path.join(REPO, 'configs', 'monopsr_model_000.yaml')

CURVES = ('car_detection', 'car_orientation', 'car_detection_BEV',
          'car_detection_3D')


def build_gate_config(args, out_dir):
    """Canonical config re-targeted at the fixture for an overfit run."""
    with open(CANONICAL) as f:
        raw = yaml.safe_load(f)

    ds = raw['dataset_config']
    ds['dataset_dir'] = FIXTURE
    ds['mscnn_dir'] = os.path.join(FIXTURE, 'mscnn')
    ds['data_split'] = args.split
    ds['seed'] = args.seed

    tc = raw['train_config']
    tc['max_iterations'] = args.steps
    tc['checkpoint_interval'] = args.steps
    tc['summary_interval'] = max(args.steps // 20, 1)
    tc['overwrite_checkpoints'] = True
    opt = tc['optimizer']['adam_optimizer']
    opt['moving_average_decay'] = args.ema_decay

    config_path = os.path.join(out_dir, 'accuracy_gate.yaml')
    with open(config_path, 'w') as f:
        yaml.safe_dump(raw, f)
    return config_path


def parse_results_txt(path):
    """Parses the native evaluator transcript into {curve: [E, M, H]}."""
    aps = {}
    with open(path) as f:
        text = f.read()
    for curve in CURVES:
        matches = re.findall(
            curve + r' AP: ([\d.]+) ([\d.]+) ([\d.]+)', text)
        if matches:
            aps[curve] = [float(v) for v in matches[-1]]
    return aps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default=None,
                        help='Output JSON path (default ACCURACY.json)')
    parser.add_argument('--steps', type=int, default=2500)
    parser.add_argument('--split', default='train',
                        choices=['train', 'val', 'trainval'])
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--ema_decay', type=float, default=0.995,
                        help='EMA decay sized for the overfit horizon '
                             '(canonical 0.9999 barely moves in 2.5k '
                             'steps; the evaluator scores EMA weights)')
    parser.add_argument('--min_ap', type=float, default=15.0,
                        help='Gate: minimum Car AP_3D moderate @0.7 IoU')
    parser.add_argument('--skip_train', action='store_true',
                        help='Evaluate the existing checkpoint only')
    args = parser.parse_args()

    from monopsr_tpu.utils import compile_cache
    compile_cache.enable()

    from monopsr_tpu import config as config_utils
    from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from monopsr_tpu.eval.evaluator import Evaluator
    from monopsr_tpu.train import trainer as trainer_lib

    os.makedirs(os.path.join(REPO, 'data', 'outputs'), exist_ok=True)
    staging = os.path.join(REPO, 'data', 'outputs', '_accuracy_gate_cfg')
    os.makedirs(staging, exist_ok=True)
    config_path = build_gate_config(args, staging)
    config = config_utils.parse_yaml_config(config_path)

    t0 = time.time()
    if not args.skip_train:
        # Fresh experiment dir so the gate never scores a stale run
        if os.path.exists(config.exp_output_dir):
            shutil.rmtree(config.exp_output_dir)
        train_dataset = KittiDataset(config.dataset_config, 'train')
        trainer_lib.train(config, train_dataset)
    train_time = time.time() - t0

    # Evaluate the final checkpoint on the same split (overfit check:
    # pipeline consistency, not generalization)
    eval_dataset_config = config.dataset_config
    eval_dataset = KittiDataset(eval_dataset_config, 'val')
    evaluator = Evaluator(config, eval_dataset, 'val',
                          do_kitti_native_eval=False)
    results = evaluator.run_latest_checkpoints('all')[-1]
    step = results['step']

    # Native AP in the foreground, then parse its transcript
    evaluator.run_kitti_native_eval(step, background=False)
    results_txt = os.path.join(
        config.pred_dir, '{}_results_{}.txt'.format(
            config.config_name, round(evaluator.score_threshold, 3)))
    aps = parse_results_txt(results_txt)
    if not aps:
        raise SystemExit('No AP curves in ' + results_txt)

    ap_3d = aps.get('car_detection_3D', [0, 0, 0])
    ap_2d = aps.get('car_detection', [0, 0, 0])

    gate = {
        'metric': 'fixture_overfit_car_ap',
        'split': args.split,
        'steps': args.steps,
        'step_evaluated': step,
        'train_seconds': round(train_time, 1),
        'ap_image': ap_2d,
        'ap_bev': aps.get('car_detection_BEV', [0, 0, 0]),
        'ap_3d': ap_3d,
        'aos': aps.get('car_orientation', [0, 0, 0]),
        'iou_regime': '0.7/0.5/0.5',
        'losses': results.get('losses', {}),
        'metrics': results.get('metrics', {}),
        'min_ap_gate': args.min_ap,
        'pass': bool(ap_3d[1] >= args.min_ap),
    }

    out_path = args.out or os.path.join(REPO, 'ACCURACY.json')
    with open(out_path, 'w') as f:
        json.dump(gate, f, indent=2)
    print(json.dumps(gate))

    if not gate['pass']:
        raise SystemExit(
            'ACCURACY GATE FAILED: AP_3D moderate {:.2f} < {:.2f}'.format(
                ap_3d[1], args.min_ap))
    print('ACCURACY GATE PASSED: AP_3D (E/M/H) = {}'.format(ap_3d))


if __name__ == '__main__':
    main()
