"""CLI smoke tests: demos + offline-analysis scripts on fixture data."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLIT = os.path.join(REPO, 'tests/datasets/Kitti/object/training')
ENV = dict(os.environ, JAX_PLATFORMS='cpu', MPLBACKEND='Agg')


def run(args):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, env=ENV, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    return out


def test_view_kitti_sample_2d(tmp_path):
    out_png = str(tmp_path / 'sample.png')
    run(['demos/view_kitti_sample_2d.py', '--data_split_dir', SPLIT,
         '--sample_name', '000002', '--out', out_png])
    assert os.path.getsize(out_png) > 1000


def test_show_jittered_boxes_2d(tmp_path):
    out_png = str(tmp_path / 'jitter.png')
    run(['demos/show_jittered_boxes_2d.py', '--data_split_dir', SPLIT,
         '--sample_name', '000002', '--out', out_png])
    assert os.path.getsize(out_png) > 1000


def test_view_instance_masks(tmp_path):
    out_png = str(tmp_path / 'masks.png')
    run(['demos/view_instance_masks.py', '--data_split_dir', SPLIT,
         '--sample_name', '000002', '--out', out_png])
    assert os.path.getsize(out_png) > 1000


def write_metrics_tree(base, steps=(2000, 4000)):
    """Header-row + value-row CSVs, the evaluator's wide format."""
    for step in steps:
        d = os.path.join(base, str(step), 'val')
        os.makedirs(d)
        i = steps.index(step)
        for stat in ('avg', 'std', 'avg_abs', 'std_abs'):
            with open(os.path.join(d, 'metrics_{}.csv'.format(stat)),
                      'w') as f:
                f.write('metric_cen_z_err,metric_chamfer\n')
                f.write('{:.4f},{:.4f}\n'.format(
                    0.5 / (1 + i), 0.1 * (1 + i)))


def test_plot_metrics_and_condensed(tmp_path):
    metrics_dir = str(tmp_path / 'metrics')
    write_metrics_tree(metrics_dir)
    out_png = str(tmp_path / 'metrics.png')
    run(['scripts/offline_eval/plot_metrics.py', '--metrics_dir',
         metrics_dir, '--data_split', 'val', '--out', out_png])
    assert os.path.getsize(out_png) > 1000

    out = run(['scripts/offline_eval/print_metrics_condensed.py',
               '--metrics_dir', metrics_dir, '--data_split', 'val'])
    assert 'metric_cen_z_err' in out.stdout


def test_plot_ap(tmp_path):
    results = str(tmp_path / 'exp_results_0.1.txt')
    with open(results, 'w') as f:
        for step, ap in ((2000, '10.1 8.2 7.3'), (4000, '12.5 9.9 8.8')):
            f.write('step {}\n'.format(step))
            f.write('car_detection AP: 30.0 25.0 20.0\n')
            f.write('car_detection_3D AP: {}\n'.format(ap))
    out_png = str(tmp_path / 'ap.png')
    run(['scripts/offline_eval/plot_ap.py', '--results_file', results,
         '--out', out_png])
    assert os.path.getsize(out_png) > 1000


def test_plot_pr_curves(tmp_path):
    """PR-curve renderer turns the native evaluator's plot/*.txt into
    png figures (matplotlib twin of the reference's gnuplot output)."""
    result_dir = tmp_path / 'results'
    plot_dir = result_dir / 'plot'
    plot_dir.mkdir(parents=True)
    recall = np.linspace(0, 1, 41)
    for name in ('car_detection', 'car_detection_3D'):
        np.savetxt(str(plot_dir / (name + '.txt')),
                   np.stack([recall, 1 - recall, 1 - recall * 0.9,
                             1 - recall * 0.8], axis=1), fmt='%f')
    out = run(['scripts/offline_eval/plot_pr_curves.py', str(result_dir)])
    assert 'wrote 2 figure(s)' in out.stdout
    for name in ('car_detection', 'car_detection_3D'):
        assert os.path.getsize(str(plot_dir / (name + '.png'))) > 1000


def test_gen_depth_maps_tool(tmp_path):
    """Host-backend depth-map generation reproduces the shipped
    fixture GT map bit-exactly (uint16 png round trip)."""
    import cv2

    from monopsr_tpu.tools.gen_depth_maps import generate_depth_maps

    out_dir = str(tmp_path / 'depth')
    generate_depth_maps(SPLIT, sample_names=['000002'], out_dir=out_dir)
    got = cv2.imread(os.path.join(out_dir, '000002.png'),
                     cv2.IMREAD_ANYDEPTH)
    want = cv2.imread(os.path.join(SPLIT, 'depth_2_multiscale',
                                   '000002.png'), cv2.IMREAD_ANYDEPTH)
    assert got is not None and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_gen_instance_masks_tool(tmp_path):
    """Instance-mask generation reproduces the shipped fixture
    instance image."""
    import cv2

    from monopsr_tpu.tools.gen_instance_masks import \
        generate_instance_masks

    out_dir = str(tmp_path / 'inst')
    generate_instance_masks(SPLIT, sample_names=['000002'],
                            out_dir=out_dir)
    got = cv2.imread(os.path.join(out_dir, '000002.png'),
                     cv2.IMREAD_GRAYSCALE)
    want = cv2.imread(os.path.join(
        SPLIT, 'instance_2_depth_2_multiscale', '000002.png'),
        cv2.IMREAD_GRAYSCALE)
    assert got is not None and want is not None
    np.testing.assert_array_equal(got, want)
