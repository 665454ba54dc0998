"""Data-parallel correctness: N-device step == 1-device step.

Runs tests/dp_equivalence_main.py in a subprocess with 2 virtual CPU
devices (the conftest keeps the main test process single-device because
splitting the CI core slows every other test).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_device_step_matches_single_device():
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        ' --xla_force_host_platform_device_count=2').strip()
    env['JAX_PLATFORMS'] = 'cpu'
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tests',
                                      'dp_equivalence_main.py')],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert 'DP_EQUIVALENCE_OK' in out.stdout, out.stdout + out.stderr


def test_two_device_eval_matches_single_device():
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        ' --xla_force_host_platform_device_count=2').strip()
    env['JAX_PLATFORMS'] = 'cpu'
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tests', 'eval_dp_main.py')],
        capture_output=True, text=True, env=env, timeout=1800)
    assert out.returncode == 0, out.stdout + out.stderr
    assert 'EVAL_DP_EQUIVALENCE_OK' in out.stdout, out.stdout + out.stderr
