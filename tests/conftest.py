"""Test configuration: CPU backend with a virtual 8-device mesh.

Tests never require TPU hardware; multi-chip sharding paths are validated
on a host-platform virtual device mesh.
"""

import os
import sys

# Must be set before the jax backend initializes. Note: the axon TPU
# plugin ignores JAX_PLATFORMS, so the config update below is required.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
