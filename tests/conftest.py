"""Test configuration: CPU backend with a virtual 8-device mesh.

Tests never require TPU hardware; multi-chip sharding paths are validated
on a host-platform virtual device mesh.
"""

import os
import sys

# Must be set before the jax backend initializes. Note: the axon TPU
# plugin ignores JAX_PLATFORMS, so the config update below is required.
# The virtual multi-device mesh is exercised separately (the
# __graft_entry__.dryrun_multichip subprocess) because splitting the
# single CI core into 8 virtual devices slows every test ~7x.
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: XLA compiles dominate suite time on the
# single-core CI host; repeat runs hit the cache.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
