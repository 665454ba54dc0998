"""Persistent XLA compilation cache for production entry points.

Every fresh process pays full XLA compiles (the jitted train/eval step
~50s on TPU, plus the packed-transfer packers); the persistent cache
makes repeat invocations of the CLIs/bench start in seconds. Tests
configure their own cache (tests/conftest.py); call `enable()` at CLI
entry for everything else. Set MONOPSR_NO_COMPILE_CACHE=1 to disable.
"""

import os


def enable(cache_dir=None):
    if os.environ.get('MONOPSR_NO_COMPILE_CACHE'):
        return None
    import jax

    if cache_dir is None:
        import monopsr_tpu
        cache_dir = os.path.join(monopsr_tpu.data_dir(), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as exc:  # never block a run on cache config
        print('[compile cache] disabled:', exc)
        return None
    return cache_dir
