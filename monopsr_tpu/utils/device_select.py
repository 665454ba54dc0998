"""Backend selection for the experiment CLIs.

The reference's ``--device`` flag picked a GPU via CUDA_VISIBLE_DEVICES
(ref: src/monopsr/experiments/run_training.py:46-47). The JAX twin maps
the flag to a platform choice: ``--device cpu`` forces the CPU backend
(useful on hosts where the TPU is busy or unreachable), ``--device tpu``
insists on the TPU, and the default (None) keeps JAX's own preference
(TPU when present).

Must be applied before the first JAX computation; ``jax.config`` is
safe to set after import but not after backend initialization. Note the
axon TPU plugin ignores the ``JAX_PLATFORMS`` environment variable, so
the config-level update here is the only reliable switch.
"""


def apply(device):
    """Applies a --device CLI value ('cpu', 'tpu', or None)."""
    if not device:
        return
    import jax
    jax.config.update('jax_platforms', device)
