"""Device mesh and sharding helpers (data parallelism over images).

The reference has no distributed training (single GPU, batch 1,
ref: src/monopsr/experiments/run_training.py:46-47); here the per-step
image batch is a first-class axis sharded over a 1-D 'data' mesh. Params
are replicated; jit inserts the gradient psum over ICI from the sharding
annotations (no hand-written collectives).

The mesh axis plumbing is a single helper so larger meshes (e.g. a
(data, model) grid) can slot in without touching the train step.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel=None, devices=None):
    """Creates a 1-D 'data' mesh.

    Args:
        data_parallel: number of devices on the data axis (defaults to
            all available devices).
        devices: explicit device list (defaults to jax.devices()).

    Returns:
        jax.sharding.Mesh over ('data',).
    """
    if devices is None:
        devices = jax.devices()
    if data_parallel is None:
        data_parallel = len(devices)
    if data_parallel > len(devices):
        raise ValueError(
            'data_parallel={} exceeds available devices ({})'.format(
                data_parallel, len(devices)))
    return Mesh(np.asarray(devices[:data_parallel]), ('data',))


def batch_sharding(mesh):
    """Sharding for per-sample batch arrays: leading axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    """Fully replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Places a stacked batch dict with its leading axis over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh, tree):
    """Replicates a pytree (e.g. the train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch_stacked(mesh, batches):
    """Places a (steps, batch, ...) stack: axis 1 over 'data'.

    Used by the trainer's steps_per_dispatch mode — axis 0 is the
    lax.scan step axis (replicated; each scan iteration consumes one
    slice), axis 1 the per-step data-parallel batch axis.
    """
    sharding = NamedSharding(mesh, P(None, 'data'))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batches)
