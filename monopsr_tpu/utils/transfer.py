"""Fast device->host transfer for pytrees of many small arrays.

The remote-TPU transport has high per-transfer latency (~0.4s per
array), so `jax.device_get` on a many-leaf tree (parameters, optimizer
state) costs minutes. `device_get_packed` bitcasts every device leaf to
bytes inside one small jitted program, concatenates them into
bounded-size uint8 chunks, transfers one buffer per chunk, and splits /
reinterprets host-side. A tree of <= _CHUNK leaves (e.g. an eval step's
outputs) therefore costs exactly ONE device->host transfer regardless
of how many dtypes it mixes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Leaves per packed chunk: bounds packer compile time while amortizing
# the per-transfer latency.
_CHUNK = 512


def _to_bytes(x):
    """Flat uint8 view of an array, any dtype (jit-traceable)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    if x.dtype != jnp.uint8:
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return x.reshape(-1)


@functools.lru_cache(maxsize=256)
def _chunk_packer(num_leaves):
    """Jitted byte-concat of num_leaves arrays (dtype-mixing OK)."""
    if num_leaves == 1:
        return jax.jit(_to_bytes)
    return jax.jit(
        lambda *xs: jnp.concatenate([_to_bytes(x) for x in xs]))


def _from_bytes(buf, dtype, shape):
    """Reinterprets a contiguous uint8 slice as (dtype, shape)."""
    if dtype == np.bool_:
        return buf.astype(np.bool_).reshape(shape)
    return buf.view(dtype).reshape(shape)


def device_get_packed(tree):
    """Like jax.device_get, but with O(leaves / chunk) transfers."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree

    def on_host(leaf):
        return isinstance(leaf, np.ndarray) or np.isscalar(leaf)

    if all(on_host(l) for l in leaves):
        return tree

    host_leaves = [leaf if on_host(leaf) else None for leaf in leaves]

    device_idxs = [i for i, l in enumerate(leaves)
                   if host_leaves[i] is None]
    for start in range(0, len(device_idxs), _CHUNK):
        chunk_idxs = device_idxs[start:start + _CHUNK]
        chunk_leaves = [leaves[i] for i in chunk_idxs]
        buf = np.asarray(
            _chunk_packer(len(chunk_idxs))(*chunk_leaves))
        offset = 0
        for i in chunk_idxs:
            leaf = leaves[i]
            shape = np.shape(leaf)
            dtype = np.dtype(leaf.dtype)
            nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize \
                if shape else dtype.itemsize
            host_leaves[i] = _from_bytes(
                buf[offset:offset + nbytes], dtype, shape)
            offset += nbytes

    return jax.tree.unflatten(treedef, host_leaves)


def device_get_packed_state(state, params):
    """Packed transfer of a train state, reusing the params packer.

    The optimizer state (adam mu/nu) and EMA copies share the params
    tree structure, so packing each such subtree separately hits the
    same compiled packers instead of compiling new ones for the
    interleaved whole-state flattening. Scalars and oddly-shaped
    remainders fall back to plain device_get (cheap).

    Args:
        state: any pytree (e.g. TrainState).
        params: the parameter subtree whose structure recurs in state.

    Returns:
        state with all leaves as host numpy arrays.
    """
    params_structure = jax.tree.structure(params)

    def is_params_shaped(node):
        if not isinstance(node, (dict,)) and not hasattr(
                node, 'keys'):
            return False
        try:
            return jax.tree.structure(node) == params_structure
        except Exception:
            return False

    subtrees, outer = jax.tree.flatten(state, is_leaf=is_params_shaped)
    host_subtrees = []
    for node in subtrees:
        if is_params_shaped(node):
            host_subtrees.append(device_get_packed(node))
        else:
            host_subtrees.append(node)
    # Remaining device leaves (scalars, stats) in one packed pass
    rebuilt = jax.tree.unflatten(outer, host_subtrees)
    return device_get_packed(rebuilt)
