"""Fast device->host transfer for pytrees of many small arrays.

The remote-TPU transport has high per-transfer latency (~0.4s per
array), so `jax.device_get` on a many-leaf tree (parameters, optimizer
state) costs minutes. `device_get_packed` groups leaves by dtype,
concatenates them into bounded-size chunks in small jitted programs
(compile cost stays low and cached by chunk signature), transfers one
buffer per chunk, and splits host-side.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Leaves per packed chunk: bounds packer compile time while amortizing
# the per-transfer latency.
_CHUNK = 128


@functools.lru_cache(maxsize=256)
def _chunk_packer(num_leaves):
    """Jitted concat of num_leaves flattened arrays (dtype-agnostic)."""
    if num_leaves == 1:
        return jax.jit(lambda x: x.reshape(-1))
    return jax.jit(
        lambda *xs: jnp.concatenate([x.reshape(-1) for x in xs]))


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

    # Group remaining device-leaf indices by dtype (concat needs one)
    groups = {}
    for idx, leaf in enumerate(leaves):
        if host_leaves[idx] is not None:
            continue
        dtype = str(np.asarray(jnp.result_type(leaf)).dtype) \
            if not hasattr(leaf, 'dtype') else str(leaf.dtype)
        groups.setdefault(dtype, []).append(idx)
    for dtype, idxs in groups.items():
        for start in range(0, len(idxs), _CHUNK):
            chunk_idxs = idxs[start:start + _CHUNK]
            chunk_leaves = [leaves[i] for i in chunk_idxs]
            if len(chunk_idxs) == 1:
                buf = np.asarray(
                    _chunk_packer(1)(chunk_leaves[0]))
            else:
                buf = np.asarray(
                    _chunk_packer(len(chunk_idxs))(*chunk_leaves))
            offset = 0
            for i in chunk_idxs:
                shape = np.shape(leaves[i])
                size = int(np.prod(shape)) if shape else 1
                host_leaves[i] = buf[offset:offset + size].reshape(shape)
                offset += size

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
