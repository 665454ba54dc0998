"""Fast device->host transfer for pytrees of many small arrays.

The remote-TPU transport has high per-transfer latency (~0.4s per
array), so `jax.device_get` on a 200-leaf parameter tree costs minutes.
`device_get_packed` concatenates all leaves of each dtype into one
buffer in a single jitted program, transfers one buffer per dtype, and
splits host-side — turning O(leaves) round trips into O(dtypes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _make_packer(treedef, shapes, dtypes):
    """Builds a jitted packer for a fixed tree structure."""
    # Group leaf indices by dtype
    groups = {}
    for idx, dtype in enumerate(dtypes):
        groups.setdefault(dtype, []).append(idx)

    def pack_from_tree(tree):
        leaves = jax.tree.leaves(tree)
        out = {}
        for dtype, idxs in groups.items():
            flat = [jnp.reshape(leaves[i], (-1,)) for i in idxs]
            out[dtype] = (jnp.concatenate(flat) if len(flat) > 1
                          else flat[0])
        return out

    return jax.jit(pack_from_tree), groups


def device_get_packed(tree):
    """Like jax.device_get, but with O(num_dtypes) transfers."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    if all(isinstance(l, np.ndarray) or np.isscalar(l) for l in leaves):
        return tree

    shapes = tuple(tuple(np.shape(l)) for l in leaves)
    dtypes = tuple(str(np.asarray(jnp.result_type(l)).dtype)
                   if not hasattr(l, 'dtype') else str(l.dtype)
                   for l in leaves)

    packer, groups = _make_packer(treedef, shapes, dtypes)
    packed = jax.device_get(packer(tree))

    # Split host-side
    host_leaves = [None] * len(leaves)
    for dtype, idxs in groups.items():
        buf = np.asarray(packed[dtype])
        offset = 0
        for i in idxs:
            size = int(np.prod(shapes[i])) if shapes[i] else 1
            host_leaves[i] = buf[offset:offset + size].reshape(shapes[i])
            offset += size

    return jax.tree.unflatten(treedef, host_leaves)
