"""Chamfer distance (nn_distance): bidirectional NN squared distances.

TPU-native replacement for the reference's custom CUDA op
(ref: src/tf_ops/nn_distance/tf_nndistance.cpp, tf_nndistance_g.cu,
python wrapper tf_nndistance.py:15-40). Returns, like the original:

    dist1: (B, N) squared distance from each point in xyz1 to its nearest
        neighbour in xyz2
    idx1:  (B, N) index of that neighbour
    dist2, idx2: the reverse direction

One implementation with a custom VJP (the handwritten CUDA gradient
becomes a gather/scatter-add expressed in XLA):

- `_nn_bidirectional_xla`: chunked |x|^2 + |y|^2 - 2 x.y^T computing the
  distance matrix ONCE per tile — rows reduce to direction 1, columns
  fold into a running min for direction 2; never materializes the full
  (N, M) matrix across the batch.

A hand-tiled Pallas twin of this op was built and benchmarked in round 2
and REMOVED in round 3: the op is a single fused matmul+reduce pass that
XLA already schedules optimally (the Pallas version measured ~0.77x,
OPS_BENCH r02). Pallas pays off where a multi-round loop re-uses the
(N, M) matrix — see ops/emd.py's fused kernel, which wins ~2x by holding
the whole annealing state in VMEM.
"""


import jax
import jax.numpy as jnp


def _pairwise_sq_dists(x_tile, y):
    """(T, 3) x (M, 3) -> (T, M) squared distances via the matmul trick."""
    x2 = jnp.sum(x_tile * x_tile, axis=-1, keepdims=True)      # (T, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T              # (1, M)
    xy = jax.lax.dot_general(
        x_tile, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return x2 + y2 - 2.0 * xy


# ---------------------------------------------------------------------------
# XLA implementation (works on any backend; used for CPU and as oracle)
# ---------------------------------------------------------------------------

# Coordinate for padded points: far enough that a padded row can never
# win a min against any real point, small enough that its squared
# distance (~3 * (2 * _FAR)^2) stays well inside float32.
_FAR = 1e9


def _nn_bidirectional_xla(xyz1, xyz2, chunk=512):
    """Both NN directions from ONE pass over the distance matrix.

    dist1/idx1 reduce each (chunk, M) tile over M; dist2/idx2 are a
    running elementwise min across tiles — the matrix is only computed
    once (the naive two-direction formulation doubles the matmul and
    distance-assembly work).
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]

    pad = (-n) % chunk
    if pad:
        # Padded points sit at _FAR so they never win a column min;
        # their row results are sliced away below.
        xyz1 = jnp.pad(xyz1, ((0, 0), (0, pad), (0, 0)),
                       constant_values=_FAR)
    num_chunks = xyz1.shape[1] // chunk

    def scan_body(carry, inp):
        best_d2, best_i2 = carry
        offset, x_chunk = inp                       # (B, chunk, 3)
        d = jax.vmap(_pairwise_sq_dists)(x_chunk, xyz2)  # (B, chunk, M)
        row = (jnp.min(d, axis=-1),
               jnp.argmin(d, axis=-1).astype(jnp.int32))
        col_d = jnp.min(d, axis=1)                  # (B, M)
        col_i = jnp.argmin(d, axis=1).astype(jnp.int32) + offset
        take = col_d < best_d2
        return (jnp.where(take, col_d, best_d2),
                jnp.where(take, col_i, best_i2)), row

    chunks = jnp.stack(
        jnp.split(xyz1, num_chunks, axis=1))        # (C, B, chunk, 3)
    offsets = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    init = (jnp.full((b, m), jnp.inf, jnp.float32),
            jnp.zeros((b, m), jnp.int32))
    (dist2, idx2), (dists, idxs) = jax.lax.scan(
        scan_body, init, (offsets, chunks))
    dist1 = jnp.concatenate(jnp.unstack(dists), axis=1)[:, :n]
    idx1 = jnp.concatenate(jnp.unstack(idxs), axis=1)[:, :n]
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _nn_distance(xyz1, xyz2):
    return _nn_bidirectional_xla(xyz1, xyz2)


def _nn_distance_fwd(xyz1, xyz2):
    out = _nn_bidirectional_xla(xyz1, xyz2)
    dist1, idx1, dist2, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _nn_distance_bwd(res, grads):
    """Gradient through the argmin pairing.

    d(|x - y_i*|^2)/dx = 2 (x - y_i*); the matched point receives the
    negated contribution (scatter-add), mirroring NnDistanceGrad
    (ref: tf_nndistance_g.cu:132-160) via XLA gather/scatter.
    """
    xyz1, xyz2, idx1, idx2 = res
    g_dist1, _, g_dist2, _ = grads

    matched2 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)
    diff1 = 2.0 * (xyz1 - matched2) * g_dist1[..., None]

    matched1 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)
    diff2 = 2.0 * (xyz2 - matched1) * g_dist2[..., None]

    def scatter_neg(target_like, idx, diff):
        return jnp.zeros_like(target_like).at[
            jnp.arange(target_like.shape[0])[:, None], idx].add(-diff)

    grad1 = diff1 + scatter_neg(xyz1, idx2, diff2)
    grad2 = diff2 + scatter_neg(xyz2, idx1, diff1)
    return grad1, grad2


_nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_distance(xyz1, xyz2):
    """Bidirectional nearest-neighbour squared distances.

    Args:
        xyz1: (B, N, 3) point clouds.
        xyz2: (B, M, 3) point clouds.

    Returns:
        (dist1, idx1, dist2, idx2) as in the reference op.
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    return _nn_distance(xyz1, xyz2)


def chamfer_distance(xyz1, xyz2):
    """Summed bidirectional chamfer distance per batch element: (B,)."""
    dist1, _, dist2, _ = nn_distance(xyz1, xyz2)
    return jnp.sum(dist1, axis=1) + jnp.sum(dist2, axis=1)
