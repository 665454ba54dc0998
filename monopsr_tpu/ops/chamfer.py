"""Chamfer distance (nn_distance): bidirectional NN squared distances.

TPU-native replacement for the reference's custom CUDA op
(ref: src/tf_ops/nn_distance/tf_nndistance.cpp, tf_nndistance_g.cu,
python wrapper tf_nndistance.py:15-40). Returns, like the original:

    dist1: (B, N) squared distance from each point in xyz1 to its nearest
        neighbour in xyz2
    idx1:  (B, N) index of that neighbour
    dist2, idx2: the reverse direction

Two implementations share a custom VJP (the handwritten CUDA gradient
becomes a gather/scatter-add expressed in XLA):

- `_nn_bidirectional_xla`: chunked |x|^2 + |y|^2 - 2 x.y^T computing the
  distance matrix ONCE per tile — rows reduce to direction 1, columns
  fold into a running min for direction 2; never materializes the full
  (N, M) matrix across the batch.
- `_nn_bidirectional_pallas`: the same single-pass-per-tile scheme as a
  Pallas TPU kernel, tiling through VMEM with the matmul on the MXU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_TILE_N = 256      # x columns per inner step
_BATCH_BLOCK = 8   # batch rows per program (sublane-aligned output blocks)


def _make_nn_bidirectional_kernel(n_tiles):
    def kernel(x_ref, y_ref, d1_ref, i1_ref, d2_ref, i2_ref):
        """One program: _BATCH_BLOCK batch rows, BOTH directions.

        Each (TILE_N, M) distance tile is computed once; rows reduce to
        dist1/idx1 for that x tile, columns fold into a running
        elementwise min for dist2/idx2 — halving the matmul + distance
        assembly work of a two-pass formulation.

        Layout note: point clouds arrive transposed as (BB, 3, N) so the
        point axis sits on the 128-lane dimension; an (N, 3) block would
        be lane-padded 3 -> 128 (43x VMEM waste, ~18MB > the 16MB limit
        at production shapes).

        x_ref: (BB, 3, Np), y_ref: (BB, 3, M) VMEM;
        d1_ref/i1_ref: (BB, Np), d2_ref/i2_ref: (BB, M) outputs. The
        (batch, x-tile) space is walked with an inner loop so the live
        distance tile stays at (TILE_N, M).
        """
        def body(step, _):
            bi = step // n_tiles
            ti = step % n_tiles
            x = x_ref[bi, :, pl.ds(ti * _TILE_N, _TILE_N)]   # (3, T)
            y = y_ref[bi]                                     # (3, M)
            x2 = jnp.sum(x * x, axis=0)[:, None]              # (T, 1)
            y2 = jnp.sum(y * y, axis=0)[None, :]              # (1, M)
            xy = jax.lax.dot_general(
                x, y, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (T, M)
            d = x2 + y2 - 2.0 * xy
            d1_ref[bi, pl.ds(ti * _TILE_N, _TILE_N)] = jnp.min(d, axis=-1)
            i1_ref[bi, pl.ds(ti * _TILE_N, _TILE_N)] = (
                jnp.argmin(d, axis=-1).astype(jnp.int32))

            col_d = jnp.min(d, axis=0)                        # (M,)
            col_i = (jnp.argmin(d, axis=0).astype(jnp.int32)
                     + ti * _TILE_N)

            @pl.when(ti == 0)
            def _init():
                d2_ref[bi] = col_d
                i2_ref[bi] = col_i

            @pl.when(ti != 0)
            def _fold():
                prev_d = d2_ref[bi]
                take = col_d < prev_d
                d2_ref[bi] = jnp.where(take, col_d, prev_d)
                i2_ref[bi] = jnp.where(take, col_i, i2_ref[bi])

            return 0

        jax.lax.fori_loop(0, _BATCH_BLOCK * n_tiles, body, 0)

    return kernel


def _nn_bidirectional_pallas(xyz1, xyz2):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]

    pad_n = (-n) % _TILE_N
    pad_b = (-b) % _BATCH_BLOCK
    if pad_n or pad_b:
        # Padded x points sit at _FAR so they never win a column min
        # (their own rows are sliced away); padded batch rows are fully
        # sliced away.
        xyz1 = jnp.pad(xyz1, ((0, pad_b), (0, pad_n), (0, 0)),
                       constant_values=_FAR)
        xyz2 = jnp.pad(xyz2, ((0, pad_b), (0, 0), (0, 0)))
    bp, np_, _ = xyz1.shape
    n_tiles = np_ // _TILE_N

    # Lane-friendly layout: (B, 3, N)
    xa_t = jnp.transpose(xyz1, (0, 2, 1))
    xb_t = jnp.transpose(xyz2, (0, 2, 1))

    grid = (bp // _BATCH_BLOCK,)
    dist1, idx1, dist2, idx2 = pl.pallas_call(
        _make_nn_bidirectional_kernel(n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BATCH_BLOCK, 3, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH_BLOCK, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BATCH_BLOCK, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH_BLOCK, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH_BLOCK, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH_BLOCK, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, np_), jnp.float32),
            jax.ShapeDtypeStruct((bp, np_), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.float32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * m * 4,
            bytes_accessed=bp * (np_ + m) * 3 * 4 + bp * (np_ + m) * 8,
            transcendentals=0),
    )(xa_t, xb_t)
    return dist1[:b, :n], idx1[:b, :n], dist2[:b, :m], idx2[:b, :m]


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

def _forward(xyz1, xyz2, use_pallas):
    if use_pallas:
        return _nn_bidirectional_pallas(xyz1, xyz2)
    return _nn_bidirectional_xla(xyz1, xyz2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nn_distance(xyz1, xyz2, use_pallas):
    return _forward(xyz1, xyz2, use_pallas)


def _nn_distance_fwd(xyz1, xyz2, use_pallas):
    out = _forward(xyz1, xyz2, use_pallas)
    dist1, idx1, dist2, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _nn_distance_bwd(use_pallas, res, grads):
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


def nn_distance(xyz1, xyz2, use_pallas=None):
    """Bidirectional nearest-neighbour squared distances.

    Args:
        xyz1: (B, N, 3) point clouds.
        xyz2: (B, M, 3) point clouds.
        use_pallas: force the Pallas kernel on/off. Default is the XLA
            formulation on every backend: at production shapes the op is
            VPU-reduction-bound and XLA's fused min/argmin measures
            ~20% faster than the hand-tiled kernel (OPS_BENCH.json);
            the Pallas kernel is kept as the explicit-control path.

    Returns:
        (dist1, idx1, dist2, idx2) as in the reference op.
    """
    if use_pallas is None:
        use_pallas = False
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    return _nn_distance(xyz1, xyz2, use_pallas)


def chamfer_distance(xyz1, xyz2, use_pallas=None):
    """Summed bidirectional chamfer distance per batch element: (B,)."""
    dist1, _, dist2, _ = nn_distance(xyz1, xyz2, use_pallas)
    return jnp.sum(dist1, axis=1) + jnp.sum(dist2, axis=1)
