"""Approximate Earth Mover's Distance (auction-style approxmatch).

TPU-native replacement for the reference's custom CUDA ops
(ref: src/tf_ops/approxmatch/tf_approxmatch.cpp:23-105, CUDA twin
tf_approxmatch_g.cu, python wrapper tf_approxmatch.py:15-71).

The algorithm computes an approximate transport plan `match` between two
point clouds by 11 rounds (j = 8..-2) of temperature-annealed softmax
row/column normalization with saturation bookkeeping, then the cost
sum(match * |p - q|). The plan itself is non-differentiable
(ops.NoGradient('ApproxMatch') in the reference); the cost gradient flows
to both clouds through the fixed plan.

The fixed-iteration annealing loop maps directly onto XLA: each round is
an elementwise exp over the (N, M) distance matrix plus row/column
reductions. The batch is processed in a lax.map ladder so only
`batch_chunk` (N, M) matrices are live at once.
"""


import jax
import jax.numpy as jnp

_LEVELS = tuple(range(8, -3, -1))    # j = 8 .. -2, level = -4^j (0 at j=-2)


def _approx_match_single(xyz1, xyz2):
    """Transport plan for one pair: (N, 3), (M, 3) -> (N, M)."""
    n = xyz1.shape[0]
    m = xyz2.shape[0]

    factor_l = max(n, m) / n
    factor_r = max(n, m) / m

    # Squared pairwise distances. Clamp: the matmul form can dip a hair
    # below zero, and exp(-level * -eps) with level = -4^8 overflows.
    d = (jnp.sum(xyz1 * xyz1, axis=1, keepdims=True) +
         jnp.sum(xyz2 * xyz2, axis=1, keepdims=True).T -
         2.0 * xyz1 @ xyz2.T)
    d = jnp.maximum(d, 0.0)

    def round_body(carry, level):
        saturated_l, saturated_r, match = carry

        weight = jnp.exp(level * d) * saturated_r[None, :]

        # Row normalize to each source point's remaining capacity
        row_sum = jnp.sum(weight, axis=1, keepdims=True) + 1e-9
        weight = weight / row_sum * saturated_l[:, None]

        # Column saturation: scale columns so they don't exceed the
        # remaining sink capacity
        col_sum = jnp.sum(weight, axis=0) + 1e-9
        col_scale = jnp.minimum(saturated_r / col_sum, 1.0)
        weight = weight * col_scale[None, :]

        row_assigned = jnp.sum(weight, axis=1)
        col_assigned = jnp.sum(weight, axis=0)

        saturated_l = jnp.maximum(saturated_l - row_assigned, 0.0)
        saturated_r = jnp.maximum(saturated_r - col_assigned, 0.0)
        match = match + weight
        return (saturated_l, saturated_r, match), None

    levels = jnp.asarray(
        [0.0 if j == -2 else -(4.0 ** j) for j in _LEVELS], jnp.float32)

    init = (jnp.full((n,), factor_l, jnp.float32),
            jnp.full((m,), factor_r, jnp.float32),
            jnp.zeros((n, m), jnp.float32))
    (_, _, match), _ = jax.lax.scan(round_body, init, levels)
    return match


def approx_match(xyz1, xyz2, batch_chunk=4):
    """Batched approximate transport plans: (B, N, 3), (B, M, 3) -> (B, N, M).

    The plan carries no gradient (matching the reference's NoGradient).
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    match = jax.lax.map(
        lambda args: _approx_match_single(*args), (xyz1, xyz2),
        batch_size=min(batch_chunk, xyz1.shape[0]))
    return jax.lax.stop_gradient(match)


def _sq_dists_single(xyz1, xyz2):
    return (jnp.sum(xyz1 * xyz1, axis=1, keepdims=True) +
            jnp.sum(xyz2 * xyz2, axis=1, keepdims=True).T -
            2.0 * xyz1 @ xyz2.T)


def _match_cost_single(args):
    xyz1, xyz2, match = args
    d = jnp.sqrt(jnp.maximum(_sq_dists_single(xyz1, xyz2), 0.0))
    return jnp.sum(match * d)


def _match_cost_grad_single(args):
    """Memory-light per-sample gradient in matmul form.

    With W = match / max(|p - q|, eps):
        dcost/dxyz1 = xyz1 * rowsum(W) - W @ xyz2
        dcost/dxyz2 = xyz2 * colsum(W) - W^T @ xyz1
    (d|p - q|/dp = (p - q)/|p - q|, as in MatchCostGrad,
    ref: tf_approxmatch.cpp:106-160; only one (N, M) matrix is live.)
    """
    xyz1, xyz2, match = args
    d = jnp.sqrt(jnp.maximum(_sq_dists_single(xyz1, xyz2), 1e-40))
    w = match / d
    row = jnp.sum(w, axis=1, keepdims=True)
    col = jnp.sum(w, axis=0, keepdims=True)
    grad1 = xyz1 * row - w @ xyz2
    grad2 = xyz2 * col.T - w.T @ xyz1
    return grad1, grad2


def _match_cost_raw(xyz1, xyz2, match, batch_chunk=4):
    return jax.lax.map(
        _match_cost_single, (xyz1, xyz2, match),
        batch_size=min(batch_chunk, xyz1.shape[0]))


@jax.custom_vjp
def match_cost(xyz1, xyz2, match):
    """EMD cost through a fixed transport plan: (B,).

    Gradient flows to both clouds but not the plan
    (ref: tf_approxmatch.py:52-71, MatchCostGrad tf_approxmatch.cpp:106+).
    """
    return _match_cost_raw(xyz1, xyz2, match)


def _match_cost_fwd(xyz1, xyz2, match):
    return _match_cost_raw(xyz1, xyz2, match), (xyz1, xyz2, match)


def _match_cost_bwd(res, g):
    xyz1, xyz2, match = res
    grad1, grad2 = jax.lax.map(
        _match_cost_grad_single, (xyz1, xyz2, match),
        batch_size=min(4, xyz1.shape[0]))
    return (grad1 * g[:, None, None], grad2 * g[:, None, None], None)


match_cost.defvjp(_match_cost_fwd, _match_cost_bwd)


def emd_distance(xyz1, xyz2, batch_chunk=4):
    """Approximate EMD per batch element: (B,)."""
    match = approx_match(xyz1, xyz2, batch_chunk)
    return match_cost(xyz1, xyz2, match)


def _emd_cost_fused_single(xyz1, xyz2):
    """Annealing rounds accumulating the cost scalar directly.

    Identical round math to _approx_match_single, but the cumulative
    (N, M) plan is never materialized: each round's weight contributes
    sum(weight * dist) to a running scalar. Cuts the plan accumulator's
    read+write (2 x 21 MB x 11 rounds per sample at production shapes)
    and the full plan output from HBM traffic — the metric-mode EMD is
    memory-bound, so this roughly halves its cost (OPS_BENCH.json).
    """
    n = xyz1.shape[0]
    m = xyz2.shape[0]
    factor_l = max(n, m) / n
    factor_r = max(n, m) / m

    d = (jnp.sum(xyz1 * xyz1, axis=1, keepdims=True) +
         jnp.sum(xyz2 * xyz2, axis=1, keepdims=True).T -
         2.0 * xyz1 @ xyz2.T)
    d = jnp.maximum(d, 0.0)
    dist = jnp.sqrt(d)

    def round_body(carry, level):
        saturated_l, saturated_r, cost = carry
        weight = jnp.exp(level * d) * saturated_r[None, :]
        row_sum = jnp.sum(weight, axis=1, keepdims=True) + 1e-9
        weight = weight / row_sum * saturated_l[:, None]
        col_sum = jnp.sum(weight, axis=0) + 1e-9
        col_scale = jnp.minimum(saturated_r / col_sum, 1.0)
        weight = weight * col_scale[None, :]
        saturated_l = jnp.maximum(
            saturated_l - jnp.sum(weight, axis=1), 0.0)
        saturated_r = jnp.maximum(
            saturated_r - jnp.sum(weight, axis=0), 0.0)
        cost = cost + jnp.sum(weight * dist)
        return (saturated_l, saturated_r, cost), None

    levels = jnp.asarray(
        [0.0 if j == -2 else -(4.0 ** j) for j in _LEVELS], jnp.float32)
    init = (jnp.full((n,), factor_l, jnp.float32),
            jnp.full((m,), factor_r, jnp.float32),
            jnp.float32(0.0))
    (_, _, cost), _ = jax.lax.scan(round_body, init, levels)
    return cost


def emd_cost_fused(xyz1, xyz2, batch_chunk=4):
    """Metric-mode EMD: same value as match_cost(approx_match(...)) but
    without materializing the transport plan. Carries no gradient (use
    emd_distance for the loss path, which needs the plan for its VJP).
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    cost = jax.lax.map(
        lambda args: _emd_cost_fused_single(*args), (xyz1, xyz2),
        batch_size=min(batch_chunk, xyz1.shape[0]))
    return jax.lax.stop_gradient(cost)


# ---------------------------------------------------------------------------
# NumPy float64 oracle (direct transcription of the algorithm spec) for tests
# ---------------------------------------------------------------------------

def np_approx_match(xyz1, xyz2):
    """float64 oracle of the annealing loop for golden tests."""
    import numpy as np

    n, m = len(xyz1), len(xyz2)
    factor_l = max(n, m) / n
    factor_r = max(n, m) / m

    saturated_l = np.full(n, float(factor_l))
    saturated_r = np.full(m, float(factor_r))
    match = np.zeros((n, m))

    d = ((xyz1 ** 2).sum(1)[:, None] + (xyz2 ** 2).sum(1)[None, :] -
         2.0 * xyz1 @ xyz2.T)

    for j in _LEVELS:
        level = 0.0 if j == -2 else -(4.0 ** j)
        weight = np.exp(level * d) * saturated_r[None, :]
        row_sum = weight.sum(1, keepdims=True) + 1e-9
        weight = weight / row_sum * saturated_l[:, None]
        col_sum = weight.sum(0) + 1e-9
        weight = weight * np.minimum(saturated_r / col_sum, 1.0)[None, :]
        saturated_l = np.maximum(saturated_l - weight.sum(1), 0.0)
        saturated_r = np.maximum(saturated_r - weight.sum(0), 0.0)
        match += weight

    return match


def np_match_cost(xyz1, xyz2, match):
    import numpy as np
    d = np.sqrt(((xyz1[:, None, :] - xyz2[None, :, :]) ** 2).sum(-1))
    return float((match * d).sum())
