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

    # Integer-division capacity factors match the reference exactly
    # (C++ int division at ref: tf_approxmatch.cpp:25-26); divergent from
    # float division only when neither n nor m divides the other.
    factor_l = max(n, m) // n
    factor_r = max(n, m) // m

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
    # Clamp must stay in the f32 NORMAL range: a subnormal floor (e.g.
    # 1e-40) is flushed to zero on TPU/FTZ, making w = match / 0 = inf
    # and 0 * inf = NaN for coincident points.
    d = jnp.sqrt(jnp.maximum(_sq_dists_single(xyz1, xyz2), 1e-20))
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


def emd_distance(xyz1, xyz2, batch_chunk=4, use_pallas=None):
    """Approximate EMD per batch element: (B,). Differentiable in both
    clouds through the (stop-gradient) transport plan.

    use_pallas: None = auto (on TPU at supported shapes the VMEM-
    resident loss kernel computes the cost and the plan-contracted
    gradient accumulators in ONE annealing sweep — the (N, M) plan
    never reaches HBM in either the forward or the backward; see
    _emd_loss_kernel). Otherwise the XLA ladder materializes the plan
    (approx_match) and runs the matmul-form VJP through it.
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == 'tpu' and
                      _pallas_emd_supported(xyz1.shape, xyz2.shape))
    if use_pallas:
        return _emd_loss_pallas(xyz1, xyz2)
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
    # Integer-division capacity factors match the reference exactly
    # (C++ int division at ref: tf_approxmatch.cpp:25-26); divergent from
    # float division only when neither n nor m divides the other.
    factor_l = max(n, m) // n
    factor_r = max(n, m) // m

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


def emd_cost_fused(xyz1, xyz2, batch_chunk=4, use_pallas=None):
    """Metric-mode EMD: same value as match_cost(approx_match(...)) but
    without materializing the transport plan. Carries no gradient (use
    emd_distance for the loss path, which needs the plan for its VJP).

    use_pallas: None = auto (VMEM-resident Pallas kernel on TPU when the
    shapes allow it; XLA ladder otherwise). The XLA scan re-streams the
    (N, M) distance matrix from HBM every one of the 11 rounds; the
    kernel recomputes distance tiles on the MXU from the (3, N) point
    clouds and keeps the whole round state (plan tile, saturation
    vectors, cost) in VMEM — zero HBM traffic inside the annealing loop.
    """
    xyz1 = jnp.asarray(xyz1, jnp.float32)
    xyz2 = jnp.asarray(xyz2, jnp.float32)
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == 'tpu' and
                      _pallas_emd_supported(xyz1.shape, xyz2.shape))
    if use_pallas:
        cost = _emd_cost_fused_pallas(xyz1, xyz2)
    else:
        cost = jax.lax.map(
            lambda args: _emd_cost_fused_single(*args), (xyz1, xyz2),
            batch_size=min(batch_chunk, xyz1.shape[0]))
    return jax.lax.stop_gradient(cost)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: fully VMEM-resident annealing loop
# ---------------------------------------------------------------------------

_EMD_TILE = 128          # rows of the distance tile computed per step
# Store the per-round plan in bf16 when the f32 buffer would not fit in
# VMEM (~16 MB/core). At the production (2304, 2304) shape the bf16 plan
# is 10.6 MB; the bf16 mantissa costs ~0.1% on the cost metric
# (tests/test_ops.py pins the tolerance).
_EMD_F32_BUF_LIMIT = 9 * 1024 * 1024


# Upper bound on the kernel's resident VMEM: the (n, m) plan scratch
# (bf16 above the f32 limit) plus the (tile, m) round working set must
# fit in the ~16 MB/core budget. The production (2304, 2304) case sits
# at ~14.1 MB (10.6 MB bf16 plan + ~3.5 MB working rows) and is known
# to fit; (3072, 3072) (18.9 MB plan alone) must fall back to the XLA
# ladder instead of failing pallas_call.
_EMD_VMEM_BUDGET = 15 * 1024 * 1024


def _pallas_emd_supported(shape1, shape2):
    n, m = shape1[1], shape2[1]
    if not (shape1[2] == 3 and shape2[2] == 3 and
            n % _EMD_TILE == 0 and m % 128 == 0):
        return False
    plan_bytes = n * m * (4 if n * m * 4 <= _EMD_F32_BUF_LIMIT else 2)
    working_bytes = min(_EMD_TILE, n) * m * 4 * 3
    return plan_bytes + working_bytes <= _EMD_VMEM_BUDGET


def _emd_fused_kernel(n, m, store_dtype):
    """Builds the per-sample kernel body for static (n, m).

    Measured (v5e, 32x2304x2304): bf16 transcendentals are NOT faster
    than f32 on the VPU (15.4 vs 15.1 ms), so the elementwise chain
    stays f32; only the plan buffer narrows to bf16 when f32 won't fit
    in VMEM.
    """
    from jax.experimental import pallas as pl

    tile = min(_EMD_TILE, n)
    n_tiles = n // tile
    # Integer-division capacity factors match the reference exactly
    # (C++ int division at ref: tf_approxmatch.cpp:25-26); divergent from
    # float division only when neither n nor m divides the other.
    factor_l = max(n, m) // n
    factor_r = max(n, m) // m
    levels = [0.0 if j == -2 else -(4.0 ** j) for j in _LEVELS]

    def kernel(x1t_ref, x2t_ref, cost_ref, w_ref, sat_l_ref, sat_r_ref,
               col_ref, cdist_ref, scale_ref):
        sample = pl.program_id(0)
        x2t = x2t_ref[0]                                   # (3, m)
        n2 = jnp.sum(x2t * x2t, axis=0, keepdims=True)     # (1, m)

        sat_l_ref[:] = jnp.full((n, 1), factor_l, jnp.float32)
        sat_r_ref[:] = jnp.full((1, m), factor_r, jnp.float32)
        cost_ref[sample, 0] = 0.0

        for round_idx, level in enumerate(levels):
            col_ref[:] = jnp.zeros((1, m), jnp.float32)
            cdist_ref[:] = jnp.zeros((1, m), jnp.float32)
            first_round = round_idx == 0

            # One traversal per round: the previous round's column
            # scaling is applied to the stored plan tile here (updating
            # sat_l) right before the tile's new weights are computed —
            # no separate second sweep over the plan buffer.
            def pass_a(i, _):
                rows = pl.ds(i * tile, tile)
                sat_l_tile = sat_l_ref[rows, :]            # (tile, 1)
                if not first_round:
                    w_prev = w_ref[rows, :].astype(jnp.float32)
                    row_assigned = jnp.sum(
                        w_prev * scale_ref[:], axis=1, keepdims=True)
                    sat_l_tile = jnp.maximum(
                        sat_l_tile - row_assigned, 0.0)
                    sat_l_ref[rows, :] = sat_l_tile

                x1 = x1t_ref[0, :, pl.ds(i * tile, tile)]  # (3, tile)
                n1 = jnp.sum(x1 * x1, axis=0)[:, None]     # (tile, 1)
                d = n1 + n2 - 2.0 * jax.lax.dot_general(
                    x1, x2t, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (tile, m)
                d = jnp.maximum(d, 0.0)

                if level == 0.0:
                    # Final round: exp(0) == 1 — no transcendental
                    w = jnp.broadcast_to(sat_r_ref[:], d.shape)
                else:
                    w = jnp.exp(level * d) * sat_r_ref[:]
                row_sum = jnp.sum(w, axis=1, keepdims=True) + 1e-9
                # Per-row scale (tile divides), then one elementwise
                # mul — not 5M elementwise divides
                w = w * (sat_l_tile / row_sum)
                w_stored = w.astype(store_dtype)
                w_ref[rows, :] = w_stored
                # All later math uses the stored (possibly rounded)
                # plan so the kernel is self-consistent
                wf = w_stored.astype(jnp.float32)
                col_ref[:] += jnp.sum(wf, axis=0, keepdims=True)
                # sqrt is the single most expensive elementwise op here
                # (~3 ms of the 11 ms kernel at (32, 2304, 2304)), but
                # measured alternatives lose: d*rsqrt(d+eps) 1.8x slower
                # (3 ops), exp(0.5*log(d+eps)) ~equal with added eps
                # error — plain hardware sqrt wins
                cdist_ref[:] += jnp.sum(wf * jnp.sqrt(d), axis=0,
                                        keepdims=True)
                return 0

            jax.lax.fori_loop(0, n_tiles, pass_a, 0)

            col_scale = jnp.minimum(
                sat_r_ref[:] / (col_ref[:] + 1e-9), 1.0)   # (1, m)
            cost_ref[sample, 0] += jnp.sum(col_scale * cdist_ref[:])
            sat_r_ref[:] = jnp.maximum(
                sat_r_ref[:] - col_scale * col_ref[:], 0.0)
            scale_ref[:] = col_scale
            # After the last round sat_l is never read again, so the
            # deferred application of the final col_scale is dropped.

    return kernel


def _emd_cost_fused_pallas(xyz1, xyz2, interpret=False):
    """(B, N, 3) x (B, M, 3) -> (B,) via the VMEM-resident kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    store_dtype = (jnp.float32 if n * m * 4 <= _EMD_F32_BUF_LIMIT
                   else jnp.bfloat16)
    kernel = _emd_fused_kernel(n, m, store_dtype)

    # (B, 3, N): points on the 128-lane axis (a (N, 3) block would pad
    # the 3-wide lane dimension to 128)
    x1t = jnp.transpose(xyz1, (0, 2, 1))
    x2t = jnp.transpose(xyz2, (0, 2, 1))

    cost = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # One full-array SMEM block revisited by every grid step; the
        # kernel writes its own row (blocked (1, 1) outputs violate the
        # TPU (8, 128) tiling rule)
        out_specs=pl.BlockSpec((b, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, m), store_dtype),       # per-round plan
            pltpu.VMEM((n, 1), jnp.float32),       # sat_l
            pltpu.VMEM((1, m), jnp.float32),       # sat_r
            pltpu.VMEM((1, m), jnp.float32),       # col accumulator
            pltpu.VMEM((1, m), jnp.float32),       # cost-per-col acc
            pltpu.VMEM((1, m), jnp.float32),       # deferred col_scale
        ],
        interpret=interpret,
    )(x1t, x2t)
    return cost[:, 0]


# ---------------------------------------------------------------------------
# Pallas TPU loss kernel: cost + gradient accumulators, one VMEM sweep
# ---------------------------------------------------------------------------

def _emd_loss_kernel(n, m, store_dtype):
    """Kernel body computing the EMD cost AND the plan-contracted
    gradient accumulators in the same annealing sweep.

    The matmul-form VJP (ref: MatchCostGrad, tf_approxmatch.cpp:106-160)
    needs four contractions of W = match / dist:
        grow = rowsum(W)         gx2t = (W @ xyz2)^T
        gcol = colsum(W)         gx1t = (W^T @ xyz1)^T
    All four are linear in the plan, so each round's contribution is
    accumulated tile-by-tile as soon as that round's column scaling is
    known (one round deferred, like the cost kernel's sat_l update),
    plus one final sweep for the last round. The cumulative (N, M) plan
    never exists anywhere — not even in VMEM.
    """
    from jax.experimental import pallas as pl

    tile = min(_EMD_TILE, n)
    n_tiles = n // tile
    # Integer-division capacity factors match the reference exactly
    # (C++ int division at ref: tf_approxmatch.cpp:25-26); divergent from
    # float division only when neither n nor m divides the other.
    factor_l = max(n, m) // n
    factor_r = max(n, m) // m
    levels = [0.0 if j == -2 else -(4.0 ** j) for j in _LEVELS]

    def kernel(x1t_ref, x2t_ref, cost_ref, grow_ref, gcol_ref,
               gx2t_ref, gx1t_ref, w_ref, sat_l_ref, sat_r_ref,
               col_ref, cdist_ref, scale_ref):
        sample = pl.program_id(0)
        x2t = x2t_ref[0]                                   # (3, m)
        n2 = jnp.sum(x2t * x2t, axis=0, keepdims=True)     # (1, m)

        sat_l_ref[:] = jnp.full((n, 1), factor_l, jnp.float32)
        sat_r_ref[:] = jnp.full((1, m), factor_r, jnp.float32)
        cost_ref[sample, 0] = 0.0
        grow_ref[0] = jnp.zeros((1, n), jnp.float32)
        gcol_ref[0] = jnp.zeros((1, m), jnp.float32)
        gx2t_ref[0] = jnp.zeros((3, n), jnp.float32)
        gx1t_ref[0] = jnp.zeros((3, m), jnp.float32)

        def tile_dist(i):
            x1 = x1t_ref[0, :, pl.ds(i * tile, tile)]      # (3, tile)
            n1 = jnp.sum(x1 * x1, axis=0)[:, None]         # (tile, 1)
            d = n1 + n2 - 2.0 * jax.lax.dot_general(
                x1, x2t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (tile, m)
            return x1, jnp.maximum(d, 0.0)

        def accumulate_grads(i, x1, d, w_scaled):
            """Adds one tile's W-contribution (w_scaled / dist)."""
            rows = pl.ds(i * tile, tile)
            # 1e-20 floor: must be a NORMAL f32 (subnormals flush to 0
            # under FTZ -> rsqrt(0) = inf -> 0 * inf = NaN)
            wq = w_scaled * jax.lax.rsqrt(jnp.maximum(d, 1e-20))
            grow_ref[0, :, rows] += jnp.sum(wq, axis=1)[None, :]
            gcol_ref[0] += jnp.sum(wq, axis=0, keepdims=True)
            gx2t_ref[0, :, rows] += jax.lax.dot_general(
                x2t, wq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (3, tile)
            gx1t_ref[0] += jax.lax.dot_general(
                x1, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (3, m)

        for round_idx, level in enumerate(levels):
            col_ref[:] = jnp.zeros((1, m), jnp.float32)
            cdist_ref[:] = jnp.zeros((1, m), jnp.float32)
            first_round = round_idx == 0

            def pass_a(i, _):
                rows = pl.ds(i * tile, tile)
                x1, d = tile_dist(i)
                sat_l_tile = sat_l_ref[rows, :]            # (tile, 1)
                if not first_round:
                    w_prev = w_ref[rows, :].astype(jnp.float32)
                    w_scaled = w_prev * scale_ref[:]
                    sat_l_tile = jnp.maximum(
                        sat_l_tile -
                        jnp.sum(w_scaled, axis=1, keepdims=True), 0.0)
                    sat_l_ref[rows, :] = sat_l_tile
                    accumulate_grads(i, x1, d, w_scaled)

                if level == 0.0:
                    w = jnp.broadcast_to(sat_r_ref[:], d.shape)
                else:
                    w = jnp.exp(level * d) * sat_r_ref[:]
                row_sum = jnp.sum(w, axis=1, keepdims=True) + 1e-9
                w = w * (sat_l_tile / row_sum)
                w_stored = w.astype(store_dtype)
                w_ref[rows, :] = w_stored
                wf = w_stored.astype(jnp.float32)
                col_ref[:] += jnp.sum(wf, axis=0, keepdims=True)
                cdist_ref[:] += jnp.sum(wf * jnp.sqrt(d), axis=0,
                                        keepdims=True)
                return 0

            jax.lax.fori_loop(0, n_tiles, pass_a, 0)

            col_scale = jnp.minimum(
                sat_r_ref[:] / (col_ref[:] + 1e-9), 1.0)   # (1, m)
            cost_ref[sample, 0] += jnp.sum(col_scale * cdist_ref[:])
            sat_r_ref[:] = jnp.maximum(
                sat_r_ref[:] - col_scale * col_ref[:], 0.0)
            scale_ref[:] = col_scale

        # Final sweep: the last round's deferred contribution
        def pass_final(i, _):
            rows = pl.ds(i * tile, tile)
            x1, d = tile_dist(i)
            w_scaled = w_ref[rows, :].astype(jnp.float32) * scale_ref[:]
            accumulate_grads(i, x1, d, w_scaled)
            return 0

        jax.lax.fori_loop(0, n_tiles, pass_final, 0)

    return kernel


def _emd_loss_pallas_call(xyz1, xyz2, interpret=False):
    """(B, N, 3) x (B, M, 3) -> (cost (B,), grow (B, N), gcol (B, M),
    gx2t (B, 3, N), gx1t (B, 3, M))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    store_dtype = (jnp.float32 if n * m * 4 <= _EMD_F32_BUF_LIMIT
                   else jnp.bfloat16)
    kernel = _emd_loss_kernel(n, m, store_dtype)

    x1t = jnp.transpose(xyz1, (0, 2, 1))
    x2t = jnp.transpose(xyz2, (0, 2, 1))

    cost, grow, gcol, gx2t, gx1t = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, m), store_dtype),       # per-round plan
            pltpu.VMEM((n, 1), jnp.float32),       # sat_l
            pltpu.VMEM((1, m), jnp.float32),       # sat_r
            pltpu.VMEM((1, m), jnp.float32),       # col accumulator
            pltpu.VMEM((1, m), jnp.float32),       # cost-per-col acc
            pltpu.VMEM((1, m), jnp.float32),       # deferred col_scale
        ],
        interpret=interpret,
    )(x1t, x2t)
    return (cost[:, 0], grow[:, 0, :], gcol[:, 0, :], gx2t, gx1t)


def _emd_loss_pallas_impl(xyz1, xyz2, interpret):
    return _emd_loss_pallas_call(xyz1, xyz2, interpret)[0]


def _emd_loss_fwd(xyz1, xyz2, interpret):
    cost, grow, gcol, gx2t, gx1t = _emd_loss_pallas_call(
        xyz1, xyz2, interpret)
    return cost, (xyz1, xyz2, grow, gcol, gx2t, gx1t)


def _emd_loss_bwd(interpret, res, g):
    xyz1, xyz2, grow, gcol, gx2t, gx1t = res
    grad1 = xyz1 * grow[..., None] - jnp.transpose(gx2t, (0, 2, 1))
    grad2 = xyz2 * gcol[..., None] - jnp.transpose(gx1t, (0, 2, 1))
    return grad1 * g[:, None, None], grad2 * g[:, None, None]


_emd_loss_pallas_vjp = jax.custom_vjp(_emd_loss_pallas_impl,
                                      nondiff_argnums=(2,))
_emd_loss_pallas_vjp.defvjp(_emd_loss_fwd, _emd_loss_bwd)


def _emd_loss_pallas(xyz1, xyz2, interpret=False):
    """Differentiable EMD via the fused cost+grad kernel: (B,)."""
    return _emd_loss_pallas_vjp(xyz1, xyz2, interpret)


# ---------------------------------------------------------------------------
# NumPy float64 oracle (direct transcription of the algorithm spec) for tests
# ---------------------------------------------------------------------------

def np_approx_match(xyz1, xyz2):
    """float64 oracle of the annealing loop for golden tests."""
    import numpy as np

    n, m = len(xyz1), len(xyz2)
    # Integer-division capacity factors match the reference exactly
    # (C++ int division at ref: tf_approxmatch.cpp:25-26); divergent from
    # float division only when neither n nor m divides the other.
    factor_l = max(n, m) // n
    factor_r = max(n, m) // m

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
