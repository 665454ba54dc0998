"""Golden tests for chamfer (nn_distance) and approxmatch EMD.

Test strategy mirrors the reference custom-op tests: tiny hand-made
point clouds with exact expected values, plus a dense-NumPy oracle
(ref: src/tf_ops/nn_distance/tf_nndistance_test.py:9-40,
tf_nndistance_cpu.py:5-26, approxmatch/tf_approxmatch_test.py:8-40).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monopsr_tpu.ops import chamfer, emd

RNG = np.random.RandomState(7)


def np_nn_distance(xyz1, xyz2):
    """Dense float64 oracle for bidirectional NN distances."""
    d = ((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2).sum(-1)
    return (d.min(2), d.argmin(2), d.min(1), d.argmin(1))


class TestChamfer:

    def test_identical_clouds_zero(self):
        pts = RNG.uniform(-1, 1, (2, 16, 3)).astype(np.float32)
        dist1, idx1, dist2, idx2 = chamfer.nn_distance(
            pts, pts)
        np.testing.assert_allclose(np.asarray(dist1), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dist2), 0.0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))

    def test_known_offset(self):
        xyz1 = np.zeros((1, 4, 3), np.float32)
        xyz2 = np.full((1, 5, 3), 0.5, np.float32)
        dist1, _, dist2, _ = chamfer.nn_distance(xyz1, xyz2)
        np.testing.assert_allclose(np.asarray(dist1), 0.75, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dist2), 0.75, atol=1e-6)

    def test_matches_dense_oracle(self):
        xyz1 = RNG.uniform(-3, 3, (3, 40, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-3, 3, (3, 56, 3)).astype(np.float32)
        got = chamfer.nn_distance(xyz1, xyz2)
        want = np_nn_distance(xyz1.astype(np.float64),
                              xyz2.astype(np.float64))
        np.testing.assert_allclose(np.asarray(got[0]), want[0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[2]), want[2],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[1]), want[1])
        np.testing.assert_array_equal(np.asarray(got[3]), want[3])

    def test_chunking_covers_remainder(self):
        # N not a multiple of the chunk exercises the padding path
        xyz1 = RNG.uniform(-3, 3, (2, 700, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-3, 3, (2, 33, 3)).astype(np.float32)
        got = chamfer.nn_distance(xyz1, xyz2)
        want = np_nn_distance(xyz1.astype(np.float64),
                              xyz2.astype(np.float64))
        np.testing.assert_allclose(np.asarray(got[0]), want[0],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got[2]), want[2],
                                   rtol=1e-4, atol=1e-4)

    def test_gradient_matches_finite_difference(self):
        xyz1 = RNG.uniform(-1, 1, (1, 6, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-1, 1, (1, 8, 3)).astype(np.float32)

        def loss(a, b):
            d1, _, d2, _ = chamfer.nn_distance(a, b)
            return jnp.sum(d1) + jnp.sum(d2)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(xyz1, xyz2)

        eps = 1e-3
        for (arr, grad, argn) in ((xyz1, g1, 0), (xyz2, g2, 1)):
            for trial in range(5):
                i = RNG.randint(arr.shape[1])
                k = RNG.randint(3)
                pert = arr.copy()
                pert[0, i, k] += eps
                if argn == 0:
                    plus = loss(pert, xyz2)
                    minus = loss(arr, xyz2)
                else:
                    plus = loss(xyz1, pert)
                    minus = loss(xyz1, arr)
                fd = (float(plus) - float(minus)) / eps
                assert abs(fd - float(grad[0, i, k])) < 2e-2, (
                    'grad mismatch at arg{} [{}, {}]'.format(argn, i, k))


class TestEMD:

    def test_identical_clouds_near_zero(self):
        pts = RNG.uniform(-1, 1, (2, 12, 3)).astype(np.float32)
        cost = emd.emd_distance(pts, pts)
        # The annealed plan nearly matches identity for identical clouds
        assert np.all(np.asarray(cost) < 1e-2)

    def test_known_translation_cost(self):
        # Clouds offset by a constant vector: EMD ~ n * |offset|
        n = 16
        xyz1 = RNG.uniform(-1, 1, (1, n, 3)).astype(np.float32)
        offset = np.array([3.0, 0.0, 0.0], np.float32)
        xyz2 = xyz1 + offset
        cost = float(np.asarray(emd.emd_distance(xyz1, xyz2))[0])
        assert abs(cost - n * 3.0) / (n * 3.0) < 0.15

    def test_matches_numpy_oracle(self):
        xyz1 = RNG.uniform(-2, 2, (2, 24, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-2, 2, (2, 24, 3)).astype(np.float32)
        match = np.asarray(emd.approx_match(xyz1, xyz2))
        cost = np.asarray(emd.match_cost(xyz1, xyz2, jnp.asarray(match)))

        for b in range(2):
            want_match = emd.np_approx_match(
                xyz1[b].astype(np.float64), xyz2[b].astype(np.float64))
            # Individual plan entries are fp32-sensitive through the
            # normalization cascade; the cost is the contract.
            np.testing.assert_allclose(match[b], want_match, atol=0.05)
            want_cost = emd.np_match_cost(
                xyz1[b].astype(np.float64), xyz2[b].astype(np.float64),
                want_match)
            np.testing.assert_allclose(cost[b], want_cost, rtol=2e-3)

    def test_unequal_sizes_match_cpu_oracle(self):
        """n != m clouds against a loop-faithful port of the reference's
        approxmatch_cpu (ref: tf_approxmatch.cpp:23-105), including its
        integer-division capacity factors (factorl = max(n,m)/n in C++
        int arithmetic, :25-26)."""

        def cpp_approxmatch(xyz1, xyz2):
            n, m = len(xyz1), len(xyz2)
            factorl = max(n, m) // n
            factorr = max(n, m) // m
            saturatedl = np.full(n, float(factorl))
            saturatedr = np.full(m, float(factorr))
            match = np.zeros((n, m))
            for j in range(8, -3, -1):
                level = 0.0 if j == -2 else -(4.0 ** j)
                weight = np.zeros((n, m))
                for k in range(n):
                    for l in range(m):
                        d2 = float(np.sum((xyz1[k] - xyz2[l]) ** 2))
                        weight[k, l] = np.exp(level * d2) * saturatedr[l]
                ss = np.full(m, 1e-9)
                for k in range(n):
                    s = 1e-9 + weight[k].sum()
                    weight[k] = weight[k] / s * saturatedl[k]
                    ss += weight[k]
                ss = np.minimum(saturatedr / ss, 1.0)
                ss2 = np.zeros(m)
                for k in range(n):
                    weight[k] *= ss
                    ss2 += weight[k]
                    saturatedl[k] = max(saturatedl[k] - weight[k].sum(),
                                        0.0)
                match += weight
                saturatedr = np.maximum(saturatedr - ss2, 0.0)
            return match

        def cpp_matchcost(xyz1, xyz2, match):
            d = np.sqrt(((xyz1[:, None, :] - xyz2[None, :, :]) ** 2
                         ).sum(-1))
            return float((match * d).sum())

        for (n, m) in ((3, 2), (5, 8), (64, 48)):
            xyz1 = RNG.uniform(-2, 2, (1, n, 3)).astype(np.float32)
            xyz2 = RNG.uniform(-2, 2, (1, m, 3)).astype(np.float32)
            got_match = np.asarray(emd.approx_match(xyz1, xyz2))[0]
            got_cost = float(np.asarray(
                emd.match_cost(xyz1, xyz2,
                               jnp.asarray(got_match[None])))[0])
            want_match = cpp_approxmatch(xyz1[0].astype(np.float64),
                                         xyz2[0].astype(np.float64))
            want_cost = cpp_matchcost(xyz1[0].astype(np.float64),
                                      xyz2[0].astype(np.float64),
                                      want_match)
            np.testing.assert_allclose(
                got_match, want_match, atol=0.02,
                err_msg='plan mismatch at n={} m={}'.format(n, m))
            np.testing.assert_allclose(
                got_cost, want_cost, rtol=5e-3,
                err_msg='cost mismatch at n={} m={}'.format(n, m))
            # np_approx_match (the vectorized oracle the other tests
            # lean on) must agree with the loop-faithful port too
            np.testing.assert_allclose(
                emd.np_approx_match(xyz1[0].astype(np.float64),
                                    xyz2[0].astype(np.float64)),
                want_match, atol=1e-9)

    def test_integer_capacity_factor_semantics(self):
        """n=3, m=2: int division gives factorl=1, factorr=1 (float
        division would give factorr=1.5) -> total plan mass is capped by
        the column capacity sum m*factorr = 2, not 3."""
        xyz = RNG.uniform(-0.1, 0.1, (1, 3, 3)).astype(np.float32)
        xyz2 = xyz[:, :2] + 0.05
        match = np.asarray(emd.approx_match(xyz, xyz2))[0]
        assert match.sum() < 2.0 + 1e-3
        assert match.sum() > 1.9

    def test_match_rows_sum_to_capacity(self):
        # Equal-size clouds: each row of the plan should assign ~1 unit
        xyz1 = RNG.uniform(-2, 2, (1, 20, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-2, 2, (1, 20, 3)).astype(np.float32)
        match = np.asarray(emd.approx_match(xyz1, xyz2))[0]
        np.testing.assert_allclose(match.sum(1), 1.0, atol=0.05)

    def test_cost_gradient_matches_finite_difference(self):
        xyz1 = RNG.uniform(-1, 1, (1, 8, 3)).astype(np.float32)
        xyz2 = RNG.uniform(-1, 1, (1, 8, 3)).astype(np.float32)
        match = emd.approx_match(xyz1, xyz2)

        def loss(a, b):
            return jnp.sum(emd.match_cost(a, b, match))

        g1, g2 = jax.grad(loss, argnums=(0, 1))(xyz1, xyz2)
        eps = 1e-3
        for (arr, grad, argn) in ((xyz1, g1, 0), (xyz2, g2, 1)):
            for trial in range(4):
                i = RNG.randint(arr.shape[1])
                k = RNG.randint(3)
                pert = arr.copy()
                pert[0, i, k] += eps
                if argn == 0:
                    fd = (float(loss(pert, xyz2)) -
                          float(loss(arr, xyz2))) / eps
                else:
                    fd = (float(loss(xyz1, pert)) -
                          float(loss(xyz1, arr))) / eps
                assert abs(fd - float(grad[0, i, k])) < 2e-2


def test_emd_cost_fused_matches_plan_path():
    """emd_cost_fused == match_cost(approx_match(...)) without ever
    materializing the plan (metric-mode fusion)."""
    rng = np.random.RandomState(3)
    xyz1 = rng.uniform(-2, 2, (3, 60, 3)).astype(np.float32)
    xyz2 = rng.uniform(-2, 2, (3, 52, 3)).astype(np.float32)
    match = emd.approx_match(xyz1, xyz2)
    want = np.asarray(emd.match_cost(xyz1, xyz2, match))
    got = np.asarray(emd.emd_cost_fused(xyz1, xyz2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_emd_cost_fused_no_gradient():
    xyz1 = np.ones((1, 8, 3), np.float32)
    xyz2 = np.zeros((1, 10, 3), np.float32)
    g = jax.grad(lambda a: emd.emd_cost_fused(a, xyz2).sum())(xyz1)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestEMDPallasKernel:
    """The VMEM-resident fused kernel (interpret mode on CPU; the real
    TPU lowering is benchmarked in scripts/bench_ops.py)."""

    def test_matches_xla_aligned_shapes(self):
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        xyz1 = rng.randn(2, 128, 3).astype(np.float32)
        xyz2 = (rng.randn(2, 128, 3) * 0.5 + 0.2).astype(np.float32)
        want = np.asarray(emd.emd_cost_fused(xyz1, xyz2,
                                             use_pallas=False))
        got = np.asarray(emd._emd_cost_fused_pallas(
            jnp.asarray(xyz1), jnp.asarray(xyz2), interpret=True))
        # f32 plan store at this size; only division-order differs
        np.testing.assert_allclose(got, want, rtol=5e-5)

    def test_rectangular_matches_oracle(self):
        import jax.numpy as jnp
        rng = np.random.RandomState(1)
        xyz1 = rng.randn(1, 256, 3).astype(np.float32)
        xyz2 = rng.randn(1, 128, 3).astype(np.float32)
        got = float(np.asarray(emd._emd_cost_fused_pallas(
            jnp.asarray(xyz1), jnp.asarray(xyz2), interpret=True))[0])
        match = emd.np_approx_match(xyz1[0].astype(np.float64),
                                    xyz2[0].astype(np.float64))
        want = emd.np_match_cost(xyz1[0].astype(np.float64),
                                 xyz2[0].astype(np.float64), match)
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_supported_shapes_gate(self):
        assert emd._pallas_emd_supported((2, 2304, 3), (2, 2304, 3))
        assert emd._pallas_emd_supported((1, 256, 3), (1, 128, 3))
        assert not emd._pallas_emd_supported((1, 60, 3), (1, 52, 3))

    def test_gate_rejects_vmem_overflow(self):
        # (3072, 3072): the bf16 plan alone is 18.9 MB > VMEM; the auto
        # path must fall back to the XLA ladder, not fail pallas_call.
        assert not emd._pallas_emd_supported((1, 3072, 3), (1, 3072, 3))
        assert not emd._pallas_emd_supported((1, 4096, 3), (1, 4096, 3))

    @pytest.mark.skipif(jax.default_backend() != 'tpu',
                        reason='real lowering needs TPU')
    def test_production_shape_tpu(self):
        rng = np.random.RandomState(2)
        xyz1 = rng.randn(2, 2304, 3).astype(np.float32)
        xyz2 = (rng.randn(2, 2304, 3) * 0.5).astype(np.float32)
        want = np.asarray(emd.emd_cost_fused(xyz1, xyz2,
                                             use_pallas=False))
        got = np.asarray(emd.emd_cost_fused(xyz1, xyz2,
                                            use_pallas=True))
        # bf16 plan store at this size: ~0.04% observed, 0.5% bound
        np.testing.assert_allclose(got, want, rtol=5e-3)


class TestEMDPallasLossPath:
    """The fused cost+gradient loss kernel (interpret mode on CPU)."""

    def _clouds(self, b=2, n=128, m=128, seed=3):
        rng = np.random.RandomState(seed)
        xyz1 = rng.randn(b, n, 3).astype(np.float32)
        xyz2 = (rng.randn(b, m, 3) * 0.6 + 0.1).astype(np.float32)
        return xyz1, xyz2

    def test_value_matches_xla_plan_path(self):
        import jax.numpy as jnp
        xyz1, xyz2 = self._clouds()
        want = np.asarray(emd.emd_distance(jnp.asarray(xyz1),
                                           jnp.asarray(xyz2),
                                           use_pallas=False))
        got = np.asarray(emd._emd_loss_pallas(
            jnp.asarray(xyz1), jnp.asarray(xyz2), interpret=True))
        np.testing.assert_allclose(got, want, rtol=5e-5)

    def _oracle_w(self, xyz1, xyz2):
        match = emd.np_approx_match(xyz1[0].astype(np.float64),
                                    xyz2[0].astype(np.float64))
        d2 = (((xyz1[0][:, None, :] - xyz2[0][None, :, :]) ** 2)
              .sum(-1))
        return match / np.sqrt(np.maximum(d2, 1e-20))

    def test_gradient_accumulators_match_oracle(self):
        """The kernel's four plan contractions vs exact f64 — this is
        the direct check of the per-round deferred-scale bookkeeping
        (assembled gradients add cancellation noise on top)."""
        import jax.numpy as jnp
        xyz1, xyz2 = self._clouds(b=1, n=256, m=128, seed=4)
        _, grow, gcol, gx2t, gx1t = emd._emd_loss_pallas_call(
            jnp.asarray(xyz1), jnp.asarray(xyz2), interpret=True)
        w = self._oracle_w(xyz1, xyz2)
        x1 = xyz1[0].astype(np.float64)
        x2 = xyz2[0].astype(np.float64)
        for got, want in (
                (grow[0], w.sum(1)), (gcol[0], w.sum(0)),
                (gx2t[0], (w @ x2).T), (gx1t[0], (w.T @ x1).T)):
            got = np.asarray(got)
            scale = np.abs(want).max()
            assert np.abs(got - want).max() / scale < 5e-3

    def test_gradient_envelope_vs_oracle(self):
        """Assembled gradients vs the f64 oracle. The col_scale =
        min(., 1) saturation branch makes BOTH f32 paths rounding-
        discontinuous (the XLA plan path itself reaches ~6e-2 on some
        seeds), so this pins an envelope, not exactness."""
        import jax.numpy as jnp
        dists = []
        for seed in (0, 1, 4):
            xyz1, xyz2 = self._clouds(b=1, n=128, m=128, seed=seed)

            def loss_pallas(a, b):
                return jnp.sum(emd._emd_loss_pallas(a, b,
                                                    interpret=True))

            g1p, g2p = jax.grad(loss_pallas, argnums=(0, 1))(
                jnp.asarray(xyz1), jnp.asarray(xyz2))
            w = self._oracle_w(xyz1, xyz2)
            x1 = xyz1[0].astype(np.float64)
            x2 = xyz2[0].astype(np.float64)
            g1o = x1 * w.sum(1)[:, None] - w @ x2
            g2o = x2 * w.sum(0)[:, None] - w.T @ x1
            for gp, go in ((g1p, g1o), (g2p, g2o)):
                dists.append(
                    np.abs(np.asarray(gp)[0] - go).max() /
                    np.abs(go).max())
        assert max(dists) < 2e-2, dists
        assert np.mean(dists) < 1e-2, dists

    def test_plan_carries_no_gradient_semantics(self):
        # emd_distance auto-path on CPU stays XLA; the pallas path is
        # explicitly requested here. Identical clouds: cost ~ 0 and the
        # gradient must be finite (the 1e-40 clamp guards dist -> 0).
        import jax.numpy as jnp
        rng = np.random.RandomState(6)
        xyz = rng.randn(1, 128, 3).astype(np.float32)

        def loss(a):
            return jnp.sum(emd._emd_loss_pallas(
                a, jnp.asarray(xyz), interpret=True))

        g = np.asarray(jax.grad(loss)(jnp.asarray(xyz)))
        assert np.all(np.isfinite(g))
