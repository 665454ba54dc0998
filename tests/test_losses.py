"""Unit tests for the loss primitives against hand-computed values.

The loss semantics are the reference's exact contracts
(ref: src/object_detection/core/losses.py:118-320,
src/monopsr/core/losses_custom.py:45-232).
"""

import numpy as np

from monopsr_tpu.models import losses


class TestHuber:

    def test_piecewise(self):
        x = np.array([-3.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
        got = np.asarray(losses.huber(x, delta=1.0))
        want = np.array([2.5, 0.5, 0.125, 0.0, 0.125, 0.5, 1.5])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_delta(self):
        # |x| = 3, delta = 2: 0.5*4 + 2*(3-2) = 4
        got = float(np.asarray(losses.huber(np.array(3.0), delta=2.0)))
        assert abs(got - 4.0) < 1e-6


class TestWeightedSmoothL1:

    def test_sums_over_code_dim(self):
        pred = np.zeros((1, 2, 3), np.float32)
        target = np.ones((1, 2, 3), np.float32) * 0.5
        weights = np.ones((1, 2, 1), np.float32)
        got = np.asarray(losses.weighted_smooth_l1(pred, target, weights))
        # per-elem huber(0.5) = 0.125, summed over 3 dims = 0.375
        np.testing.assert_allclose(got, 0.375, rtol=1e-6)
        assert got.shape == (1, 2)

    def test_elementwise_mask(self):
        pred = np.zeros((1, 1, 4), np.float32)
        target = np.ones((1, 1, 4), np.float32)
        weights = np.array([[[1.0, 0.0, 1.0, 0.0]]], np.float32)
        got = float(np.asarray(
            losses.weighted_smooth_l1(pred, target, weights))[0, 0])
        np.testing.assert_allclose(got, 1.0, rtol=1e-6)  # 2 * huber(1)


class TestSmoothL1Nonzero:

    def test_sum_by_nonzero_weights(self):
        pred = np.zeros((2, 2, 2, 3), np.float32)
        target = np.full((2, 2, 2, 3), 2.0, np.float32)
        weights = np.zeros((2, 2, 2, 1), np.float32)
        weights[0, 0, 0, 0] = 1.0   # one valid pixel -> 3 weighted elems
        got = float(np.asarray(
            losses.weighted_smooth_l1_nonzero(pred, target, weights)))
        # huber(2) = 1.5 per element; 3 elements counted, sum 4.5 / 3
        np.testing.assert_allclose(got, 1.5, rtol=1e-6)

    def test_all_zero_weights(self):
        pred = np.zeros((1, 2, 2, 3), np.float32)
        target = np.ones_like(pred)
        weights = np.zeros((1, 2, 2, 1), np.float32)
        got = float(np.asarray(
            losses.weighted_smooth_l1_nonzero(pred, target, weights)))
        assert got == 0.0


class TestSoftmaxCE:

    def test_uniform_logits(self):
        logits = np.zeros((1, 2, 4), np.float32)
        targets = np.eye(4, dtype=np.float32)[None, [0, 2]]
        weights = np.ones((1, 2, 1), np.float32)
        got = np.asarray(losses.weighted_softmax_ce(
            logits, targets, weights))
        np.testing.assert_allclose(got, np.log(4.0), rtol=1e-5)

    def test_logit_scale_sharpens(self):
        logits = np.array([[[2.0, 0.0, 0.0, 0.0]]], np.float32)
        targets = np.array([[[1.0, 0.0, 0.0, 0.0]]], np.float32)
        weights = np.ones((1, 1, 1), np.float32)
        base = float(np.asarray(losses.weighted_softmax_ce(
            logits, targets, weights)))
        temp = float(np.asarray(losses.weighted_softmax_ce(
            logits, targets, weights, logit_scale=0.5)))
        # Dividing logits by 0.5 doubles them -> lower CE on the target
        assert temp < base

    def test_label_smoothing_target_normalization(self):
        # The reference's smoothed one-hot: on = 1 - eps, off = eps / K
        eps = 0.001
        k = 12
        one_hot = np.eye(k)[2] * (1 - eps - eps / k) + eps / k
        assert abs(one_hot[2] - (1 - eps)) < 1e-9
        assert abs(one_hot[0] - eps / k) < 1e-9


class TestSigmoid:

    def test_sigmoid_ce_matches_formula(self):
        logits = np.array([-2.0, 0.0, 3.0], np.float32)
        targets = np.array([0.0, 0.5, 1.0], np.float32)
        got = np.asarray(losses.sigmoid_ce(logits, targets))
        want = (np.maximum(logits, 0) - logits * targets +
                np.log1p(np.exp(-np.abs(logits))))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # Cross-check one value against the direct definition
        p = 1 / (1 + np.exp(-3.0))
        np.testing.assert_allclose(got[2], -np.log(p), rtol=1e-5)

    def test_focal_downweights_easy(self):
        easy = np.array([[[5.0]]], np.float32)    # confident correct
        hard = np.array([[[-5.0]]], np.float32)   # confident wrong
        targets = np.ones((1, 1, 1), np.float32)
        w = np.ones((1, 1, 1), np.float32)
        l_easy = float(np.asarray(losses.sigmoid_focal(easy, targets, w)))
        l_hard = float(np.asarray(losses.sigmoid_focal(hard, targets, w)))
        assert l_hard > 100 * l_easy


class TestBerHu:

    def test_l1_below_threshold(self):
        pred = np.array([[0.0, 0.0]], np.float32)
        target = np.array([[0.1, 0.5]], np.float32)
        weights = np.ones_like(pred)
        # max|err| = 0.5 -> thresh 0.1; err 0.1 is L1; err 0.5 is L2 form
        got = float(np.asarray(
            losses.weighted_ber_hu(pred, target, weights)))
        want = (0.1 + (0.25 + 0.01) / 0.2) / 2
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestApplyLoss:

    def test_weight_multiplier(self):
        pred = np.zeros((1, 2, 3), np.float32)
        target = np.ones((1, 2, 3), np.float32)
        mask = np.ones((1, 2, 1), np.float32)
        unweighted = np.asarray(losses.apply_loss(
            ['smooth_l1', 1.0], pred, target, mask))
        weighted = np.asarray(losses.apply_loss(
            ['smooth_l1', 0.1], pred, target, mask))
        np.testing.assert_allclose(weighted, unweighted * 0.1, rtol=1e-6)

    def test_none_loss_type(self):
        pred = np.ones((2, 3), np.float32)
        out = np.asarray(losses.apply_loss(
            [None, 1.0], pred, pred, None))
        np.testing.assert_allclose(out, 0.0)
