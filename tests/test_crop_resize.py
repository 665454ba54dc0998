"""Unit tests for the TF-semantics crop/resize gathers.

Oracles are naive NumPy implementations of the exact TF formulas:
crop_and_resize samples at y1*(H-1) + i*(y2-y1)*(H-1)/(crop-1) with
bilinear weights and 0 extrapolation; nearest align_corners uses
scale = (in-1)/(out-1) and round().
"""

import numpy as np

from monopsr_tpu.ops import crop_resize

RNG = np.random.RandomState(11)


def np_crop_and_resize(image, box, crop_size):
    """Naive (slow) oracle of TF crop_and_resize for one box."""
    h, w, c = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = box
    out = np.zeros((ch, cw, c), np.float64)
    for i in range(ch):
        in_y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ch - 1) \
            if ch > 1 else 0.5 * (y1 + y2) * (h - 1)
        if in_y < 0 or in_y > h - 1:
            continue
        for j in range(cw):
            in_x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (cw - 1) \
                if cw > 1 else 0.5 * (x1 + x2) * (w - 1)
            if in_x < 0 or in_x > w - 1:
                continue
            y0, x0 = int(np.floor(in_y)), int(np.floor(in_x))
            y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            wy, wx = in_y - y0, in_x - x0
            out[i, j] = (image[y0, x0] * (1 - wy) * (1 - wx) +
                         image[y0, x1i] * (1 - wy) * wx +
                         image[y1i, x0] * wy * (1 - wx) +
                         image[y1i, x1i] * wy * wx)
    return out


class TestCropAndResizeBilinear:

    def test_matches_oracle(self):
        image = RNG.uniform(0, 255, (40, 60, 3)).astype(np.float32)
        boxes = np.array([
            [0.1, 0.2, 0.6, 0.7],
            [0.0, 0.0, 1.0, 1.0],
            [-0.1, 0.5, 0.5, 1.2],    # partially out of range
        ], np.float32)
        got = np.asarray(crop_resize.crop_and_resize_bilinear(
            image, boxes, (8, 8)))
        for b in range(len(boxes)):
            want = np_crop_and_resize(image, boxes[b], (8, 8))
            np.testing.assert_allclose(got[b], want, rtol=1e-4,
                                       atol=1e-3)

    def test_identity_full_box(self):
        image = RNG.uniform(0, 1, (8, 8, 1)).astype(np.float32)
        box = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
        got = np.asarray(
            crop_resize.crop_and_resize_bilinear(image, box, (8, 8)))
        np.testing.assert_allclose(got[0], image, atol=1e-6)


class TestCropAndResizeNearest:

    def test_matches_tf_align_corners_formula(self):
        image = RNG.uniform(1, 9, (30, 50)).astype(np.float32)
        boxes = np.array([[3.2, 4.7, 19.8, 29.1],
                          [0.0, 0.0, 30.0, 50.0]], np.float32)
        roi = (12, 12)
        got = np.asarray(
            crop_resize.crop_and_resize_nearest(image, boxes, roi))
        for b, box in enumerate(boxes):
            y1, x1, y2, x2 = np.round(box).astype(int)
            ch, cw = max(y2 - y1, 1), max(x2 - x1, 1)
            for i in range(roi[0]):
                for j in range(roi[1]):
                    sy = y1 + int(round(i * (ch - 1) / (roi[0] - 1)))
                    sx = x1 + int(round(j * (cw - 1) / (roi[1] - 1)))
                    assert got[b, i, j] == image[min(sy, 29),
                                                 min(sx, 49)]

    def test_degenerate_box_single_pixel(self):
        image = np.arange(100, dtype=np.float32).reshape(10, 10)
        boxes = np.array([[4.0, 5.0, 4.0, 5.0]], np.float32)
        got = np.asarray(
            crop_resize.crop_and_resize_nearest(image, boxes, (4, 4)))
        np.testing.assert_allclose(got[0], image[4, 5])


class TestResizeBilinearAlignCorners:

    def test_endpoints_exact(self):
        images = RNG.uniform(0, 1, (2, 5, 7, 3)).astype(np.float32)
        out = np.asarray(crop_resize.resize_bilinear_align_corners(
            images, (9, 13)))
        # align_corners: corners map exactly
        np.testing.assert_allclose(out[:, 0, 0], images[:, 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(out[:, -1, -1], images[:, -1, -1],
                                   atol=1e-6)
        np.testing.assert_allclose(out[:, 0, -1], images[:, 0, -1],
                                   atol=1e-6)

    def test_linear_ramp_preserved(self):
        ramp = np.linspace(0, 1, 16, dtype=np.float32)
        image = np.tile(ramp[None, None, :, None], (1, 4, 1, 1))
        out = np.asarray(crop_resize.resize_bilinear_align_corners(
            image, (4, 31)))
        want = np.linspace(0, 1, 31)
        np.testing.assert_allclose(out[0, 0, :, 0], want, atol=1e-6)

    @staticmethod
    def _np_resize_align_corners(images, out_size):
        """Gather-formulation oracle: src = i * (in-1) / (out-1)."""
        n, h, w, c = images.shape
        oh, ow = out_size
        ys = np.linspace(0.0, h - 1, oh)
        xs = np.linspace(0.0, w - 1, ow)
        out = np.zeros((n, oh, ow, c), np.float64)
        for i, y in enumerate(ys):
            y0 = int(np.floor(y))
            y1 = min(y0 + 1, h - 1)
            wy = y - y0
            for j, x in enumerate(xs):
                x0 = int(np.floor(x))
                x1 = min(x0 + 1, w - 1)
                wx = x - x0
                out[:, i, j] = (images[:, y0, x0] * (1 - wy) * (1 - wx) +
                                images[:, y0, x1] * (1 - wy) * wx +
                                images[:, y1, x0] * wy * (1 - wx) +
                                images[:, y1, x1] * wy * wx)
        return out

    def test_downsample_matches_gather_oracle(self):
        # The production full-image path is a 2x downsample; the matmul
        # formulation must match the 4-corner-gather formula there too.
        images = RNG.uniform(0, 255, (2, 10, 26, 3)).astype(np.float32)
        for out_size in [(5, 13), (4, 9), (21, 7)]:
            got = np.asarray(crop_resize.resize_bilinear_align_corners(
                images, out_size))
            want = self._np_resize_align_corners(images, out_size)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_bf16_dtype_and_accuracy(self):
        import jax.numpy as jnp
        images = RNG.uniform(0, 1, (1, 8, 12, 2)).astype(np.float32)
        out = crop_resize.resize_bilinear_align_corners(
            jnp.asarray(images, jnp.bfloat16), (5, 7))
        assert out.dtype == jnp.bfloat16
        want = self._np_resize_align_corners(images, (5, 7))
        np.testing.assert_allclose(np.asarray(out, np.float32), want,
                                   rtol=0.02, atol=0.02)

    def test_grad_is_transposed_weights(self):
        # VJP of the resize is the transposed weight matmuls; the grad of
        # sum(out) wrt the input must equal the weight-matrix column sums.
        import jax
        import jax.numpy as jnp
        images = jnp.asarray(
            RNG.uniform(0, 1, (1, 6, 9, 1)).astype(np.float32))
        g = jax.grad(lambda im: jnp.sum(
            crop_resize.resize_bilinear_align_corners(im, (11, 5))))(images)
        # Each output pixel distributes weight 1 over its source corners,
        # so the grads sum to out_h*out_w per (image, channel).
        np.testing.assert_allclose(float(jnp.sum(g)), 11 * 5, rtol=1e-5)
        assert np.all(np.asarray(g) >= -1e-6)
