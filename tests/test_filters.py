"""Filter parity vs cv2."""

import cv2
import pytest
import numpy as np
import jax.numpy as jnp

from kornia_tpu.ops import filters, morphology, threshold, pyramid, canny


def _np(x):
    return np.asarray(x)


class TestGaussian:
    def test_u8_corridor(self, rgb_small):
        ours = _np(filters.gaussian_blur(jnp.asarray(rgb_small), (5, 5), 1.5)).astype(np.int32)
        ref = cv2.GaussianBlur(rgb_small, (5, 5), 1.5).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1

    def test_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _np(filters.gaussian_blur(jnp.asarray(f), (7, 7), 2.0))
        ref = cv2.GaussianBlur(f, (7, 7), 2.0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_auto_sigma(self, gray_small):
        ours = _np(filters.gaussian_blur(jnp.asarray(gray_small), (5, 5), 0.0)).astype(np.int32)
        ref = cv2.GaussianBlur(gray_small, (5, 5), 0).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1


class TestBoxSobel:
    def test_box(self, rgb_small):
        ours = _np(filters.box_blur(jnp.asarray(rgb_small), (5, 5))).astype(np.int32)
        ref = cv2.blur(rgb_small, (5, 5)).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1

    def test_sobel_dx(self, gray_small):
        ours = _np(filters.sobel(jnp.asarray(gray_small.astype(np.float32)), 1, 0))
        ref = cv2.Sobel(gray_small.astype(np.float32), cv2.CV_32F, 1, 0, ksize=3)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_sobel_dy(self, gray_small):
        ours = _np(filters.sobel(jnp.asarray(gray_small.astype(np.float32)), 0, 1))
        ref = cv2.Sobel(gray_small.astype(np.float32), cv2.CV_32F, 0, 1, ksize=3)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_sobel_apertures(self, gray_small):
        """cv2.getDerivKernels parity for ksize 1/5/7 (the round-1
        `only ksize=3` stub is gone)."""
        g = gray_small.astype(np.float32)
        for ksize in (1, 5, 7):
            for dx, dy in ((1, 0), (0, 1)):
                ours = _np(filters.sobel(jnp.asarray(g), dx, dy,
                                         ksize=ksize))
                ref = cv2.Sobel(g, cv2.CV_32F, dx, dy, ksize=ksize)
                np.testing.assert_allclose(
                    ours, ref, atol=1e-2,
                    err_msg=f"ksize={ksize} dx={dx} dy={dy}")

    def test_filter2d(self, gray_small):
        k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        ours = _np(filters.filter2d(jnp.asarray(gray_small), jnp.asarray(k))).astype(np.int32)
        ref = cv2.filter2D(gray_small, -1, k).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1


class TestMedianBilateral:
    def test_median3(self, gray_small):
        ours = _np(filters.median_blur(jnp.asarray(gray_small), 3))
        ref = cv2.medianBlur(gray_small, 3)
        # interior must match exactly; borders differ (cv2 uses special border)
        np.testing.assert_array_equal(ours[2:-2, 2:-2], ref[2:-2, 2:-2])

    def test_median5_color(self, rgb_small):
        small = rgb_small[:64, :64]
        ours = _np(filters.median_blur(jnp.asarray(small), 5))
        ref = cv2.medianBlur(small, 5)
        np.testing.assert_array_equal(ours[4:-4, 4:-4], ref[4:-4, 4:-4])

    def test_bilateral(self, gray_small):
        small = gray_small[:128, :128]
        ours = _np(filters.bilateral_blur(jnp.asarray(small), 9, 75.0, 75.0)).astype(np.int32)
        ref = cv2.bilateralFilter(small, 9, 75.0, 75.0).astype(np.int32)
        # corridor: cv2 uses a LUT-quantized color weight
        assert np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8]).max() <= 12
        assert np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8]).mean() <= 1.0


class TestMorphology:
    def test_dilate(self, gray_small):
        ours = _np(morphology.dilate(jnp.asarray(gray_small), (3, 3)))
        ref = cv2.dilate(gray_small, np.ones((3, 3), np.uint8))
        np.testing.assert_array_equal(ours, ref)

    def test_erode(self, gray_small):
        ours = _np(morphology.erode(jnp.asarray(gray_small), (3, 3)))
        ref = cv2.erode(gray_small, np.ones((3, 3), np.uint8))
        np.testing.assert_array_equal(ours, ref)

    def test_open_close_grad(self, gray_small):
        k = np.ones((3, 3), np.uint8)
        np.testing.assert_array_equal(
            _np(morphology.opening(jnp.asarray(gray_small), (3, 3))),
            cv2.morphologyEx(gray_small, cv2.MORPH_OPEN, k),
        )
        np.testing.assert_array_equal(
            _np(morphology.closing(jnp.asarray(gray_small), (3, 3))),
            cv2.morphologyEx(gray_small, cv2.MORPH_CLOSE, k),
        )
        np.testing.assert_array_equal(
            _np(morphology.gradient(jnp.asarray(gray_small), (3, 3))),
            cv2.morphologyEx(gray_small, cv2.MORPH_GRADIENT, k),
        )


class TestThreshold:
    def test_binary(self, gray_small):
        ours = _np(threshold.threshold_binary(jnp.asarray(gray_small), 127, 255))
        _, ref = cv2.threshold(gray_small, 127, 255, cv2.THRESH_BINARY)
        np.testing.assert_array_equal(ours, ref)

    def test_otsu(self, gray_small):
        ours = float(threshold.otsu_threshold(jnp.asarray(gray_small)))
        ref, _ = cv2.threshold(gray_small, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert abs(ours - ref) <= 1.0

    def test_adaptive_mean(self, gray_small):
        ours = _np(
            threshold.adaptive_threshold(jnp.asarray(gray_small), 255, "mean", 11, 2.0)
        ).astype(np.int32)
        ref = cv2.adaptiveThreshold(
            gray_small, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, 11, 2
        ).astype(np.int32)
        # boundary pixels where mean-c ≈ value can flip either way
        assert (ours != ref).mean() < 0.02


class TestPyramid:
    def test_pyrdown(self, rgb_small):
        ours = _np(pyramid.pyrdown(jnp.asarray(rgb_small))).astype(np.int32)
        ref = cv2.pyrDown(rgb_small).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1

    def test_pyrup(self, rgb_small):
        small = rgb_small[:240, :320]
        ours = _np(pyramid.pyrup(jnp.asarray(small))).astype(np.int32)
        ref = cv2.pyrUp(small).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1

    def test_scale_pyramid(self, gray_small):
        levels = pyramid.scale_pyramid(jnp.asarray(gray_small), 4, 1.2)
        assert len(levels) == 4
        assert levels[1].shape == (400, 533)


class TestCanny:
    def test_agreement(self, gray_small):
        ours = _np(canny.canny(jnp.asarray(gray_small), 100, 200, ksize=0, hysteresis_iters=32))
        ref = cv2.Canny(gray_small, 100, 200)
        # different gradient pipelines → structural agreement, not exactness
        both = ((ours > 0) & (ref > 0)).sum()
        either = ((ours > 0) | (ref > 0)).sum()
        assert either == 0 or both / either > 0.5


class TestClahe:
    """CLAHE vs cv2.createCLAHE — exact integer clip/redistribution +
    cv2's tile interpolation geometry (<=1 LSB rounding ties)."""

    @pytest.mark.parametrize("clip,grid", [
        (40.0, (8, 8)), (2.0, (8, 8)), (40.0, (6, 5)), (4.0, (4, 4))])
    def test_vs_cv2(self, clip, grid):
        import cv2

        from kornia_tpu.ops import enhance

        rng = np.random.default_rng(0)
        base = rng.standard_normal((12, 16))
        img = cv2.resize(base, (320, 240),
                         interpolation=cv2.INTER_CUBIC)
        img = ((img - img.min()) / (img.max() - img.min())
               * 255).astype(np.uint8)
        ref = cv2.createCLAHE(clipLimit=clip,
                              tileGridSize=grid[::-1]).apply(img)
        ours = np.asarray(enhance.clahe(jnp.asarray(img), clip, grid))
        d = np.abs(ours.astype(int) - ref.astype(int))
        assert d.max() <= 1
        assert d.mean() < 0.02


class TestMedianNetwork:
    def test_median3_matches_cv2_interior(self):
        import cv2

        from kornia_tpu.ops import filters

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (120, 160), np.uint8)
        ours = np.asarray(filters.median_blur(
            jnp.asarray(img).astype(jnp.float32), 3)).astype(np.uint8)
        ref = cv2.medianBlur(img, 3)
        d = np.abs(ours[1:-1, 1:-1].astype(int)
                   - ref[1:-1, 1:-1].astype(int))
        assert d.max() == 0

    def test_median5_still_works(self):
        from kornia_tpu.ops import filters

        rng = np.random.default_rng(2)
        img = rng.standard_normal((40, 50)).astype(np.float32)
        out = np.asarray(filters.median_blur(jnp.asarray(img), 5))
        assert out.shape == img.shape
