"""Resize parity vs cv2 (reference: kornia-imgproc/tests/opencv_compat.rs
corridor: exact for nearest, ≤2 LSB u8 linear)."""

import cv2
import numpy as np
import jax.numpy as jnp

from kornia_tpu.ops.resize import resize


def _np(x):
    return np.asarray(x)


class TestNearest:
    def test_downscale_exact(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (240, 320), "nearest"))
        ref = cv2.resize(rgb_small, (320, 240), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)

    def test_upscale_exact(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (960, 1280), "nearest"))
        ref = cv2.resize(rgb_small, (1280, 960), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)

    def test_odd_sizes(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (333, 517), "nearest"))
        ref = cv2.resize(rgb_small, (517, 333), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)


class TestBilinear:
    def corridor(self, rgb, dsize_hw):
        h, w = dsize_hw
        ours = _np(resize(jnp.asarray(rgb), (h, w), "bilinear")).astype(np.int32)
        ref = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_LINEAR).astype(np.int32)
        return np.abs(ours - ref).max()

    def test_half(self, rgb_small):
        assert self.corridor(rgb_small, (240, 320)) <= 2

    def test_upscale(self, rgb_small):
        assert self.corridor(rgb_small, (960, 1280)) <= 2

    def test_odd(self, rgb_small):
        assert self.corridor(rgb_small, (123, 457)) <= 2

    def test_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _np(resize(jnp.asarray(f), (240, 320), "bilinear"))
        ref = cv2.resize(f, (320, 240), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_gray_2d(self, gray_small):
        ours = _np(resize(jnp.asarray(gray_small), (240, 320), "bilinear")).astype(np.int32)
        ref = cv2.resize(gray_small, (320, 240), interpolation=cv2.INTER_LINEAR).astype(np.int32)
        assert np.abs(ours - ref).max() <= 2


class TestBicubicLanczosArea:
    def test_bicubic_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _np(resize(jnp.asarray(f), (960, 1280), "bicubic"))
        ref = cv2.resize(f, (1280, 960), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_lanczos_u8(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (960, 1280), "lanczos")).astype(np.int32)
        ref = cv2.resize(rgb_small, (1280, 960), interpolation=cv2.INTER_LANCZOS4).astype(np.int32)
        assert np.abs(ours - ref).max() <= 3

    def test_area_downscale(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (240, 320), "area")).astype(np.int32)
        ref = cv2.resize(rgb_small, (320, 240), interpolation=cv2.INTER_AREA).astype(np.int32)
        assert np.abs(ours - ref).max() <= 2

    def test_area_nonint_downscale(self, rgb_small):
        ours = _np(resize(jnp.asarray(rgb_small), (190, 250), "area")).astype(np.int32)
        ref = cv2.resize(rgb_small, (250, 190), interpolation=cv2.INTER_AREA).astype(np.int32)
        assert np.abs(ours - ref).max() <= 2


class TestAntialias:
    def test_pil_parity_bilinear(self, rgb_small):
        from PIL import Image as PILImage

        ours = _np(resize(jnp.asarray(rgb_small), (240, 320), "bilinear", antialias=True)).astype(np.int32)
        ref = np.asarray(
            PILImage.fromarray(rgb_small).resize((320, 240), PILImage.BILINEAR)
        ).astype(np.int32)
        assert np.abs(ours - ref).max() <= 2

    def test_pil_parity_lanczos(self, rgb_small):
        from PIL import Image as PILImage

        ours = _np(resize(jnp.asarray(rgb_small), (120, 160), "lanczos", antialias=True)).astype(np.int32)
        ref = np.asarray(
            PILImage.fromarray(rgb_small).resize((160, 120), PILImage.LANCZOS)
        ).astype(np.int32)
        assert np.abs(ours - ref).max() <= 2


class TestBatch:
    def test_batched(self, rgb_small):
        batch = np.stack([rgb_small, rgb_small[::-1].copy()])
        out = _np(resize(jnp.asarray(batch), (100, 200), "bilinear"))
        assert out.shape == (2, 100, 200, 3)
        single = _np(resize(jnp.asarray(rgb_small), (100, 200), "bilinear"))
        # batched einsum may reassociate → ±1 LSB at exact .5 rounding edges
        assert np.abs(out[0].astype(int) - single.astype(int)).max() <= 1
