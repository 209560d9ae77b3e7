"""Color conversion parity vs cv2 (the reference's byte-exactness contract,
kornia-imgproc/src/cuda/mod.rs:8-53 / tests/opencv_compat.rs corridor style).
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from kornia_tpu.ops import color


def _u8(x):
    return np.asarray(x)


class TestGray:
    def test_rgb_to_gray_u8_corridor(self, rgb_small):
        # cv2 wheels are not internally byte-consistent (the reference
        # measured the same; opencv_compat.rs:4-18) — corridor is ≤1 LSB.
        ours = _u8(color.rgb_to_gray(jnp.asarray(rgb_small)))[..., 0].astype(np.int32)
        ref = cv2.cvtColor(rgb_small, cv2.COLOR_RGB2GRAY).astype(np.int32)
        diff = np.abs(ours - ref)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01  # <1% of pixels differ at all

    def test_rgb_to_gray_u8_fixed_point_exact(self):
        # our documented formula, checked exhaustively on all (r,g,b) axes
        for ch in range(3):
            v = np.zeros((1, 256, 3), np.uint8)
            v[0, :, ch] = np.arange(256)
            ours = _u8(color.rgb_to_gray(jnp.asarray(v)))[0, :, 0].astype(np.int64)
            w = [4899, 9617, 1868][ch]
            expect = (np.arange(256, dtype=np.int64) * w + (1 << 13)) >> 14
            np.testing.assert_array_equal(ours, expect)

    def test_bgr_to_gray_u8(self, rgb_small):
        bgr = rgb_small[..., ::-1]
        ours = _u8(color.bgr_to_gray(jnp.asarray(bgr)))[..., 0].astype(np.int32)
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.int32)
        assert np.abs(ours - ref).max() <= 1

    def test_rgb_to_gray_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_gray(jnp.asarray(f)))[..., 0]
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_gray_to_rgb(self, gray_small):
        out = _u8(color.gray_to_rgb(jnp.asarray(gray_small)[..., None]))
        assert out.shape == gray_small.shape + (3,)
        np.testing.assert_array_equal(out[..., 0], gray_small)

    def test_batched(self, rgb_small):
        batch = np.stack([rgb_small, rgb_small[::-1]])
        out = _u8(color.rgb_to_gray(jnp.asarray(batch)))
        assert out.shape == (2, 480, 640, 1)


class TestHsvHls:
    def test_rgb_to_hsv_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_hsv(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2HSV)
        # hue lives on a [0,360) scale → absolute tolerance scales with it
        np.testing.assert_allclose(ours[..., 0], ref[..., 0], atol=5e-3)
        np.testing.assert_allclose(ours[..., 1:], ref[..., 1:], atol=1e-4)

    def test_hsv_roundtrip_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        back = _u8(color.hsv_to_rgb(color.rgb_to_hsv(jnp.asarray(f))))
        np.testing.assert_allclose(back, f, atol=1e-5)

    def test_rgb_to_hsv_u8_corridor(self, rgb_small):
        ours = _u8(color.rgb_to_hsv(jnp.asarray(rgb_small))).astype(np.int32)
        ref = cv2.cvtColor(rgb_small, cv2.COLOR_RGB2HSV).astype(np.int32)
        # hue wraps at 180
        dh = np.abs(ours[..., 0] - ref[..., 0])
        dh = np.minimum(dh, 180 - dh)
        assert dh.max() <= 2
        assert np.abs(ours[..., 1:] - ref[..., 1:]).max() <= 2

    def test_rgb_to_hls_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_hls(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2HLS)
        np.testing.assert_allclose(ours[..., 0], ref[..., 0], atol=5e-3)
        np.testing.assert_allclose(ours[..., 1:], ref[..., 1:], atol=1e-4)

    def test_hls_roundtrip_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        back = _u8(color.hls_to_rgb(color.rgb_to_hls(jnp.asarray(f))))
        np.testing.assert_allclose(back, f, atol=1e-5)


class TestCie:
    def test_rgb_to_xyz_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_xyz(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2XYZ)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rgb_to_lab_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_lab(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2Lab)
        # cv2's f32 Lab uses a spline-interpolated gamma LUT → ~0.4 corridor
        # on the [0,100]/[-127,127] scales (we use the exact transfer fn).
        np.testing.assert_allclose(ours, ref, atol=0.5)

    def test_lab_roundtrip(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        back = _u8(color.lab_to_rgb(color.rgb_to_lab(jnp.asarray(f))))
        np.testing.assert_allclose(back, f, atol=1e-3)

    def test_rgb_to_luv_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        ours = _u8(color.rgb_to_luv(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2Luv)
        np.testing.assert_allclose(ours, ref, atol=5e-2)

    def test_luv_roundtrip(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        back = _u8(color.luv_to_rgb(color.rgb_to_luv(jnp.asarray(f))))
        np.testing.assert_allclose(back, f, atol=2e-3)


class TestMisc:
    def test_bgr_swap(self, rgb_small):
        out = _u8(color.rgb_to_bgr(jnp.asarray(rgb_small)))
        np.testing.assert_array_equal(out, rgb_small[..., ::-1])

    def test_rgba(self, rgb_small):
        rgba = _u8(color.rgb_to_rgba(jnp.asarray(rgb_small)))
        assert rgba.shape[-1] == 4
        assert (rgba[..., 3] == 255).all()
        np.testing.assert_array_equal(_u8(color.rgba_to_rgb(jnp.asarray(rgba))), rgb_small)

    def test_yuv_roundtrip_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        back = _u8(color.yuv_to_rgb(color.rgb_to_yuv(jnp.asarray(f))))
        np.testing.assert_allclose(back, f, atol=1e-3)

    def test_sepia_shape(self, rgb_small):
        out = _u8(color.sepia(jnp.asarray(rgb_small)))
        assert out.shape == rgb_small.shape and out.dtype == np.uint8

    def test_colormap(self, gray_small):
        out = _u8(color.apply_colormap(jnp.asarray(gray_small)))
        assert out.shape == gray_small.shape + (3,)


class TestColormapsExtra:
    def test_all_luts(self):
        import numpy as np
        from kornia_tpu.ops import color
        g = jnp.asarray(np.arange(256, dtype=np.uint8).reshape(16, 16))
        # every ColormapType row of the reference (colormap.rs:18-60)
        for name in color._LUT_BUILDERS:
            out = color.apply_colormap(g, name)
            assert out.shape == (16, 16, 3) and out.dtype == jnp.uint8
        assert len(color._LUT_BUILDERS) >= 21
        # classic endpoint contracts
        lut = color._LUT_BUILDERS["autumn"]()
        assert tuple(lut[0]) == (255, 0, 0)
        assert tuple(lut[-1]) == (255, 255, 0)
        lut = color._LUT_BUILDERS["cool"]()
        assert tuple(lut[0]) == (0, 255, 255)
        assert tuple(lut[-1]) == (255, 0, 255)
        lut = color._LUT_BUILDERS["bone"]()
        assert tuple(lut[0]) == (0, 0, 0)
        assert tuple(lut[-1]) == (255, 255, 255)
        # perceptual family pulls matplotlib's published data exactly
        import matplotlib
        ref = (matplotlib.colormaps["magma"](
            np.linspace(0, 1, 256))[:, :3] * 255).round().astype(np.uint8)
        np.testing.assert_array_equal(color._LUT_BUILDERS["magma"](), ref)
        # gray LUT is identity per channel
        out = np.asarray(color.apply_colormap(g, "gray"))
        np.testing.assert_array_equal(out[..., 0], np.asarray(g))
        with pytest.raises(ValueError):
            color.apply_colormap(g, "nope")
