"""Warp / remap parity vs cv2."""

import cv2
import numpy as np
import jax.numpy as jnp

from kornia_tpu.ops import warp
from kornia_tpu.ops.interpolation import remap


def _np(x):
    return np.asarray(x)


def _interior_mask(shape, m, dsize_hw, border=2):
    """Mask of destination pixels whose source footprint is strictly inside —
    cv2 and we treat boundary blending slightly differently."""
    h, w = dsize_hw
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    minv = cv2.invertAffineTransform(m) if m.shape == (2, 3) else np.linalg.inv(m)
    if m.shape == (2, 3):
        sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
        sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    else:
        d = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
        sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / d
        sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / d
    H, W = shape[:2]
    return (sx >= border) & (sx < W - border) & (sy >= border) & (sy < H - border)


class TestWarpAffine:
    def test_rotation_u8(self, rgb_small):
        m = cv2.getRotationMatrix2D((320, 240), 30.0, 0.9).astype(np.float32)
        ours = _np(warp.warp_affine(jnp.asarray(rgb_small), jnp.asarray(m), (480, 640)))
        ref = cv2.warpAffine(rgb_small, m, (640, 480))
        inside = _interior_mask(rgb_small.shape, m, (480, 640))
        d = np.abs(ours.astype(int) - ref.astype(int))[inside]
        assert d.max() <= 2

    def test_shear_f32(self, rgb_small):
        f = rgb_small.astype(np.float32) / 255.0
        m = np.array([[1.0, 0.2, 5.0], [0.1, 1.0, -3.0]], np.float32)
        ours = _np(warp.warp_affine(jnp.asarray(f), jnp.asarray(m), (480, 640)))
        ref = cv2.warpAffine(f, m, (640, 480))
        inside = _interior_mask(rgb_small.shape, m, (480, 640))
        np.testing.assert_allclose(ours[inside], ref[inside], atol=1e-4)

    def test_identity(self, rgb_small):
        m = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
        ours = _np(warp.warp_affine(jnp.asarray(rgb_small), jnp.asarray(m), (480, 640)))
        np.testing.assert_array_equal(ours, rgb_small)

    def test_get_rotation_matrix2d(self):
        ours = _np(warp.get_rotation_matrix2d((100.0, 50.0), 45.0, 2.0))
        ref = cv2.getRotationMatrix2D((100.0, 50.0), 45.0, 2.0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestWarpPerspective:
    def test_homography_u8(self, rgb_small):
        src = np.float32([[0, 0], [639, 0], [639, 479], [0, 479]])
        dst = np.float32([[10, 20], [620, 5], [630, 460], [5, 470]])
        m = cv2.getPerspectiveTransform(src, dst)
        ours = _np(
            warp.warp_perspective(jnp.asarray(rgb_small), jnp.asarray(m.astype(np.float32)), (480, 640))
        )
        ref = cv2.warpPerspective(rgb_small, m, (640, 480))
        inside = _interior_mask(rgb_small.shape, m, (480, 640))
        d = np.abs(ours.astype(int) - ref.astype(int))[inside]
        assert d.max() <= 2

    def test_identity(self, rgb_small):
        ours = _np(warp.warp_perspective(jnp.asarray(rgb_small), jnp.eye(3, dtype=np.float32), (480, 640)))
        np.testing.assert_array_equal(ours, rgb_small)


class TestRemap:
    def test_identity_maps(self, rgb_small):
        xs, ys = np.meshgrid(np.arange(640, dtype=np.float32), np.arange(480, dtype=np.float32))
        ours = _np(remap(jnp.asarray(rgb_small), jnp.asarray(xs), jnp.asarray(ys)))
        np.testing.assert_array_equal(ours, rgb_small)

    def test_vs_cv2(self, rgb_small):
        xs, ys = np.meshgrid(np.arange(640, dtype=np.float32), np.arange(480, dtype=np.float32))
        mx = xs + 3.7 * np.sin(ys / 17.0)
        my = ys + 2.2 * np.cos(xs / 23.0)
        ours = _np(remap(jnp.asarray(rgb_small), jnp.asarray(mx), jnp.asarray(my)))
        ref = cv2.remap(rgb_small, mx.astype(np.float32), my.astype(np.float32), cv2.INTER_LINEAR)
        inside = (mx >= 1) & (mx < 639) & (my >= 1) & (my < 479)
        d = np.abs(ours.astype(int) - ref.astype(int))[inside]
        # cv2.remap quantizes to 1/32 px fixed point → small corridor
        assert d.max() <= 3
        assert d.mean() <= 0.5
