"""Gather-free shear-decomposition warp: kernel exactness + end-to-end
agreement with the single-pass gather warp."""

import numpy as np
import pytest

import cv2
import scipy.ndimage as ndi
import jax.numpy as jnp

from kornia_tpu.ops import warp_shear as ws
from kornia_tpu.ops.warp import warp_affine


@pytest.fixture(scope="module")
def smooth_img():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((12, 16))
    return cv2.resize(base, (160, 120),
                      interpolation=cv2.INTER_CUBIC).astype(np.float32)


class TestShearKernel:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        c = 256
        img = rng.standard_normal((c, c)).astype(np.float32)
        for shifts in [
            (0.3 * np.arange(c) - 40).astype(np.float32),
            (-0.414 * np.arange(c) + 60.7).astype(np.float32),
            np.full(c, 33.5, np.float32),
        ]:
            got = np.asarray(ws._shear_x(jnp.asarray(img),
                                         jnp.asarray(shifts)))
            ref = np.zeros_like(img)
            for y in range(c):
                s = shifts[y]
                i0 = int(np.floor(s))
                f = s - i0
                row = np.zeros(c + 1)
                for j in range(c + 1):
                    src = j + i0
                    row[j] = img[y, src] if 0 <= src < c else 0.0
                ref[y] = row[:-1] * (1 - f) + row[1:] * f
            np.testing.assert_allclose(got, ref, atol=1e-5)


def _check(img, m, tol):
    m = np.asarray(m, np.float32)
    ref = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m),
                                 (120, 160)))
    got = np.asarray(ws.warp_affine_shear(jnp.asarray(img),
                                          jnp.asarray(m), (120, 160)))
    content = np.asarray(warp_affine(
        jnp.asarray(np.ones_like(img)), jnp.asarray(m), (120, 160))) > 0.999
    content = ndi.binary_erosion(content, np.ones((9, 9)))
    if content.sum() < 500:
        return
    d = np.abs(ref - got)[content]
    assert d.max() / np.abs(img).max() < tol, d.max() / np.abs(img).max()


class TestWarpAffineShear:
    def test_exact_cases(self, smooth_img):
        for m in ([[1, 0, 0], [0, 1, 0]],
                  [[1, 0, 7], [0, 1, -3]],
                  [[1, 0, 2.5], [0, 1, 1.25]],
                  [[1, 0, 45.5], [0, 1, -30.25]]):
            _check(smooth_img, m, 0.01)

    @pytest.mark.parametrize("deg", [-135, -90, -45, 30, 45, 90, 150])
    def test_rotations(self, smooth_img, deg):
        _check(smooth_img, cv2.getRotationMatrix2D((80, 60), deg, 1.0),
               0.06)

    def test_scales(self, smooth_img):
        _check(smooth_img, cv2.getRotationMatrix2D((80, 60), 0, 0.6), 0.06)
        _check(smooth_img, cv2.getRotationMatrix2D((80, 60), 0, 1.7), 0.06)

    def test_general_and_reflection(self, smooth_img):
        _check(smooth_img, [[0.8, 0.3, 5], [-0.2, 1.1, -4]], 0.06)
        _check(smooth_img, [[-0.9, 0.1, 150], [0.05, 1.0, 2]], 0.06)

    def test_u8_rgb(self, smooth_img):
        rgb = np.clip((smooth_img[..., None] * 40 + 128), 0,
                      255).astype(np.uint8).repeat(3, axis=2)
        m = np.asarray(cv2.getRotationMatrix2D((80, 60), 25, 1.1),
                       np.float32)
        got = np.asarray(ws.warp_affine_shear(
            jnp.asarray(rgb), jnp.asarray(m), (120, 160)))
        ref = np.asarray(warp_affine(jnp.asarray(rgb), jnp.asarray(m),
                                     (120, 160)))
        content = ndi.binary_erosion(
            (ref > 0).all(-1), np.ones((9, 9)))
        d = np.abs(got.astype(int) - ref.astype(int))[content]
        assert got.dtype == np.uint8
        assert np.median(d) <= 1
        assert d.max() <= 16  # multi-pass interpolation corridor

    def test_method_kwarg(self, smooth_img):
        m = jnp.asarray([[1.0, 0, 3], [0, 1.0, 2]])
        a = warp_affine(jnp.asarray(smooth_img), m, (120, 160),
                        method="shear")
        b = ws.warp_affine_shear(jnp.asarray(smooth_img), m, (120, 160))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
