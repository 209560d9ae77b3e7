"""Exactness tests for the Pallas warp/remap chunk kernel.

Reference contract: the kernel must reproduce the scalar-gather
formulation (ops.interpolation.grid_sample) — which is itself
corridor-tested against cv2 in test_warp.py — to u8 rounding ties
(<= 1 LSB from ulp-level coordinate arithmetic differences) and f32
coordinate roundoff. Mirrors the reference's byte-exactness discipline
(kornia-imgproc/src/cuda/mod.rs:8-53: every GPU kernel byte-exact vs
the CPU path; opencv_compat.rs measured-tolerance corridors).

Runs in interpret mode on the CPU mesh — the same code path as TPU
hardware minus the Mosaic lowering quirks that tests on real hardware
cover (negative dynamic rolls, alignment), which are documented in
PERF_NOTES.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kornia_tpu.ops.warp_pallas import (
    remap_exact, warp_affine_exact, warp_perspective_exact)
from kornia_tpu.ops.interpolation import grid_sample
from kornia_tpu.ops.warp import get_rotation_matrix2d


def _gather_ref(img, mx, my, mode="bilinear", padding_mode="zeros"):
    x = img[..., None] if img.ndim == 2 else img
    out = grid_sample(jnp.asarray(x).astype(jnp.float32),
                      jnp.asarray(mx), jnp.asarray(my),
                      mode=mode, padding_mode=padding_mode)
    out = np.asarray(out)
    if img.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[..., 0] if img.ndim == 2 else out


@pytest.fixture(scope="module")
def img_u8():
    # non-tile-aligned odd sizes exercise edge masking; kept small —
    # interpret-mode kernel execution costs ~0.5 ms/dest-px-equivalent
    # on the 1-core CI box, and this fixture is executed ~20x across
    # the module (the 123x310 original made each case ~45 s)
    return np.random.default_rng(7).integers(
        0, 256, (75, 170), np.uint8)


@pytest.fixture(scope="module")
def smooth_maps(img_u8):
    h, w = img_u8.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r2 = ((xx - w / 2) / w) ** 2 + ((yy - h / 2) / h) ** 2
    mx = xx + 40.0 * r2 * (xx - w / 2) / w
    my = yy + 40.0 * r2 * (yy - h / 2) / h
    return mx.astype(np.float32), my.astype(np.float32)


def test_remap_exact_bilinear(img_u8, smooth_maps):
    mx, my = smooth_maps
    for pad in ("zeros", "border"):
        out = np.asarray(remap_exact(jnp.asarray(img_u8),
                                     jnp.asarray(mx), jnp.asarray(my),
                                     padding_mode=pad))
        ref = _gather_ref(img_u8, mx, my, padding_mode=pad)
        np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_remap_exact_oob_and_nearest(img_u8):
    h, w = img_u8.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mx, my = xx - 20.0, yy - 15.0
    out = np.asarray(remap_exact(jnp.asarray(img_u8), jnp.asarray(mx),
                                 jnp.asarray(my)))
    np.testing.assert_array_equal(out, _gather_ref(img_u8, mx, my))
    out = np.asarray(remap_exact(jnp.asarray(img_u8), jnp.asarray(mx),
                                 jnp.asarray(my), mode="nearest"))
    np.testing.assert_array_equal(
        out, _gather_ref(img_u8, mx, my, mode="nearest"))


@pytest.mark.slow
def test_remap_exact_f32_multichannel(smooth_maps):
    mx, my = smooth_maps
    imgf = np.random.default_rng(3).random(
        (mx.shape[0], mx.shape[1], 3)).astype(np.float32)
    out = np.asarray(remap_exact(jnp.asarray(imgf), jnp.asarray(mx),
                                 jnp.asarray(my)))
    ref = _gather_ref(imgf, mx, my)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_remap_fallback_on_torn_map(img_u8):
    """Maps outside the window capacity fall back to the gather path
    inside lax.cond — same values, proving the capacity gate works."""
    h, w = img_u8.shape
    rng = np.random.default_rng(0)
    mx = rng.uniform(-5, w + 5, (h, w)).astype(np.float32)
    my = rng.uniform(-5, h + 5, (h, w)).astype(np.float32)
    out = np.asarray(remap_exact(jnp.asarray(img_u8), jnp.asarray(mx),
                                 jnp.asarray(my)))
    np.testing.assert_array_equal(out, _gather_ref(img_u8, mx, my))


# interpret-mode kernel execution costs ~45 s per case on the 1-core
# CI box regardless of fixture size (trace+interpret overhead), so the
# fast tier keeps one flagship case per kernel flavor; the sweep runs
# in the slow tier.
@pytest.mark.parametrize("angle", [
    30,               # fast tier flagship: pre-shear + staging path
    pytest.param(0, marks=pytest.mark.slow),
    pytest.param(5, marks=pytest.mark.slow),
    pytest.param(45, marks=pytest.mark.slow),
    pytest.param(90, marks=pytest.mark.slow),
    pytest.param(135, marks=pytest.mark.slow),
    pytest.param(270, marks=pytest.mark.slow),
    pytest.param(333, marks=pytest.mark.slow),
])
def test_warp_affine_exact_rotations(img_u8, angle):
    h, w = img_u8.shape
    m = np.asarray(get_rotation_matrix2d((w / 2, h / 2), float(angle),
                                         1.0))
    out = np.asarray(warp_affine_exact(
        jnp.asarray(img_u8), jnp.asarray(m), (h, w))).astype(int)
    from kornia_tpu.ops.warp import warp_affine
    ref = np.asarray(warp_affine(jnp.asarray(img_u8), jnp.asarray(m),
                                 (h, w), method="gather")).astype(int)
    d = np.abs(out - ref)
    # <=1 LSB rounding ties from ulp-level matrix-inversion differences
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


@pytest.mark.parametrize("m,name", [
    (np.asarray([[1.0, 0.3, 0], [0.1, 1.0, 0]], np.float32), "shear"),
    pytest.param(np.asarray([[2.0, 0, -10], [0, 2.0, -5]], np.float32),
                 "scale2", marks=pytest.mark.slow),
    pytest.param(np.asarray([[0.5, 0, 10], [0, 0.5, 5]], np.float32),
                 "scale0.5", marks=pytest.mark.slow),
    pytest.param(np.asarray([[1.0, 0, 20.5], [0, 1.0, -7.3]],
                            np.float32), "trans",
                 marks=pytest.mark.slow),
])
def test_warp_affine_exact_general(img_u8, m, name):
    h, w = img_u8.shape
    out = np.asarray(warp_affine_exact(
        jnp.asarray(img_u8), jnp.asarray(m), (h, w))).astype(int)
    from kornia_tpu.ops.warp import warp_affine
    ref = np.asarray(warp_affine(jnp.asarray(img_u8), jnp.asarray(m),
                                 (h, w), method="gather")).astype(int)
    assert np.abs(out - ref).max() <= 1


def test_warp_affine_exact_modes(img_u8):
    h, w = img_u8.shape
    m = np.asarray(get_rotation_matrix2d((w / 2, h / 2), 25.0, 0.8))
    from kornia_tpu.ops.warp import warp_affine
    for kw in ({"padding_mode": "border"}, {"mode": "nearest"}):
        out = np.asarray(warp_affine_exact(
            jnp.asarray(img_u8), jnp.asarray(m), (160, 200),
            **kw)).astype(int)
        ref = np.asarray(warp_affine(
            jnp.asarray(img_u8), jnp.asarray(m), (160, 200),
            method="gather", **kw)).astype(int)
        assert np.abs(out - ref).max() <= 1


def test_warp_perspective_exact(img_u8):
    h, w = img_u8.shape
    hm = np.asarray([[1.0, 0.05, 4], [0.02, 0.98, -3],
                     [1e-4, -8e-5, 1.0]], np.float32)
    out = np.asarray(warp_perspective_exact(
        jnp.asarray(img_u8), jnp.asarray(hm), (h, w))).astype(int)
    from kornia_tpu.ops.warp import warp_perspective
    ref = np.asarray(warp_perspective(
        jnp.asarray(img_u8), jnp.asarray(hm), (h, w),
        method="gather")).astype(int)
    assert np.abs(out - ref).max() <= 1


@pytest.mark.slow
def test_warp_affine_staged_rows(monkeypatch):
    """Regression: destination row-blocks whose source staging base is
    far from 0 must resolve GLOBAL source rows correctly (round 2's
    banded-executor bug class: band/staging-relative row bases offset
    by the window start corrupted every tall warp while the
    small-image suite stayed green). The in-kernel DMA staging window
    is shrunk to 64 rows so the 173x410 fixture produces many
    row-blocks with staging bases > 0."""
    import kornia_tpu.ops.warp_pallas as wp
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (173, 410), np.uint8)
    h, w = img.shape
    m = np.asarray(get_rotation_matrix2d((w / 2, h / 2), 30.0, 1.0))
    from kornia_tpu.ops.warp import warp_affine
    ref = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m),
                                 (h, w), method="gather")).astype(int)
    monkeypatch.setattr(wp, "_HBB", 64)
    out = np.asarray(warp_affine_exact(
        jnp.asarray(img), jnp.asarray(m), (h, w),
        fallback=False)).astype(int)
    assert np.abs(out - ref).max() <= 1


@pytest.mark.slow
def test_remap_staged_rows(monkeypatch):
    """Same regression for the no-shear remap flavor (tall
    undistortion maps stage too)."""
    import kornia_tpu.ops.warp_pallas as wp
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (171, 420), np.uint8)
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r2 = ((xx - w / 2) / w) ** 2 + ((yy - h / 2) / h) ** 2
    mx = (xx + 40.0 * r2 * (xx - w / 2) / w).astype(np.float32)
    my = (yy + 40.0 * r2 * (yy - h / 2) / h).astype(np.float32)
    ref = _gather_ref(img, mx, my)
    monkeypatch.setattr(wp, "_HBB", 64)
    out = np.asarray(remap_exact(jnp.asarray(img), jnp.asarray(mx),
                                 jnp.asarray(my), fallback=False))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_undistort_rides_pallas(img_u8, monkeypatch):
    """undistort_image routes through remap -> remap_exact (the TPU
    default; forced here since the CPU default is the gather path)."""
    monkeypatch.setenv("KORNIA_TPU_WARP", "pallas")
    from kornia_tpu.geometry.camera import undistort_image
    h, w = img_u8.shape
    k = jnp.asarray([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]],
                    jnp.float32)
    dist = jnp.asarray([0.08, -0.03, 0.001, 0.001, 0.0], jnp.float32)
    out = np.asarray(undistort_image(jnp.asarray(img_u8), k, dist))
    assert out.shape == img_u8.shape
    # center region should be near-identity
    assert np.abs(out[40:80, 100:200].astype(int)
                  - img_u8[40:80, 100:200].astype(int)).mean() < 30
