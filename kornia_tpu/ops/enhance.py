"""Pixel-intensity enhancement (reference: kornia-imgproc/src/enhance.rs,
clahe.rs; color-jitter ops from kornia-py augmentations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kornia_tpu.ops import color as _color


def _finalize(out, dtype):
    if dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(dtype)


def add_weighted(a: jax.Array, alpha: float, b: jax.Array, beta: float, gamma: float) -> jax.Array:
    """cv2.addWeighted (reference enhance.rs add_weighted)."""
    out = a.astype(jnp.float32) * alpha + b.astype(jnp.float32) * beta + gamma
    return _finalize(out, a.dtype)


def adjust_brightness(img: jax.Array, factor: float) -> jax.Array:
    """Multiply intensity by ``factor`` (torchvision convention)."""
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    out = img.astype(jnp.float32) * factor
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_contrast(img: jax.Array, factor: float) -> jax.Array:
    """Blend with mean grayscale (torchvision convention)."""
    x = img.astype(jnp.float32)
    gray = _color.rgb_to_gray(img).astype(jnp.float32)
    mean = jnp.mean(gray)
    out = mean + factor * (x - mean)
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_saturation(img: jax.Array, factor: float) -> jax.Array:
    x = img.astype(jnp.float32)
    gray = _color.rgb_to_gray(img).astype(jnp.float32)
    out = gray + factor * (x - gray)
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_hue(img: jax.Array, hue_deg: float) -> jax.Array:
    """Rotate hue by ``hue_deg`` degrees through HSV."""
    hsv = _color.rgb_to_hsv(img)
    if img.dtype == jnp.uint8:
        h = (hsv[..., 0].astype(jnp.float32) + hue_deg / 2.0) % 180.0
        hsv = hsv.at[..., 0].set(jnp.round(h).astype(jnp.uint8))
    else:
        h = (hsv[..., 0] + hue_deg) % 360.0
        hsv = hsv.at[..., 0].set(h)
    return _color.hsv_to_rgb(hsv)


def adjust_gamma(img: jax.Array, gamma: float, gain: float = 1.0) -> jax.Array:
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    x = img.astype(jnp.float32) / scale
    out = gain * x**gamma
    return _finalize(jnp.clip(out, 0.0, 1.0) * scale, img.dtype)


def invert(img: jax.Array) -> jax.Array:
    if img.dtype == jnp.uint8:
        return (255 - img.astype(jnp.int32)).astype(jnp.uint8)
    return (1.0 - img).astype(img.dtype)


def equalize_hist(gray: jax.Array) -> jax.Array:
    """Global histogram equalization on u8 grayscale (cv2.equalizeHist)."""
    flat = gray.reshape(-1)
    hist = jnp.bincount(flat.astype(jnp.int32), length=256)
    cdf = jnp.cumsum(hist)
    n = flat.shape[0]
    # cv2: lut = round((cdf - cdf_min) / (N - cdf_min) * 255)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, n + 1))
    denom = jnp.maximum(n - cdf_min, 1)
    lut = jnp.clip(jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0), 0, 255)
    return lut.astype(jnp.uint8)[gray.astype(jnp.int32)]


def clahe(
    gray: jax.Array, clip_limit: float = 40.0, grid: tuple = (8, 8)
) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (reference clahe.rs).

    Dense TPU formulation: per-tile histograms via one-hot segment sums,
    clip + redistribute, per-tile LUTs, then bilinear LUT interpolation —
    all fixed-shape.
    """
    h, w = gray.shape[:2]
    gy, gx = grid
    th, tw = -(-h // gy), -(-w // gx)  # ceil tile size
    ph, pw = th * gy - h, tw * gx - w
    g = jnp.pad(gray, ((0, ph), (0, pw)), mode="edge")
    tiles = g.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(gy * gx, th * tw)
    onehot = jax.nn.one_hot(tiles.astype(jnp.int32), 256, dtype=jnp.float32)
    hists = jnp.sum(onehot, axis=1)  # (T, 256)
    # clip and redistribute (cv2 semantics: clip_limit scaled by tile size)
    limit = jnp.maximum(clip_limit * (th * tw) / 256.0, 1.0)
    excess = jnp.sum(jnp.maximum(hists - limit, 0.0), axis=1, keepdims=True)
    hists = jnp.minimum(hists, limit) + excess / 256.0
    cdfs = jnp.cumsum(hists, axis=1)
    luts = jnp.clip(jnp.round(cdfs * (255.0 / (th * tw))), 0, 255)  # (T, 256)
    luts = luts.reshape(gy, gx, 256)

    # bilinear interpolation between neighboring tile LUTs
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    ty = (yy + 0.5) / th - 0.5
    tx = (xx + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, gy - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, gx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, gy - 1)
    x1 = jnp.clip(x0 + 1, 0, gx - 1)
    fy = jnp.clip(ty - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(tx - x0, 0.0, 1.0)[None, :]
    gi = gray.astype(jnp.int32)
    v00 = luts[y0[:, None], x0[None, :], gi]
    v01 = luts[y0[:, None], x1[None, :], gi]
    v10 = luts[y1[:, None], x0[None, :], gi]
    v11 = luts[y1[:, None], x1[None, :], gi]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
