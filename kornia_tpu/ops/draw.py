"""Drawing primitives (reference: kornia-imgproc/src/draw.rs).

Dense mask formulations — a line/circle/rect is an analytic inequality over
the pixel grid, evaluated for all pixels at once (branch-free, vmappable
over many shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.ops.interpolation import meshgrid_pixel


def _blend(img: jax.Array, mask: jax.Array, color: Sequence[float]) -> jax.Array:
    c = jnp.asarray(color, img.dtype)
    return jnp.where(mask[..., None], c, img)


def draw_line(img: jax.Array, p0, p1, color, thickness: float = 1.0) -> jax.Array:
    """Draw segment p0→p1 ((x, y) pixels) with round caps."""
    h, w = img.shape[0], img.shape[1]
    gx, gy = meshgrid_pixel(h, w)
    x0, y0 = (jnp.asarray(v, jnp.float32) for v in p0)
    x1, y1 = (jnp.asarray(v, jnp.float32) for v in p1)
    dx, dy = x1 - x0, y1 - y0
    len2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    t = jnp.clip(((gx - x0) * dx + (gy - y0) * dy) / len2, 0.0, 1.0)
    px, py = x0 + t * dx, y0 + t * dy
    dist2 = (gx - px) ** 2 + (gy - py) ** 2
    r = jnp.maximum(thickness * 0.5, 0.5)
    return _blend(img, dist2 <= r * r, color)


def draw_circle(img: jax.Array, center, radius: float, color, thickness: float = 1.0) -> jax.Array:
    """thickness < 0 fills."""
    h, w = img.shape[0], img.shape[1]
    gx, gy = meshgrid_pixel(h, w)
    cx, cy = (jnp.asarray(v, jnp.float32) for v in center)
    d = jnp.hypot(gx - cx, gy - cy)
    if thickness < 0:
        mask = d <= radius
    else:
        mask = jnp.abs(d - radius) <= jnp.maximum(thickness * 0.5, 0.5)
    return _blend(img, mask, color)


def draw_rect(img: jax.Array, top_left, bottom_right, color, thickness: float = 1.0) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    gx, gy = meshgrid_pixel(h, w)
    x0, y0 = (jnp.asarray(v, jnp.float32) for v in top_left)
    x1, y1 = (jnp.asarray(v, jnp.float32) for v in bottom_right)
    inside = (gx >= x0) & (gx <= x1) & (gy >= y0) & (gy <= y1)
    if thickness < 0:
        return _blend(img, inside, color)
    t = jnp.maximum(thickness, 1.0)
    inner = (gx >= x0 + t) & (gx <= x1 - t) & (gy >= y0 + t) & (gy <= y1 - t)
    return _blend(img, inside & ~inner, color)


def draw_keypoints(img: jax.Array, xy: jax.Array, color=(0, 255, 0), radius: float = 2.0) -> jax.Array:
    """Stamp filled circles at (N, 2) keypoint locations (vectorized)."""
    h, w = img.shape[0], img.shape[1]
    gx, gy = meshgrid_pixel(h, w)
    d2 = (gx[None] - xy[:, 0, None, None]) ** 2 + (gy[None] - xy[:, 1, None, None]) ** 2
    mask = jnp.any(d2 <= radius * radius, axis=0)
    return _blend(img, mask, color)
