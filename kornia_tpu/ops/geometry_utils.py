"""Flip / crop / pad / draw-free geometric utilities
(reference: kornia-imgproc/src/{flip,crop,padding}.rs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def hflip(img: jax.Array) -> jax.Array:
    """Horizontal flip (mirror columns)."""
    axis = -2 if img.ndim >= 3 else -1
    return jnp.flip(img, axis=axis)


def vflip(img: jax.Array) -> jax.Array:
    axis = -3 if img.ndim >= 3 else -2
    return jnp.flip(img, axis=axis)


def rot180(img: jax.Array) -> jax.Array:
    return hflip(vflip(img))


def crop(img: jax.Array, x: int, y: int, w: int, h: int) -> jax.Array:
    """Static crop (reference crop.rs); use lax.dynamic_slice for traced xy."""
    if img.ndim >= 3:
        return img[..., y : y + h, x : x + w, :]
    return img[..., y : y + h, x : x + w]


def center_crop(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    ch, cw = size
    h = img.shape[-3] if img.ndim >= 3 else img.shape[-2]
    w = img.shape[-2] if img.ndim >= 3 else img.shape[-1]
    y = (h - ch) // 2
    x = (w - cw) // 2
    return crop(img, x, y, cw, ch)


def dynamic_crop(img: jax.Array, x, y, w: int, h: int) -> jax.Array:
    """Crop at a *traced* offset with static size (for jitted pipelines)."""
    start = [y, x] + [0] * (img.ndim - 2)
    sizes = list(img.shape)
    sizes[0], sizes[1] = h, w
    return jax.lax.dynamic_slice(img, [jnp.asarray(s) for s in start], sizes)


def pad(img: jax.Array, top: int, bottom: int, left: int, right: int,
        mode: str = "constant", value: float = 0.0) -> jax.Array:
    """Border padding (cv2.copyMakeBorder semantics subset)."""
    if img.ndim >= 3:
        widths = [(0, 0)] * (img.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    else:
        widths = [(0, 0)] * (img.ndim - 2) + [(top, bottom), (left, right)]
    if mode == "constant":
        return jnp.pad(img, widths, mode="constant", constant_values=value)
    if mode == "reflect":  # BORDER_REFLECT_101
        return jnp.pad(img, widths, mode="reflect")
    if mode == "replicate":
        return jnp.pad(img, widths, mode="edge")
    raise ValueError(mode)
