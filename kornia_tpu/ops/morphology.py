"""Morphology (reference: kornia-imgproc/src/morphology/).

Dilate/erode with rectangular structuring elements decompose into two 1-D
max/min passes (separable — same trick as the reference's strip-mined
kernels); arbitrary elements use a static-offset reduce. Implemented with
``lax.reduce_window`` which XLA maps to efficient VPU code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _reduce2d(img: jax.Array, ksize: Tuple[int, int], op: str) -> jax.Array:
    kh, kw = ksize
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3
    if not chan:
        x = x[..., None]
    lead = x.ndim - 3
    window = (1,) * lead + (kh, kw, 1)
    strides = (1,) * lead + (1, 1, 1)
    pads = [(0, 0)] * lead + [(kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2), (0, 0)]
    out = jax.lax.reduce_window(x, init, fn, window, strides, pads)
    if not chan:
        out = out[..., 0]
    return out.astype(img.dtype)


def dilate(img: jax.Array, ksize: Tuple[int, int] = (3, 3), kernel: Optional[np.ndarray] = None) -> jax.Array:
    if kernel is None:
        return _reduce2d(img, ksize, "max")
    return _morph_kernel(img, kernel, "max")


def erode(img: jax.Array, ksize: Tuple[int, int] = (3, 3), kernel: Optional[np.ndarray] = None) -> jax.Array:
    if kernel is None:
        return _reduce2d(img, ksize, "min")
    return _morph_kernel(img, kernel, "min")


def _morph_kernel(img: jax.Array, kernel: np.ndarray, op: str) -> jax.Array:
    """Arbitrary structuring element via static offset reduce."""
    kh, kw = kernel.shape
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3
    if not chan:
        x = x[..., None]
    h, w = x.shape[-3], x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 3) + [(kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2), (0, 0)]
    mode_val = -np.inf if op == "max" else np.inf
    p = jnp.pad(x, pad, mode="constant", constant_values=mode_val)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            if not kernel[dy, dx]:
                continue
            v = p[..., dy : dy + h, dx : dx + w, :]
            if acc is None:
                acc = v
            else:
                acc = jnp.maximum(acc, v) if op == "max" else jnp.minimum(acc, v)
    out = acc.astype(img.dtype)
    return out if chan else out[..., 0]


def opening(img: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    return dilate(erode(img, ksize), ksize)


def closing(img: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    return erode(dilate(img, ksize), ksize)


def gradient(img: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    d = dilate(img, ksize).astype(jnp.float32)
    e = erode(img, ksize).astype(jnp.float32)
    out = d - e
    if img.dtype == jnp.uint8:
        return jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out.astype(img.dtype)


def top_hat(img: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    o = opening(img, ksize).astype(jnp.float32)
    out = img.astype(jnp.float32) - o
    if img.dtype == jnp.uint8:
        return jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out.astype(img.dtype)


def black_hat(img: jax.Array, ksize: Tuple[int, int] = (3, 3)) -> jax.Array:
    cl = closing(img, ksize).astype(jnp.float32)
    out = cl - img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        return jnp.clip(out, 0, 255).astype(jnp.uint8)
    return out.astype(img.dtype)
