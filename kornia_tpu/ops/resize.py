"""Resize as MXU matmuls (reference: kornia-imgproc/src/resize/).

TPU-first design: a separable resize is two band-matrix multiplications —
``out = Wy @ img @ Wx^T`` — instead of per-pixel gathers. The (out, in)
weight matrices are computed **at trace time** with numpy (shapes are static
under jit), so XLA sees two dense matmuls that ride the MXU. This covers
bilinear / bicubic / lanczos4 / area, with and without antialiasing
(PIL-style) — the reference implements the same semantics with per-row SIMD
kernels (resize/bilinear.rs, separable.rs, opencv_compat.rs).

Nearest keeps the cv2 convention ``sx = floor(dx * scale)`` and is a pure
gather (a take along each axis — still cheap).

Accuracy contract (mirrors the reference's measured-cv2-corridor approach,
kornia-imgproc/tests/opencv_compat.rs:4-18): exact for nearest, ≤2 LSB u8 /
small-ulp f32 for the linear family.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# filter kernels (numpy, trace-time)
# --------------------------------------------------------------------------


def _triangle(x):
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


def _cubic(x, a=-0.75):
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    return np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * (x3 - 5.0 * x2 + 8.0 * x - 4.0), 0.0),
    )


def _lanczos4(x, a=4):
    # cv2's INTER_LANCZOS4 window (a = 4)
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(np.abs(x) < a, out, 0.0)


def _lanczos3(x):
    # PIL's LANCZOS window (a = 3), used for antialiased downscale
    return _lanczos4(x, a=3)


def _box(x):
    return np.where(np.abs(x) <= 0.5, 1.0, 0.0)


_FILTERS = {
    "bilinear": (_triangle, 1.0),
    "bicubic": (_cubic, 2.0),
    "lanczos": (_lanczos4, 4.0),
}
_FILTERS_AA = {**_FILTERS, "lanczos": (_lanczos3, 3.0)}


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, antialias: bool
) -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic weight matrix."""
    if mode == "area":
        return _area_matrix(in_size, out_size)
    kernel, support = (_FILTERS_AA if antialias else _FILTERS)[mode]
    scale = in_size / out_size
    if antialias and scale > 1.0:
        ksc = scale
    else:
        ksc = 1.0
    sup = support * ksc
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        fx = (i + 0.5) * scale - 0.5
        lo = int(math.floor(fx - sup))
        hi = int(math.ceil(fx + sup)) + 1
        taps = np.arange(lo, hi)
        wt = kernel((taps - fx) / ksc)
        if antialias:
            # PIL semantics: clip taps to the image and renormalize over
            # the in-range subset
            keep = (taps >= 0) & (taps < in_size)
            taps, wt = taps[keep], wt[keep]
            s = wt.sum()
            if s != 0:
                wt = wt / s
            for j, ww in zip(taps, wt):
                w[i, j] += ww
        else:
            # cv2 semantics: border replicate — clamp tap indices,
            # accumulating out-of-range weight at the edges
            s = wt.sum()
            if s != 0:
                wt = wt / s
            idx = np.clip(taps, 0, in_size - 1)
            for j, ww in zip(idx, wt):
                w[i, j] += ww
    return w.astype(np.float32)


def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """cv2 INTER_AREA downscale weights (pixel-overlap averaging)."""
    scale = in_size / out_size
    if scale < 1.0:
        # cv2 area on upscale degenerates to bilinear-with-halfpixel
        return _resize_matrix(in_size, out_size, "bilinear", False)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        a, b = i * scale, (i + 1) * scale
        lo, hi = int(math.floor(a)), int(math.ceil(b))
        for j in range(lo, min(hi, in_size)):
            overlap = min(b, j + 1) - max(a, j)
            if overlap > 0:
                w[i, j] = overlap / scale
    s = w.sum(axis=1, keepdims=True)
    return (w / np.where(s == 0, 1.0, s)).astype(np.float32)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def resize(
    img: jax.Array,
    size: Tuple[int, int],
    mode: str = "bilinear",
    antialias: bool = False,
) -> jax.Array:
    """Resize (..., H, W, C) (or (..., H, W)) to (new_h, new_w).

    mode ∈ {nearest, bilinear, bicubic, lanczos, area}. ``antialias=True``
    gives PIL-style filtering on downscale (reference resize/separable.rs);
    ``False`` matches cv2 semantics.
    Preserves dtype (u8 rounds+clamps).
    """
    new_h, new_w = size
    chan = img.ndim >= 3
    x = img if chan else img[..., None]
    h, w = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype

    if mode == "nearest":
        # cv2 INTER_NEAREST: sx = floor(dx * (in/out))
        sy = np.minimum(np.floor(np.arange(new_h) * (h / new_h)).astype(np.int32), h - 1)
        sx = np.minimum(np.floor(np.arange(new_w) * (w / new_w)).astype(np.int32), w - 1)
        out = jnp.take(jnp.take(x, jnp.asarray(sy), axis=-3), jnp.asarray(sx), axis=-2)
        return out if chan else out[..., 0]

    wy = jnp.asarray(_resize_matrix(h, new_h, mode, antialias))
    wx = jnp.asarray(_resize_matrix(w, new_w, mode, antialias))
    xf = x.astype(jnp.float32)
    # u8 inputs tolerate one bf16 MXU pass (values ≤255 exact in bf16;
    # weight rounding ≤2⁻⁸ relative → ≲1 u8 LSB, inside the cv2 parity
    # corridor) and it is 3× the throughput of 3-pass f32-highest;
    # u16/f32 keep full precision.
    prec = (jax.lax.Precision.DEFAULT if orig_dtype == jnp.uint8
            else jax.lax.Precision.HIGHEST)
    # (..., H, W, C) → rows then cols, each a matmul on the MXU.
    out = jnp.einsum("oh,...hwc->...owc", wy, xf, precision=prec)
    out = jnp.einsum("pw,...hwc->...hpc", wx, out, precision=prec)
    if orig_dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    elif orig_dtype == jnp.uint16:
        out = jnp.clip(jnp.round(out), 0, 65535).astype(jnp.uint16)
    else:
        out = out.astype(orig_dtype)
    return out if chan else out[..., 0]


def resize_fast(img: jax.Array, size: Tuple[int, int], mode: str = "bilinear") -> jax.Array:
    """Alias kept for API parity with the reference's fast paths."""
    return resize(img, size, mode=mode, antialias=False)
