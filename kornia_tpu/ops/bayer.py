"""Bayer demosaicing (RGGB/BGGR/GRBG/GBRG → RGB).

Capability parity with the reference's color/bayer demosaic
(kornia-imgproc/src/color/, SURVEY.md §2.4 Color row). The TPU
formulation is one normalized 3×3 convolution per channel — for bilinear
demosaic the interpolation weights of every CFA phase are contained in a
single [[1,2,1],[2,4,2],[1,2,1]] kernel applied to the mask-gated raw
image and divided by the mask response. Entirely fused by XLA.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# channel layout of the 2×2 CFA tile for each pattern: (r_pos, b_pos)
# positions are (row, col) within the tile; green fills the other two.
_PATTERNS = {
    "rggb": ((0, 0), (1, 1)),
    "bggr": ((1, 1), (0, 0)),
    "grbg": ((0, 1), (1, 0)),
    "gbrg": ((1, 0), (0, 1)),
}

# numpy (device-constant capture is pathological on axon — PERF_NOTES.md)
_K = np.asarray([[1.0, 2.0, 1.0],
                 [2.0, 4.0, 2.0],
                 [1.0, 2.0, 1.0]], np.float32)


def _interp(masked: jax.Array, mask: jax.Array) -> jax.Array:
    def conv(x):
        # shift-add instead of lax.conv (pathological for small depthwise
        # kernels on TPU — see ops/filters._conv_sep / PERF_NOTES.md)
        h, w = x.shape
        p = jnp.pad(x, 1)
        out = None
        for dy in range(3):
            for dx in range(3):
                kv = float(_K[dy, dx])
                term = p[dy: dy + h, dx: dx + w] * kv
                out = term if out is None else out + term
        return out

    num = conv(masked)
    den = conv(mask)
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("pattern",))
def demosaic_bilinear(raw: jax.Array, pattern: str = "rggb") -> jax.Array:
    """Bilinear-demosaic a (H, W) raw frame to (H, W, 3) RGB.

    u8 input → u8 output (rounded); float input stays float.
    """
    if pattern not in _PATTERNS:
        raise ValueError(f"unknown bayer pattern {pattern!r}")
    if raw.ndim == 3 and raw.shape[2] == 1:
        raw = raw[:, :, 0]
    if raw.ndim != 2:
        raise ValueError(f"raw must be (H, W), got {raw.shape}")
    h, w = raw.shape
    in_dtype = raw.dtype
    x = raw.astype(jnp.float32)

    yy = jnp.arange(h)[:, None] % 2
    xx = jnp.arange(w)[None, :] % 2
    (ry, rx), (by, bx) = _PATTERNS[pattern]
    r_mask = ((yy == ry) & (xx == rx)).astype(jnp.float32)
    b_mask = ((yy == by) & (xx == bx)).astype(jnp.float32)
    g_mask = 1.0 - r_mask - b_mask

    r = _interp(x * r_mask, r_mask)
    g = _interp(x * g_mask, g_mask)
    b = _interp(x * b_mask, b_mask)
    rgb = jnp.stack([r, g, b], axis=-1)
    if in_dtype == jnp.uint8:
        return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
    return rgb.astype(in_dtype)


def mosaic(rgb: jax.Array, pattern: str = "rggb") -> jax.Array:
    """Inverse op for testing: subsample an RGB image onto a Bayer CFA."""
    if pattern not in _PATTERNS:
        raise ValueError(f"unknown bayer pattern {pattern!r}")
    h, w = rgb.shape[:2]
    yy = jnp.arange(h)[:, None] % 2
    xx = jnp.arange(w)[None, :] % 2
    (ry, rx), (by, bx) = _PATTERNS[pattern]
    r_mask = (yy == ry) & (xx == rx)
    b_mask = (yy == by) & (xx == bx)
    raw = jnp.where(r_mask, rgb[:, :, 0],
                    jnp.where(b_mask, rgb[:, :, 2], rgb[:, :, 1]))
    return raw.astype(rgb.dtype)
