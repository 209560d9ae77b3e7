"""Packed / planar video-format conversions
(reference: kornia-imgproc/src/color/yuv.rs — Q20 BT.601 integer math).

NV12/NV21/I420/YV12 (planar, 4:2:0) and YUYV/UYVY/YVYU (packed, 4:2:2)
→ RGB. Uses limited-range BT.601 (ITU-R studio swing), like cv2's
COLOR_YUV2RGB_NV12 family. Chroma is upsampled by replication (cv2
semantics), and the math runs in f32 on the VPU — the reference's Q20
fixed-point exists to avoid scalar float cost on ARM, which doesn't apply
on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# BT.601 limited-range coefficients (cv2 ITU-R constants).
_Y_COEF = 1.163999557
_RV = 1.59599304
_GU = -0.390999794
_GV = -0.812999725
_BU = 2.017999649


def _ycbcr_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    yf = (y.astype(jnp.float32) - 16.0) * _Y_COEF
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    r = yf + _RV * vf
    g = yf + _GU * uf + _GV * vf
    b = yf + _BU * uf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def _upsample2(c: jax.Array) -> jax.Array:
    """(H/2, W/2) chroma → (H, W) by replication."""
    return jnp.repeat(jnp.repeat(c, 2, axis=-1), 2, axis=-2)


def rgb_from_nv12(y_plane: jax.Array, uv_plane: jax.Array) -> jax.Array:
    """NV12: (H, W) luma + (H/2, W/2, 2) interleaved UV → (H, W, 3) RGB u8."""
    if uv_plane.ndim == 2:  # packed rows (H/2, W) with UVUV...
        uv_plane = uv_plane.reshape(uv_plane.shape[0], uv_plane.shape[1] // 2, 2)
    u = _upsample2(uv_plane[..., 0])
    v = _upsample2(uv_plane[..., 1])
    return _ycbcr_to_rgb(y_plane, u, v)


def rgb_from_nv21(y_plane: jax.Array, vu_plane: jax.Array) -> jax.Array:
    if vu_plane.ndim == 2:
        vu_plane = vu_plane.reshape(vu_plane.shape[0], vu_plane.shape[1] // 2, 2)
    v = _upsample2(vu_plane[..., 0])
    u = _upsample2(vu_plane[..., 1])
    return _ycbcr_to_rgb(y_plane, u, v)


def rgb_from_i420(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """I420: separate (H, W), (H/2, W/2), (H/2, W/2) planes."""
    return _ycbcr_to_rgb(y, _upsample2(u), _upsample2(v))


def rgb_from_yv12(y: jax.Array, v: jax.Array, u: jax.Array) -> jax.Array:
    return rgb_from_i420(y, u, v)


def _packed422(data: jax.Array, y_idx: Tuple[int, int], u_idx: int, v_idx: int) -> jax.Array:
    """(H, W*2) byte rows of 4-byte macro-pixels → (H, W, 3) RGB."""
    h = data.shape[0]
    quads = data.reshape(h, -1, 4)
    y = jnp.stack([quads[..., y_idx[0]], quads[..., y_idx[1]]], axis=-1).reshape(h, -1)
    u = jnp.repeat(quads[..., u_idx], 2, axis=-1)
    v = jnp.repeat(quads[..., v_idx], 2, axis=-1)
    return _ycbcr_to_rgb(y, u, v)


def rgb_from_yuyv(data: jax.Array) -> jax.Array:
    """YUYV (YUY2): bytes Y0 U Y1 V."""
    return _packed422(data, (0, 2), 1, 3)


def rgb_from_uyvy(data: jax.Array) -> jax.Array:
    """UYVY: bytes U Y0 V Y1."""
    return _packed422(data, (1, 3), 0, 2)


def rgb_from_yvyu(data: jax.Array) -> jax.Array:
    """YVYU: bytes Y0 V Y1 U."""
    return _packed422(data, (0, 2), 3, 1)


def nv12_from_rgb(rgb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """RGB u8 → (Y, interleaved UV) planes, BT.601 limited range."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    u = 128.0 - 0.148223 * r - 0.290993 * g + 0.439216 * b
    v = 128.0 + 0.439216 * r - 0.367788 * g - 0.071427 * b
    yq = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
    # 2×2 average-subsample chroma
    h, w = u.shape[-2], u.shape[-1]
    u2 = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v2 = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    uv = jnp.stack([u2, v2], axis=-1)
    uvq = jnp.clip(jnp.round(uv), 0, 255).astype(jnp.uint8)
    return yq, uvq
