"""Spatial filtering (reference: kornia-imgproc/src/filter/).

Separable filters (gaussian / box / sobel) are expressed as two 1-D
convolutions lowered through ``lax.conv_general_dilated`` in NHWC — XLA maps
these onto the MXU/VPU and fuses surrounding elementwise work. Median and
bilateral are small-window dense formulations (sorting networks become
``jnp.sort`` over a patch axis; bilateral is a sum over static offsets).
Border handling is reflect-101 (cv2 BORDER_REFLECT_101 default) unless noted.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _pad_reflect101(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Pad (..., H, W, C) spatially with cv2 BORDER_REFLECT_101."""
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, pad, mode="reflect")


def _pad_replicate(x: jax.Array, ph: int, pw: int) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, pad, mode="edge")


_PAD = {"reflect": _pad_reflect101, "replicate": _pad_replicate}


# cv2's small_gaussian_tab: fixed kernels used when sigma <= 0
_CV2_FIXED_GAUSS = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125], np.float32),
}


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel-compatible 1-D kernel (float64→float32)."""
    if sigma <= 0 and ksize in _CV2_FIXED_GAUSS:
        return _CV2_FIXED_GAUSS[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _conv_sep(x: jax.Array, ky: np.ndarray, kx: np.ndarray, border: str = "reflect") -> jax.Array:
    """Depthwise separable 2-D convolution of (..., H, W, C), float32 out.

    Implemented as static shifted adds, NOT lax.conv: XLA lowers small
    depthwise convolutions on TPU through a pathological path (measured
    68 ms for a 5×5 at 1080p vs ≈0.1 ms for the shift-add form, which
    fuses into one bandwidth-bound VPU pass — PERF_NOTES.md).
    """
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.astype(jnp.float32).reshape((-1, h, w, c))
    ph, pw = len(ky) // 2, len(kx) // 2
    xf = _PAD[border](xf, ph, pw)

    out = None
    for i, kv in enumerate(np.asarray(ky, np.float64)):
        term = xf[:, i: i + h, :, :] * jnp.float32(kv)
        out = term if out is None else out + term
    out2 = None
    for j, kv in enumerate(np.asarray(kx, np.float64)):
        term = out[:, :, j: j + w, :] * jnp.float32(kv)
        out2 = term if out2 is None else out2 + term
    return out2.reshape(lead + (h, w, c))


def _finalize(out: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    if dtype == jnp.uint16:
        return jnp.clip(jnp.round(out), 0, 65535).astype(jnp.uint16)
    return out.astype(dtype)


def _with_channels(img):
    if img.ndim == 2:
        return img[..., None], True
    return img, False


def gaussian_blur(
    img: jax.Array, ksize: Tuple[int, int], sigma: Tuple[float, float] | float = 0.0,
    border: str = "reflect",
) -> jax.Array:
    """cv2.GaussianBlur semantics; preserves dtype (u8 rounds)."""
    x, squeeze = _with_channels(img)
    if isinstance(sigma, (int, float)):
        sigma = (float(sigma), float(sigma))
    ky = gaussian_kernel1d(ksize[1], sigma[1])  # vertical uses ksize_y
    kx = gaussian_kernel1d(ksize[0], sigma[0])
    out = _finalize(_conv_sep(x, ky, kx, border), img.dtype)
    return out[..., 0] if squeeze else out


def box_blur(img: jax.Array, ksize: Tuple[int, int], border: str = "reflect") -> jax.Array:
    x, squeeze = _with_channels(img)
    ky = np.full(ksize[1], 1.0 / ksize[1], np.float32)
    kx = np.full(ksize[0], 1.0 / ksize[0], np.float32)
    out = _finalize(_conv_sep(x, ky, kx, border), img.dtype)
    return out[..., 0] if squeeze else out


# cv2.getDerivKernels 1st-order pairs (deriv, smooth) per aperture:
# smooth = binomial row of order ksize-1; deriv = binomial ⊛ [-1, 0, 1]
_SOBEL = {
    1: (np.array([-1.0, 0.0, 1.0], np.float32),
        np.array([1.0], np.float32)),
    3: (np.array([-1.0, 0.0, 1.0], np.float32),
        np.array([1.0, 2.0, 1.0], np.float32)),
    5: (np.array([-1.0, -2.0, 0.0, 2.0, 1.0], np.float32),
        np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)),
    7: (np.array([-1.0, -4.0, -5.0, 0.0, 5.0, 4.0, 1.0], np.float32),
        np.array([1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0], np.float32)),
}


def sobel(img: jax.Array, dx: int, dy: int, ksize: int = 3) -> jax.Array:
    """First-order Sobel derivative, float32 output (cv2.Sobel CV_32F);
    apertures 1/3/5/7 (cv2.getDerivKernels binomial construction)."""
    x, squeeze = _with_channels(img)
    if ksize not in _SOBEL:
        raise ValueError(f"sobel ksize must be one of {sorted(_SOBEL)}, "
                         f"got {ksize}")
    deriv, smooth = _SOBEL[ksize]
    ky = deriv if dy else smooth
    kx = deriv if dx else smooth
    out = _conv_sep(x, ky, kx, "reflect")
    return out[..., 0] if squeeze else out


def spatial_gradient(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(gx, gy) float32 Sobel gradients — the front-end's workhorse."""
    return sobel(img, 1, 0), sobel(img, 0, 1)


def laplacian(img: jax.Array, ksize: int = 3) -> jax.Array:
    x, squeeze = _with_channels(img)
    xf = x.astype(jnp.float32)
    p = _pad_reflect101(xf.reshape((-1,) + x.shape[-3:]), 1, 1)
    out = (
        p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2] + p[:, 1:-1, 2:]
        - 4.0 * p[:, 1:-1, 1:-1]
    ).reshape(xf.shape)
    return out[..., 0] if squeeze else out


def filter2d(img: jax.Array, kernel: jax.Array, border: str = "reflect") -> jax.Array:
    """General 2-D correlation (cv2.filter2D). kernel: (kh, kw)."""
    x, squeeze = _with_channels(img)
    kh, kw = kernel.shape
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.astype(jnp.float32).reshape((-1, h, w, c))
    xf = _PAD[border](xf, kh // 2, kw // 2)
    # shift-add, not lax.conv (see _conv_sep): traced kernel values keep
    # this jittable with runtime kernels while the loop stays static
    kf = jnp.asarray(kernel, jnp.float32)
    out = None
    for dy in range(kh):
        for dx in range(kw):
            term = xf[:, dy: dy + h, dx: dx + w, :] * kf[dy, dx]
            out = term if out is None else out + term
    out = out.reshape(lead + (h, w, c))
    out = _finalize(out, img.dtype)
    return out[..., 0] if squeeze else out


def _extract_patches(x: jax.Array, k: int, border: str = "reflect") -> jax.Array:
    """(N, H, W, C) → (N, H, W, C, k*k) static-offset patch stack."""
    p = _PAD[border](x, k // 2, k // 2)
    h, w = x.shape[-3], x.shape[-2]
    slices = []
    for dy in range(k):
        for dx in range(k):
            slices.append(p[..., dy : dy + h, dx : dx + w, :])
    return jnp.stack(slices, axis=-1)


def _median9_network(p):
    """Paeth's 19-exchange median-of-9 network over 9 same-shape
    arrays — pure elementwise min/max at VPU rate (the reference's
    filter/median.rs sorting-network stance; jnp.median's general
    sort measured 3.5 ms at 1080p vs ~0.3 ms for the network)."""
    p = list(p)

    def s(i, j):
        lo = jnp.minimum(p[i], p[j])
        hi = jnp.maximum(p[i], p[j])
        p[i], p[j] = lo, hi

    s(1, 2); s(4, 5); s(7, 8)
    s(0, 1); s(3, 4); s(6, 7)
    s(1, 2); s(4, 5); s(7, 8)
    s(0, 3); s(5, 8); s(4, 7)
    s(3, 6); s(1, 4); s(2, 5)
    s(4, 7); s(4, 2); s(6, 4)
    s(4, 2)
    return p[4]


def median_blur(img: jax.Array, ksize: int) -> jax.Array:
    """Median filter — the reference's sorting networks (filter/median.rs):
    ksize=3 runs the 19-exchange median-of-9 network; larger apertures
    sort over the static patch axis."""
    x, squeeze = _with_channels(img)
    lead = x.shape[:-3]
    xr = x.reshape((-1,) + x.shape[-3:])
    if ksize == 3:
        p = _PAD["replicate"](xr, 1, 1)
        h, w = xr.shape[-3], xr.shape[-2]
        taps = [p[..., dy: dy + h, dx: dx + w, :]
                for dy in range(3) for dx in range(3)]
        med = _median9_network(taps).astype(img.dtype)
    else:
        patches = _extract_patches(xr, ksize, "replicate")
        med = jnp.median(patches, axis=-1).astype(img.dtype)
    out = med.reshape(lead + x.shape[-3:])
    return out[..., 0] if squeeze else out


def bilateral_blur(
    img: jax.Array, d: int, sigma_color: float, sigma_space: float
) -> jax.Array:
    """cv2.bilateralFilter semantics (reference filter/bilateral.rs)."""
    x, squeeze = _with_channels(img)
    lead = x.shape[:-3]
    xr = x.astype(jnp.float32).reshape((-1,) + x.shape[-3:])
    if d <= 0:
        d = int(round(sigma_space * 1.5)) * 2 + 1
    r = d // 2
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    space_w = np.exp(-(xx * xx + yy * yy) / (2.0 * sigma_space * sigma_space)).astype(np.float32)
    mask = (xx * xx + yy * yy) <= r * r  # cv2 uses a circular window
    space_w = space_w * mask
    patches = _extract_patches(xr, d, "replicate")  # (N,H,W,C,d*d)
    center = xr[..., None]
    diff = patches - center
    cw = jnp.exp(-(diff * diff) / (2.0 * sigma_color * sigma_color))
    wgt = cw * jnp.asarray(space_w.reshape(-1), jnp.float32)
    out = jnp.sum(patches * wgt, axis=-1) / jnp.sum(wgt, axis=-1)
    out = _finalize(out.reshape(lead + x.shape[-3:]), img.dtype)
    return out[..., 0] if squeeze else out
