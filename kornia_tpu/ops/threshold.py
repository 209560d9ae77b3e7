"""Thresholding (reference: kornia-imgproc/src/threshold.rs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kornia_tpu.ops.filters import box_blur, gaussian_blur


def threshold_binary(img: jax.Array, thresh: float, maxval: float) -> jax.Array:
    return jnp.where(img.astype(jnp.float32) > thresh, maxval, 0).astype(img.dtype)


def threshold_binary_inverse(img: jax.Array, thresh: float, maxval: float) -> jax.Array:
    return jnp.where(img.astype(jnp.float32) > thresh, 0, maxval).astype(img.dtype)


def threshold_truncate(img: jax.Array, thresh: float) -> jax.Array:
    return jnp.minimum(img, jnp.asarray(thresh, img.dtype))


def threshold_to_zero(img: jax.Array, thresh: float) -> jax.Array:
    return jnp.where(img.astype(jnp.float32) > thresh, img, 0).astype(img.dtype)


def threshold_to_zero_inverse(img: jax.Array, thresh: float) -> jax.Array:
    return jnp.where(img.astype(jnp.float32) > thresh, 0, img).astype(img.dtype)


def otsu_threshold(gray: jax.Array) -> jax.Array:
    """Otsu's threshold on u8 grayscale; returns the scalar threshold."""
    hist = jnp.bincount(gray.reshape(-1).astype(jnp.int32), length=256).astype(jnp.float32)
    p = hist / jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(p)
    mu = jnp.cumsum(p * bins)
    mu_t = mu[-1]
    w1 = 1.0 - w0
    denom = jnp.where((w0 > 0) & (w1 > 0), w0 * w1, 1.0)
    sigma_b = jnp.where((w0 > 0) & (w1 > 0), (mu_t * w0 - mu) ** 2 / denom, 0.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)


def adaptive_threshold(
    gray: jax.Array,
    maxval: float = 255.0,
    method: str = "mean",
    block_size: int = 11,
    c: float = 2.0,
    inverse: bool = False,
) -> jax.Array:
    """cv2.adaptiveThreshold (mean / gaussian neighborhood)."""
    x = gray.astype(jnp.float32)[..., None]
    if method == "mean":
        m = box_blur(x, (block_size, block_size), border="replicate")[..., 0]
    elif method == "gaussian":
        m = gaussian_blur(x, (block_size, block_size), 0.0, border="replicate")[..., 0]
    else:
        raise ValueError(method)
    cond = gray.astype(jnp.float32) > (m - c)
    if inverse:
        cond = ~cond
    return jnp.where(cond, maxval, 0).astype(gray.dtype)
