"""Normalization ops (reference: kornia-imgproc/src/normalize.rs).

``normalize_mean_std`` is the DNN-preprocess normalize the reference clocks
at 17.8× cv2 (benchmarks.md): on TPU it's a fused elementwise chain XLA
compiles into one pass.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def normalize_mean_std(
    img: jax.Array, mean: Sequence[float], std: Sequence[float]
) -> jax.Array:
    """(x - mean) / std per channel; u8 input is first scaled to [0,1]."""
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x * (1.0 / 255.0)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def denormalize_mean_std(
    img: jax.Array, mean: Sequence[float], std: Sequence[float]
) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return img * std + mean


def normalize_min_max(img: jax.Array, lo: float = 0.0, hi: float = 1.0) -> jax.Array:
    """Affine-rescale to [lo, hi] (reference normalize.rs normalize_min_max)."""
    x = img.astype(jnp.float32)
    xmin = jnp.min(x)
    xmax = jnp.max(x)
    scale = (hi - lo) / jnp.maximum(xmax - xmin, 1e-12)
    return (x - xmin) * scale + lo
