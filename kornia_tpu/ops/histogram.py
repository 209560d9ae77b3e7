"""Histograms (reference: kornia-imgproc/src/histogram.rs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram_u8(img: jax.Array, nbins: int = 256) -> jax.Array:
    """Per-image intensity histogram for u8 data, int32 counts."""
    flat = img.reshape(-1).astype(jnp.int32)
    if nbins != 256:
        flat = (flat * nbins) // 256
    return jnp.bincount(flat, length=nbins)


def histogram(img: jax.Array, nbins: int, lo: float = 0.0, hi: float = 1.0) -> jax.Array:
    """Float histogram over [lo, hi)."""
    x = img.reshape(-1).astype(jnp.float32)
    idx = jnp.clip(((x - lo) / (hi - lo) * nbins).astype(jnp.int32), 0, nbins - 1)
    return jnp.bincount(idx, length=nbins)
