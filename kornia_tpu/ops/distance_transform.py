"""Euclidean distance transform — exact separable formulation for TPU.

Capability parity with the reference's kornia-imgproc
distance_transform.rs. The classic Felzenszwalb lower-envelope scan is
sequential per pixel — hostile to XLA — so the TPU formulation splits the
exact L2 EDT into:

1. a vertical nearest-zero pass expressed as two running extrema
   (cummax of masked indices), fully vectorized; then
2. a horizontal min-plus reduction
   ``D²(y, x) = min_j ((x - j)² + g(y, j)²)``
   — an O(W) reduction per output pixel shaped like a (W, W) broadcast,
   which XLA tiles onto the VPU. Rows are processed in chunks via
   ``lax.map`` to bound the (chunk, W, W) intermediate.

Exact (not chamfer-approximate): matches cv2.distanceTransform with
DIST_MASK_PRECISE up to f32 rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = 1e12  # python float: folds in-trace (device consts are pathological on axon)


def _vertical_nearest_zero_sq(zero_mask: jax.Array) -> jax.Array:
    """Per column: squared distance to the nearest zero pixel above/below."""
    h, w = zero_mask.shape
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    # index of most recent zero at or above (running max of masked iota)
    above = jax.lax.cummax(jnp.where(zero_mask, rows, -(2 ** 30)), axis=0)
    # index of nearest zero at or below (running min, reversed cummax)
    below = -jax.lax.cummax(
        jnp.where(zero_mask, -rows, -(2 ** 30)), axis=0, reverse=True)
    d_up = (rows - above).astype(jnp.float32)
    d_dn = (below - rows).astype(jnp.float32)
    d = jnp.minimum(jnp.abs(d_up), jnp.abs(d_dn))
    return jnp.where(d >= 2 ** 29, _INF, d * d)


@partial(jax.jit, static_argnames=("row_chunk",))
def distance_transform(mask: jax.Array, row_chunk: int = 32) -> jax.Array:
    """Exact L2 distance from each nonzero pixel to the nearest zero pixel.

    Args:
        mask: (H, W); distance is measured from pixels where ``mask != 0``
            to the nearest pixel where ``mask == 0`` (cv2 semantics).
        row_chunk: rows per min-plus block (memory/parallelism knob).

    Returns:
        (H, W) float32 distances (0 on zero pixels; +inf-free: if the
        image has no zero pixel, returns a large finite sentinel).
    """
    if mask.ndim != 2:
        raise ValueError(f"mask must be (H, W), got {mask.shape}")
    h, w = mask.shape
    zero = mask == 0
    g2 = _vertical_nearest_zero_sq(zero)  # (H, W) squared vertical dist

    cols = jnp.arange(w, dtype=jnp.float32)
    # (W, W) squared horizontal offsets, built once
    dx2 = (cols[:, None] - cols[None, :]) ** 2

    pad_h = (-h) % row_chunk
    g2p = jnp.pad(g2, ((0, pad_h), (0, 0)), constant_values=_INF)
    chunks = g2p.reshape(-1, row_chunk, w)

    def one_chunk(gc):
        # gc: (row_chunk, W). out[r, x] = min_j dx2[x, j] + gc[r, j]
        return jnp.min(gc[:, None, :] + dx2[None, :, :], axis=-1)

    d2 = jax.lax.map(one_chunk, chunks).reshape(-1, w)[:h]
    return jnp.sqrt(jnp.minimum(d2, _INF))
