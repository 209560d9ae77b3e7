"""Adaptive tile threshold for AprilTag detection — dense, jittable.

Reference behavior: kornia-apriltag/src/threshold.rs (adaptive threshold
with per-tile min/max and a min white/black split; pixels in
low-contrast tiles become "unknown"). The TPU formulation is pure
reshapes + reductions + a 3×3 tile-neighborhood min/max — one fused XLA
program, no Pallas needed (bandwidth-bound elementwise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

UNKNOWN = 127  # low-contrast marker (skipped by segmentation)


@partial(jax.jit,
         static_argnames=("tile", "min_white_black_diff", "split"))
def adaptive_threshold(gray: jax.Array, tile: int = 4,
                       min_white_black_diff: int = 5,
                       split: float = 0.5) -> jax.Array:
    """Threshold a (H, W) u8 image into {0, UNKNOWN, 255}.

    Tiles of `tile` px compute min/max, extrema are dilated over the 3×3
    tile neighborhood, and each pixel splits at min + (max−min)·split.
    ``split=0.5`` is the classic AprilTag midpoint; lower values bias
    toward white, preserving thin quiet-zone margins so a tag's black
    border does not merge with neighbouring dark regions (reference
    threshold.rs adaptive_threshold_with_split; the decoder default is
    0.33 via DetectorConfig). Tiles whose neighborhood contrast is
    below `min_white_black_diff` emit UNKNOWN. H and W are cropped to
    tile multiples internally and the edge is padded back with UNKNOWN
    (matching the reference's skip-edges behavior).
    """
    if gray.ndim == 3:
        gray = gray[..., 0]
    h, w = gray.shape
    th, tw = h // tile, w // tile
    g = gray[: th * tile, : tw * tile].astype(jnp.uint8)
    tiles = g.reshape(th, tile, tw, tile)
    tmin = tiles.min(axis=(1, 3))
    tmax = tiles.max(axis=(1, 3))

    # 3×3 neighborhood min/max over tiles (separable)
    def nbr(x, reduce_fn):
        p = jnp.pad(x, 1, mode="edge")
        v = reduce_fn(jnp.stack([p[:-2, 1:-1], p[1:-1, 1:-1], p[2:, 1:-1]]),
                      axis=0)
        p = jnp.pad(v, 1, mode="edge")
        return reduce_fn(jnp.stack([p[1:-1, :-2], p[1:-1, 1:-1],
                                    p[1:-1, 2:]]), axis=0)

    nmin = nbr(tmin, jnp.min)
    nmax = nbr(tmax, jnp.max)
    contrast_ok = (nmax.astype(jnp.int16) - nmin.astype(jnp.int16)
                   >= min_white_black_diff)
    s = float(min(max(split, 0.0), 1.0))
    diff = nmax.astype(jnp.float32) - nmin.astype(jnp.float32)
    thresh = (nmin.astype(jnp.float32) + diff * s).astype(jnp.int16)

    px_thresh = jnp.repeat(jnp.repeat(thresh, tile, 0), tile, 1)
    px_ok = jnp.repeat(jnp.repeat(contrast_ok, tile, 0), tile, 1)
    binary = jnp.where(g.astype(jnp.int16) > px_thresh, 255, 0)
    out = jnp.where(px_ok, binary, UNKNOWN).astype(jnp.uint8)
    return jnp.pad(out, ((0, h - th * tile), (0, w - tw * tile)),
                   constant_values=UNKNOWN)
