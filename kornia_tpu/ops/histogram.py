"""Histograms (reference: kornia-imgproc/src/histogram.rs).

TPU formulation history: ``bincount`` lowers to a scatter-add (scalar
rate, 18 ms at 1080p); a fused compare-and-reduce (``counts[b] =
Σ (x == b)``) is exact at 0.52 ms but compare-bound (nbins compares per
pixel). The current form factors the bin index into two 4-bit digits
and contracts their one-hots on the MXU:

    counts[16h + l] = Σ_i 1[hi_i = h] · 1[lo_i = l] = (Hᵀ L)[h, l]

with H, L the (N, 16) digit one-hots in bf16 (0/1 values are bf16-exact)
accumulated in f32 (exact for N ≤ 2²⁴). XLA fuses the one-hot
construction into the dot's operand reads, so the cost is 32 compares +
one tiny matmul per pixel-tile: 0.068 ms at 1080p, slope-measured —
2.8× the reference's CUDA histogram (0.194 ms, BASELINE.md [A]) and
exact (tests assert equality with np.bincount).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _digit_matmul_counts(idx: jax.Array, valid_bins: int) -> jax.Array:
    """counts over [0, 256) via the 16×16 digit-one-hot contraction.

    idx: (N,) int32 in [0, 256). Returns (256,) int32; callers slice to
    their bin count (indices must already be < valid_bins).
    """
    hi = idx >> 4
    lo = idx & 15
    vals = jnp.arange(16, dtype=jnp.int32)
    h = (hi[:, None] == vals[None, :]).astype(jnp.bfloat16)
    l = (lo[:, None] == vals[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        h, l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return counts.reshape(256).astype(jnp.int32)[:valid_bins]


def histogram_u8(img: jax.Array, nbins: int = 256) -> jax.Array:
    """Per-image intensity histogram for u8 data, int32 counts."""
    flat = img.reshape(-1).astype(jnp.int32)
    if nbins != 256:
        flat = (flat * nbins) // 256
    return _digit_matmul_counts(flat, nbins)


def histogram(img: jax.Array, nbins: int, lo: float = 0.0,
              hi: float = 1.0) -> jax.Array:
    """Float histogram over [lo, hi); nbins <= 256 rides the digit
    contraction, larger bin counts use a 256-way high digit."""
    x = img.reshape(-1).astype(jnp.float32)
    idx = jnp.clip(((x - lo) / (hi - lo) * nbins).astype(jnp.int32),
                   0, nbins - 1)
    if nbins <= 256:
        return _digit_matmul_counts(idx, nbins)
    # two-level: 256 coarse x 256 fine (supports nbins <= 65536)
    coarse = idx >> 8
    fine = idx & 255
    vals = jnp.arange(256, dtype=jnp.int32)
    h = (coarse[:, None] == vals[None, :]).astype(jnp.bfloat16)
    l = (fine[:, None] == vals[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        h, l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return counts.reshape(-1).astype(jnp.int32)[:nbins]
