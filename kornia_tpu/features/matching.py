"""Descriptor matching (reference: kornia-imgproc/src/features/match.rs).

MXU-native Hamming matching: for bit descriptors a, b ∈ {0,1}^256,
``hamming(a, b) = |a| + |b| − 2·a·b`` — the full N×M distance matrix is one
integer matmul (the reference's NEON popcount loops, match.rs:7, become a
single MXU contraction). Lowe-ratio + cross-check are fixed-shape argmin
post-passes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1 << 16


class Matches(NamedTuple):
    """Fixed-capacity matches: for each query i, ``idx[i]`` is the matched
    train index (or -1) — a dense assignment, never a compacted list."""

    idx: jax.Array    # (N,) int32 index into train set, -1 = unmatched
    dist: jax.Array   # (N,) float32 best distance
    mask: jax.Array   # (N,) bool valid match


def hamming_distance_matrix(
    a_bits: jax.Array, b_bits: jax.Array,
    a_mask: Optional[jax.Array] = None, b_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(N, 256) × (M, 256) {0,1} → (N, M) int32 Hamming distances.

    Invalid rows (mask False) get distance _BIG.
    """
    # bf16 is EXACT here (operands are 0/1, products 0/1, per-pair sums
    # ≤ 256 — all within the 8-bit mantissa) and runs one MXU pass
    # instead of the 3-pass f32-highest the package default forces.
    af = a_bits.astype(jnp.bfloat16)
    bf = b_bits.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        af, bf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (N, M)
    na = jnp.sum(a_bits.astype(jnp.float32), axis=1, keepdims=True)
    nb = jnp.sum(b_bits.astype(jnp.float32), axis=1, keepdims=True).T
    d = (na + nb - 2.0 * dots).astype(jnp.int32)
    if a_mask is not None:
        d = jnp.where(a_mask[:, None], d, _BIG)
    if b_mask is not None:
        d = jnp.where(b_mask[None, :], d, _BIG)
    return d


def match_descriptors(
    a_bits: jax.Array,
    b_bits: jax.Array,
    a_mask: Optional[jax.Array] = None,
    b_mask: Optional[jax.Array] = None,
    max_distance: float = 64.0,
    ratio: Optional[float] = 0.75,
    cross_check: bool = True,
) -> Matches:
    """Lowe-ratio + cross-check matcher
    (reference match_descriptors, match.rs:98)."""
    d = hamming_distance_matrix(a_bits, b_bits, a_mask, b_mask)  # (N, M)

    # two smallest along axis 1 via top_k on negative
    neg = -d
    top2, idx2 = jax.lax.top_k(neg, 2)
    best = -top2[:, 0]
    second = -top2[:, 1]
    best_idx = idx2[:, 0]

    ok = best <= max_distance
    if ratio is not None:
        ok = ok & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    if cross_check:
        b_best = jnp.argmin(d, axis=0)  # (M,)
        ok = ok & (b_best[best_idx] == jnp.arange(d.shape[0]))

    return Matches(
        idx=jnp.where(ok, best_idx, -1),
        dist=best.astype(jnp.float32),
        mask=ok,
    )


def match_descriptors_f32(
    a: jax.Array, b: jax.Array, ratio: Optional[float] = 0.8, cross_check: bool = True,
    a_mask: Optional[jax.Array] = None, b_mask: Optional[jax.Array] = None,
) -> Matches:
    """L2 matcher for float descriptors (reference match_descriptors_f32,
    match.rs:225). ‖a−b‖² = |a|² + |b|² − 2ab — again one matmul."""
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True).T
    d = jnp.maximum(na + nb - 2.0 * dots, 0.0)
    if a_mask is not None:
        d = jnp.where(a_mask[:, None], d, jnp.inf)
    if b_mask is not None:
        d = jnp.where(b_mask[None, :], d, jnp.inf)
    top2, idx2 = jax.lax.top_k(-d, 2)
    best = jnp.sqrt(-top2[:, 0])
    second = jnp.sqrt(jnp.maximum(-top2[:, 1], 0.0))
    best_idx = idx2[:, 0]
    ok = jnp.isfinite(best)
    if ratio is not None:
        ok = ok & (best <= ratio * second)
    if cross_check:
        b_best = jnp.argmin(d, axis=0)
        ok = ok & (b_best[best_idx] == jnp.arange(d.shape[0]))
    return Matches(idx=jnp.where(ok, best_idx, -1), dist=best, mask=ok)


def matched_points(
    xy_a: jax.Array, xy_b: jax.Array, matches: Matches
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather matched coordinate pairs, fixed shape (N, 2) + validity mask."""
    idx = jnp.maximum(matches.idx, 0)
    return xy_a, xy_b[idx], matches.mask


def match_by_projection(
    points3d: jax.Array,
    point_desc_bits: jax.Array,
    pose7: jax.Array,
    k: jax.Array,
    frame_xy: jax.Array,
    frame_desc_bits: jax.Array,
    radius_px: float = 15.0,
    max_distance: float = 64.0,
    point_mask: Optional[jax.Array] = None,
    frame_mask: Optional[jax.Array] = None,
) -> Matches:
    """SLAM-style projection-guided matching (reference
    match_orb_by_projection, match.rs:413): each map point is projected
    into the frame with the predicted pose and matched only against
    keypoints inside a ``radius_px`` window — the Hamming matmul with a
    spatial gate folded into the distance matrix.

    points3d: (P, 3) world; point_desc_bits: (P, 256) {0,1};
    pose7: (7,) world→camera; frame_xy: (N, 2); frame_desc_bits (N, 256).
    Returns Matches over map points (idx into the frame keypoints).
    """
    from kornia_tpu.geometry import liegroup as lg

    cam = lg.se3_apply(pose7[None], points3d)
    z = cam[..., 2]
    uv = cam[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-9, 1e-9,
                                  z[..., None])
    uv = uv * jnp.stack([k[0, 0], k[1, 1]]) + jnp.stack([k[0, 2], k[1, 2]])

    d = hamming_distance_matrix(point_desc_bits, frame_desc_bits,
                                a_mask=point_mask, b_mask=frame_mask)
    sq = jnp.sum((uv[:, None, :] - frame_xy[None, :, :]) ** 2, axis=-1)
    gate = (sq <= radius_px * radius_px) & (z[:, None] > 1e-6)
    d = jnp.where(gate, d, _BIG)

    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    ok = dmin <= max_distance
    # one keypoint serves at most one map point: keep the closest claimant
    owner_dist = jnp.full(frame_xy.shape[0], jnp.inf).at[
        jnp.where(ok, best, 0)].min(jnp.where(ok, dmin, jnp.inf))
    ok = ok & (dmin <= owner_dist[best])
    return Matches(
        idx=jnp.where(ok, best, -1),
        dist=dmin.astype(jnp.float32),
        mask=ok,
    )


def unpack_descriptor_bits(packed: jax.Array) -> jax.Array:
    """(N, 32) u8 packed (np.packbits order, MSB first) → (N, 256) u8
    {0,1} bits — pure shifts, runs on device."""
    p = packed.astype(jnp.int32)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    bits = (p[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], packed.shape[1] * 8).astype(
        jnp.uint8)


def match_descriptors_packed(
    a_packed: jax.Array,
    b_packed: jax.Array,
    a_mask: Optional[jax.Array] = None,
    b_mask: Optional[jax.Array] = None,
    max_distance: float = 64.0,
    ratio: Optional[float] = 0.75,
    cross_check: bool = True,
) -> Matches:
    """Lowe-ratio + cross-check matcher over PACKED u8 descriptors —
    the SLAM-loop entry (unpack + popcount matmul in one program).

    Replaces the host np.bitwise_count O(N*M) loop the round-1 SLAM
    tracker used (~100 ms/frame at 1000x2000); this is one MXU pass
    (~0.1 ms) plus fixed-shape argmin post-passes.
    """
    return match_descriptors(
        unpack_descriptor_bits(a_packed), unpack_descriptor_bits(b_packed),
        a_mask=a_mask, b_mask=b_mask, max_distance=max_distance,
        ratio=ratio, cross_check=cross_check)
