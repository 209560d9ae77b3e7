"""FAST corner detection (reference: kornia-imgproc/src/features/fast.rs).

TPU-first formulation: the reference's per-row NEON chain-counter arc test
(fast.rs:200,505) becomes a *dense* program — all 16 Bresenham-circle
neighbors are static shifts of the image, the "≥N contiguous" test is an
AND-reduce over N circular rotations of the bright/dark masks, and NMS is a
max-pool equality. Keypoint extraction is a fixed-size top-k (scores are
-inf outside corners), never a data-dependent compaction.

Score matches cv2's FAST score semantics: the highest threshold at which the
pixel remains a corner, computed in closed form from arc minima/maxima.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# 16-point Bresenham circle of radius 3, clockwise from 12 o'clock
# ((dy, dx) offsets) — the standard FAST-16 ring.
_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _ring_stack(gray_f: jax.Array) -> jax.Array:
    """(H, W) → (16, H, W) of ring-neighbor values (zero-padded borders)."""
    h, w = gray_f.shape
    p = jnp.pad(gray_f, 3)
    return jnp.stack([p[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dy, dx in _RING])


def fast_score(gray: jax.Array, threshold: float = 10.0, arc_length: int = 9) -> jax.Array:
    """Dense FAST corner response (0 where not a corner).

    Returns float32 (H, W). Score = max threshold keeping the corner
    (cv2-compatible V measure).
    """
    x = gray.astype(jnp.float32)
    ring = _ring_stack(x)  # (16, H, W)
    center = x[None]
    diff = ring - center  # (16, H, W)

    n = arc_length
    # For each of the 16 possible arc start positions, the min over the arc
    # of `diff` (bright case) / max (dark case). Rolling AND == rolling
    # min/max over n consecutive ring entries, via log-step doubling
    # (idempotent ops make the final overlapping roll exact): 4 rolls
    # instead of 8 at n = 9.
    def arc_reduce(v, op):
        acc = v
        c = 1
        while 2 * c <= n:
            acc = op(acc, jnp.roll(acc, -c, axis=0))
            c *= 2
        if c < n:
            acc = op(acc, jnp.roll(acc, -(n - c), axis=0))
        return acc  # (16,H,W): entry i = reduce over arc starting at i

    arc_min = arc_reduce(diff, jnp.minimum)   # bright arcs: min(ring - c)
    arc_max = arc_reduce(diff, jnp.maximum)   # dark arcs:   max(ring - c)
    # bright corner strength: max over arcs of (min over arc) − must exceed t
    bright = jnp.max(arc_min, axis=0)
    dark = -jnp.min(arc_max, axis=0)
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)
    # kill the 3-pixel border (ring reads zero padding there)
    h, w = x.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(valid, score, 0.0)


def nms_maxpool(score: jax.Array, radius: int = 1) -> jax.Array:
    """3×3 (or (2r+1)²) non-maximum suppression by max-pool equality."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return jnp.where(score >= pooled, score, 0.0)


class FastKeypoints(NamedTuple):
    """Fixed-capacity keypoint set; ``mask`` marks valid entries."""

    xy: jax.Array      # (K, 2) float32, (x, y)
    score: jax.Array   # (K,) float32
    mask: jax.Array    # (K,) bool


def topk_keypoints(score_map: jax.Array, k: int) -> FastKeypoints:
    """Extract the K strongest responses as fixed-shape keypoints.

    Uses the TPU-native ``approx_max_k`` with ``recall_target=0.9``:
    exact top_k over 2M scores costs 0.66 ms at 1080p and the default
    0.95 target forces a large shard reduction (0.108 ms at k=4096),
    while 0.9 runs in 0.028 ms. The analytic target is a worst-case
    bound — measured empirical recall on an adversarial dense-noise
    1080p fixture (210k NMS survivors) is 0.967, and 1.0 on natural
    images where survivors are sparse (PERF_NOTES round 5a); a ≤5%
    miss among near-tied weakest responses is immaterial to detection
    quality.
    """
    h, w = score_map.shape
    flat = score_map.reshape(-1)
    vals, idx = jax.lax.approx_max_k(flat, k, recall_target=0.9)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return FastKeypoints(
        xy=jnp.stack([xs, ys], axis=-1),
        score=vals,
        mask=vals > 0.0,
    )


def _score_dispatch(gray, threshold, arc_length):
    """fast_score with the backend-appropriate kernel: the Pallas VMEM
    stencil on TPU (the XLA lowering materializes the 16-ring (16, H, W)
    stack through HBM — ~3.5 ms/threshold at 1080p vs ~0.3 ms);
    KORNIA_TPU_FAST=xla|pallas overrides (reference KORNIA_FAST_NEON
    convention, fast.rs:200)."""
    import jax

    from kornia_tpu.utils.tracing import env_variant

    default = "pallas" if jax.default_backend() == "tpu" else "xla"
    if env_variant("fast", default) == "pallas":
        from kornia_tpu.ops.pallas_kernels import fast_score_pallas

        return fast_score_pallas(gray, threshold, arc_length)
    return fast_score(gray, threshold, arc_length)


def _score_nms_dispatch(gray, threshold, arc_length, border_mask=None):
    """score + 3×3 NMS: ONE fused Pallas pass on TPU (the separate NMS
    pass costs an 8.3 MB score-map HBM round-trip at 1080p); the XLA
    composition elsewhere. Bit-identical outputs.

    ``border_mask`` (a pallas_kernels.StaticMask, 0/1) replaces the
    image-border kill with an arbitrary region-of-interest kill — the
    cv2 ``detect(image, mask)`` analogue — applied to the score BEFORE
    the NMS, exactly like the border kill it replaces."""
    import jax

    from kornia_tpu.utils.tracing import env_variant

    default = "pallas" if jax.default_backend() == "tpu" else "xla"
    if env_variant("fast", default) == "pallas":
        from kornia_tpu.ops.pallas_kernels import fast_score_pallas

        return fast_score_pallas(gray, threshold, arc_length, nms=True,
                                 border_mask=border_mask)
    s = fast_score(gray, threshold, arc_length)
    if border_mask is not None:
        s = s * jnp.asarray(border_mask.arr)
    return nms_maxpool(s)


def fast_detect(
    gray: jax.Array,
    threshold: float = 10.0,
    max_keypoints: int = 2048,
    nms: bool = True,
    arc_length: int = 9,
) -> FastKeypoints:
    """End-to-end FAST detection (reference FastDetector::detect_direct_u8,
    fast.rs:76): dense score → NMS → top-k.

    On TPU the Pallas stencil is the default — the VMEM-resident ring
    avoids 16×(H, W) f32 HBM round-trips and runs 34× faster than the
    XLA fusion (0.20 vs 6.8 ms at 1080p, bit-identical output;
    PERF_NOTES.md). KORNIA_TPU_FAST=xla|pallas overrides — the
    reference's env-gated kernel-variant convention (KORNIA_FAST_NEON,
    fast.rs:200).
    """
    if nms:
        s = _score_nms_dispatch(gray, threshold, arc_length)
    else:
        s = _score_dispatch(gray, threshold, arc_length)
    return topk_keypoints(s, max_keypoints)


def _two_tier_select(gray, threshold_high, threshold_low, arc_length,
                     cell_size, border_mask=None):
    """NMS'd FAST score with ORB-SLAM3's two-tier per-cell threshold.

    ONE score pass + ONE NMS serve both tiers: the V measure is
    threshold-independent (score = max t keeping the corner), so
    fast_score(t_hi) ≡ gate(fast_score(t_lo), t_hi); and a pixel
    surviving the gate (score > t_hi) can only be NMS-suppressed by a
    neighbor with a LARGER score — itself above t_hi — so
    nms(s_hi) ≡ gate(nms(s_lo)) on every surviving pixel. Exact, and
    halves the detection cost (the score stencil + NMS dominate).
    Cells with any t_hi survivor use the t_hi tier, else t_lo
    (reference features/cells.rs:141-285)."""
    s_lo = _score_nms_dispatch(gray, threshold_low, arc_length,
                               border_mask=border_mask)
    return _two_tier_gate(s_lo, threshold_high, cell_size)


def _two_tier_gate(s_lo: jax.Array, threshold_high: float,
                   cell_size: int) -> jax.Array:
    """The per-cell hi/lo gating half of :func:`_two_tier_select`,
    applied to an already NMS'd low-threshold score map."""
    s_hi = jnp.where(s_lo > threshold_high, s_lo, 0.0)
    cs = cell_size
    h, w = s_lo.shape
    gy, gx = -(-h // cs), -(-w // cs)
    # Top-left-anchored cell grid: pad high edges only, so the gate's
    # cells coincide exactly with the selection cells used by
    # cell_topk_packed / the top_k path (XLA's SAME padding splits
    # low/high and would shift the grid by up to cs/2 when H or W is
    # not a multiple of cs).
    has_hi = jax.lax.reduce_window(
        s_hi, 0.0, jax.lax.max, (cs, cs), (cs, cs),
        ((0, gy * cs - h), (0, gx * cs - w))) > 0
    has_hi = jnp.repeat(jnp.repeat(has_hi, cs, 0), cs, 1)
    return jnp.where(has_hi[:h, :w], s_hi, s_lo)


def cell_topk_packed(rank: jax.Array, cell_size: int, per_cell: int):
    """Per-cell top-k without the (gy, cs, gx, cs) transpose + top_k.

    ``rank`` is an (H, W) float32 map of INTEGER values in [0, 8191]
    (0 = ineligible). Packs ``rank·2048 + (2047 − pos_in_cell)`` — exact
    in f32 up to 2²⁴ — and takes ``per_cell`` rounds of a strided
    reduce_window max + suppress. The position ride-along makes the
    per-cell argmax decodable from the max VALUE alone, so there is no
    scatter/gather and no cell-layout transpose. Selection (including
    the lowest-row-major-index tie-break) is identical to
    ``top_k(cells, per_cell)``; 4.6× faster on v5e (PERF_NOTES r4c).

    Returns (xy (C·per_cell, 2) f32, score (C·per_cell,) f32) in the
    same cells-major order as the top_k formulation. Requires
    cell_size² ≤ 2048 (pos must fit 11 bits).
    """
    if cell_size * cell_size > 2048:
        raise ValueError("cell_topk_packed needs cell_size^2 <= 2048")
    h, w = rank.shape
    cs = cell_size
    gy, gx = -(-h // cs), -(-w // cs)
    sp = jnp.pad(rank, ((0, gy * cs - h), (0, gx * cs - w)))
    hh, ww = sp.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0) % cs
    xs = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1) % cs
    pos = (2047 - (ys * cs + xs)).astype(jnp.float32)
    sp = jnp.where(sp > 0, sp * 2048.0 + pos, 0.0)
    keys = []
    for _ in range(per_cell):
        m = jax.lax.reduce_window(
            sp, 0.0, jax.lax.max, (cs, cs), (cs, cs), "VALID")
        keys.append(m)
        mup = jnp.repeat(jnp.repeat(m, cs, 0), cs, 1)
        sp = jnp.where(sp == mup, 0.0, sp)
    k = jnp.stack(keys)                              # (per_cell, gy, gx)
    score = jnp.floor(k / 2048.0)
    p = 2047.0 - (k - score * 2048.0)
    py = jnp.floor(p / cs)
    px = p - py * cs
    cyo = (jnp.arange(gy, dtype=jnp.float32) * cs)[None, :, None]
    cxo = (jnp.arange(gx, dtype=jnp.float32) * cs)[None, None, :]
    xy = jnp.stack([px + cxo, py + cyo], axis=-1)    # (per_cell, gy, gx, 2)
    xy = xy.transpose(1, 2, 0, 3).reshape(-1, 2)
    score = score.transpose(1, 2, 0).reshape(-1)
    return jnp.where(score[:, None] > 0, xy, 0.0), score


def _cell_topk_general(sel: jax.Array, cell_size: int, per_cell: int):
    """Per-cell top-k via the transpose + top_k path (any cell size).

    Same cells-major output order and lowest-index tie-break as
    :func:`cell_topk_packed`; used when cell_size² > 2048.
    """
    h, w = sel.shape
    gy = -(-h // cell_size)
    gx = -(-w // cell_size)
    ph, pw = gy * cell_size - h, gx * cell_size - w
    cells = jnp.pad(sel, ((0, ph), (0, pw))).reshape(
        gy, cell_size, gx, cell_size).transpose(0, 2, 1, 3)
    cells = cells.reshape(gy * gx, cell_size * cell_size)
    vals, idx = jax.lax.top_k(cells, per_cell)  # (C, per_cell)
    cy = jnp.arange(gy * gx) // gx
    cx = jnp.arange(gy * gx) % gx
    py = idx // cell_size + (cy * cell_size)[:, None]
    px = idx % cell_size + (cx * cell_size)[:, None]
    xy = jnp.stack([px, py], axis=-1).reshape(-1, 2).astype(jnp.float32)
    return xy, vals.reshape(-1)


def fast_detect_cells(
    gray: jax.Array,
    cell_size: int = 35,
    threshold_high: float = 20.0,
    threshold_low: float = 7.0,
    per_cell: int = 8,
    arc_length: int = 9,
) -> FastKeypoints:
    """Grid-cell detection with ORB-SLAM3's two-tier threshold
    (reference features/cells.rs:141-285): each cell first tries the high
    threshold; cells with no response fall back to the low threshold. Then
    a per-cell top-k enforces spatial uniformity (the quadtree contract).

    For u8 inputs the V measure is integer-valued, so the per-cell
    top-k runs as :func:`cell_topk_packed` (bit-identical selection,
    no transpose/top_k — 0.084 → 0.018 ms at 480p on v5e); float
    inputs keep the general top_k path.
    """
    h, w = gray.shape
    sel = _two_tier_select(gray, threshold_high, threshold_low,
                           arc_length, cell_size)

    if (gray.dtype == jnp.uint8 and cell_size * cell_size <= 2048):
        xy, score = cell_topk_packed(sel, cell_size, per_cell)
        return FastKeypoints(xy=xy, score=score, mask=score > 0.0)

    xy, score = _cell_topk_general(sel, cell_size, per_cell)
    return FastKeypoints(xy=xy, score=score, mask=score > 0.0)


def fast_harris_cells(
    gray: jax.Array,
    harris_map: jax.Array,
    cell_size: int = 35,
    threshold_high: float = 20.0,
    threshold_low: float = 7.0,
    per_cell: int = 8,
    arc_length: int = 9,
    sel: jax.Array = None,
) -> FastKeypoints:
    """FAST-gated, Harris-RANKED per-cell detection — OpenCV ORB's
    HARRIS_SCORE retainment (FAST proposes, the Harris response at each
    corner decides who survives; reference responses.rs:153 evaluates
    Harris at FAST keypoints for exactly this ranking).

    The Harris value at each NMS'd FAST corner is quantized to 13 bits
    over the per-level eligible range and ranked in-cell by
    :func:`cell_topk_packed` — no per-keypoint Harris windows, no
    second top_k. Returned score = dequantized Harris (monotone in the
    true ranking; candidates closer than range/8190 may swap,
    immaterial to retainment quality).
    """
    if sel is None:
        sel = _two_tier_select(gray, threshold_high, threshold_low,
                               arc_length, cell_size)
    eligible = sel > 0.0
    hmax = jnp.max(jnp.where(eligible, harris_map, -jnp.inf))
    hmin = jnp.min(jnp.where(eligible, harris_map, jnp.inf))
    span = jnp.maximum(hmax - hmin, 1e-12)
    q = jnp.floor((harris_map - hmin) / span * 8190.0) + 1.0
    q = jnp.where(eligible, jnp.clip(q, 1.0, 8191.0), 0.0)
    if cell_size * cell_size <= 2048:
        xy, qv = cell_topk_packed(q, cell_size, per_cell)
    else:
        xy, qv = _cell_topk_general(q, cell_size, per_cell)
    score = jnp.where(qv > 0, (qv - 1.0) / 8190.0 * span + hmin, 0.0)
    return FastKeypoints(xy=xy, score=score, mask=qv > 0.0)
