"""ORB detector + descriptor (reference: kornia-imgproc/src/features/orb/).

ORB-SLAM3-style contract (reference extractor.rs): scale pyramid (factor
1.2), per-cell two-tier FAST with spatial distribution, per-keypoint
intensity-centroid orientation, Gaussian pre-blur, rotated BRIEF-256.

TPU re-design:
  * every pyramid level is processed by the same fixed-shape program
    (per-level keypoint budgets are static);
  * orientation + BRIEF are patch *gathers* at keypoint locations followed
    by dense reductions (the reference's NEON per-keypoint loops);
  * the descriptor is kept as a (N, 256) ±1/0 bit plane so Hamming matching
    is one int-matmul on the MXU (see features/matching.py).

The BRIEF pattern defaults to the published Rublee 2011 learned table
(``bit_pattern_31_`` — the 256 pairs OpenCV/ORB-SLAM ship and every
ORBvoc-class vocabulary was trained on; reference orb/pattern.rs:1
vendors the same public constants). Descriptors are therefore in the
same bit-space as the vocabularies ``bow.binary_io`` imports.
``pattern="seeded"`` keeps the prior seeded Gaussian variant
(σ = patch/5, original BRIEF-paper style) for experiments.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.features.fast import fast_detect_cells, fast_score, nms_maxpool
from kornia_tpu.ops.filters import gaussian_blur
from kornia_tpu.ops.resize import resize

_PATCH = 31
_HALF = _PATCH // 2  # 15


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 7, n_bits: int = 256) -> np.ndarray:
    """(n_bits, 4) int32 — (x1, y1, x2, y2) offsets in [-15, 15]
    (seeded Gaussian variant)."""
    rng = np.random.default_rng(seed)
    sigma = _PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    return np.clip(np.round(pts), -_HALF + 1, _HALF - 1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def brief_pattern_rublee2011() -> np.ndarray:
    """(256, 4) int32 — the published learned BRIEF pattern of Rublee
    et al. 2011 ("ORB: an efficient alternative to SIFT or SURF"),
    identical to OpenCV's ``bit_pattern_31_`` and the reference's
    orb/pattern.rs (public constants, vendored as data). This is the
    bit-space ORBvoc-format vocabularies are trained in."""
    import json

    path = os.path.join(os.path.dirname(__file__),
                        "brief_pattern_rublee2011.json")
    with open(path) as f:
        return np.asarray(json.load(f), np.int32)


def _resolve_pattern(pattern: str, seed: int) -> np.ndarray:
    if pattern == "rublee2011":
        return brief_pattern_rublee2011()
    if pattern == "seeded":
        return brief_pattern(seed)
    raise ValueError(f"unknown BRIEF pattern {pattern!r}")


@functools.lru_cache(maxsize=None)
def _circular_mask() -> np.ndarray:
    """(31, 31) mask of the intensity-centroid circle (radius 15, the
    HALF_PATCH_SIZE circle ORB-SLAM uses via per-row u_max)."""
    yy, xx = np.mgrid[-_HALF : _HALF + 1, -_HALF : _HALF + 1]
    return (xx * xx + yy * yy <= _HALF * _HALF).astype(np.float32)


class OrbFeatures(NamedTuple):
    """Fixed-capacity ORB output (reference OrbFeatures, extractor.rs:15)."""

    xy: jax.Array           # (N, 2) float32 in level-0 pixel coords
    score: jax.Array        # (N,) response
    angle: jax.Array        # (N,) radians
    octave: jax.Array       # (N,) int32
    descriptors: jax.Array  # (N, 256) uint8 bits in {0, 1}
    mask: jax.Array         # (N,) bool valid


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """Reference OrbDetector pub fields (extractor.rs:55-72)."""

    n_features: int = 2000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold_high: float = 20.0
    fast_threshold_low: float = 7.0
    cell_size: int = 35
    # BRIEF pattern: "rublee2011" (published learned table — OpenCV /
    # ORB-SLAM / ORBvoc bit-space, the reference's pattern.rs) or
    # "seeded" (Gaussian pairs from pattern_seed)
    pattern: str = "rublee2011"
    pattern_seed: int = 7
    # Harris re-ranking of FAST candidates at keypoints (reference
    # responses.rs:153 per-KP Harris; FAST proposes ~2x candidates,
    # the final budget cut uses the Harris score)
    harris_rescore: bool = True


def _level_budgets(cfg: OrbConfig) -> List[int]:
    """Per-level keypoint counts ∝ 1/scale^i (ORB-SLAM3 distribution)."""
    inv = [1.0 / cfg.scale_factor**i for i in range(cfg.n_levels)]
    total = sum(inv)
    raw = [int(round(cfg.n_features * v / total)) for v in inv]
    raw[0] += cfg.n_features - sum(raw)
    return raw


def _gather_patches(gray_f: jax.Array, xy_int: jax.Array, half: int) -> jax.Array:
    """(K, 2h+1, 2h+1) patches centered at integer keypoints (edge-clamped)."""
    h, w = gray_f.shape
    offs = jnp.arange(-half, half + 1)
    iy = jnp.clip(xy_int[:, 1, None, None] + offs[None, :, None], 0, h - 1)
    ix = jnp.clip(xy_int[:, 0, None, None] + offs[None, None, :], 0, w - 1)
    return gray_f[iy, ix]


_WIN_H = 48       # keypoint window: covers the 31×31 orientation patch
_WIN_W = 128      # and all rotated BRIEF taps; 128 lanes = one vreg
_WIN_CY = 24
_WIN_CX = 64


def _extract_windows(img_f: jax.Array, xy_int: jax.Array) -> jax.Array:
    """(K, 48, 128) windows centered at keypoints, edge-replicated at
    borders — per-pixel identical to the clamp semantics of the gather
    path, but built from K contiguous dynamic slices instead of K·6k
    scattered reads (TPU gathers run at scalar rate — PERF_NOTES.md).

    On TPU this routes through ops.pallas_kernels.extract_windows_pallas
    (source frame VMEM-resident, one slice + two rolls per window,
    0.3 ms / 2048 windows); XLA's vmapped dynamic_slice issues one HBM
    DMA per window (~1.5 µs each, 3.1 ms / 2048)."""
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import extract_windows_pallas

        return extract_windows_pallas(img_f, xy_int, _WIN_H, _WIN_W,
                                      _WIN_CY, _WIN_CX)
    pad = jnp.pad(img_f, ((_WIN_CY, _WIN_H - _WIN_CY),
                          (_WIN_CX, _WIN_W - _WIN_CX)), mode="edge")

    def one(c):
        return jax.lax.dynamic_slice(
            pad, (c[1], c[0]), (_WIN_H, _WIN_W))

    return jax.vmap(one)(xy_int)


def orientation_from_windows(windows: jax.Array) -> jax.Array:
    """Intensity-centroid orientation from (K, 48, 128) windows."""
    patches = windows[:, _WIN_CY - _HALF: _WIN_CY + _HALF + 1,
                      _WIN_CX - _HALF: _WIN_CX + _HALF + 1]
    mask = jnp.asarray(_circular_mask())
    offs = jnp.arange(-_HALF, _HALF + 1, dtype=jnp.float32)
    m10 = jnp.sum(patches * mask * offs[None, None, :], axis=(1, 2))
    m01 = jnp.sum(patches * mask * offs[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def orientation_ic(gray_f: jax.Array, xy: jax.Array) -> jax.Array:
    """Intensity-centroid orientation at (K, 2) keypoints, radians
    (reference extractor.rs:1362 NEON kernel)."""
    xy_int = jnp.round(xy).astype(jnp.int32)
    patches = _gather_patches(gray_f, xy_int, _HALF)  # (K, 31, 31)
    mask = jnp.asarray(_circular_mask())
    offs = jnp.arange(-_HALF, _HALF + 1, dtype=jnp.float32)
    m10 = jnp.sum(patches * mask * offs[None, None, :], axis=(1, 2))
    m01 = jnp.sum(patches * mask * offs[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_tap_coords(angle: jax.Array, seed: int, pattern: str,
                      half_w: int = None) -> Tuple[jax.Array, jax.Array]:
    """(K, 512) int32 window-space (rows, cols) of the rotated BRIEF
    taps, ordered [A(256), B(256)] and clipped to the window.
    ``half_w`` re-bases the columns for a narrow window centered at
    lane ``half_w`` (the paired layout); the clip is never active
    either way (rotated taps reach ≤ ±20 < 32), so values are
    identical."""
    pat = jnp.asarray(_resolve_pattern(pattern, seed))  # (256, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    px = jnp.concatenate([pat[:, 0], pat[:, 2]]).astype(jnp.float32)
    py = jnp.concatenate([pat[:, 1], pat[:, 3]]).astype(jnp.float32)
    dx = jnp.round(px[None, :] * ca[:, None]
                   - py[None, :] * sa[:, None]).astype(jnp.int32)
    dy = jnp.round(px[None, :] * sa[:, None]
                   + py[None, :] * ca[:, None]).astype(jnp.int32)
    if half_w is None:
        cols = jnp.clip(_WIN_CX + dx, 0, _WIN_W - 1)   # (K, 512)
        rows = jnp.clip(_WIN_CY + dy, 0, _WIN_H - 1)   # (K, 512)
    else:
        cols = jnp.clip(half_w + dx, 0, 2 * half_w - 1)
        rows = jnp.clip(_PAIR_CY + dy, 0, _PAIR_WIN_H - 1)
    return rows, cols


def brief_from_windows(windows: jax.Array, angle: jax.Array,
                       seed: int = 7,
                       pattern: str = "rublee2011") -> jax.Array:
    """Rotated BRIEF-256 from (K, 48, 128) blurred windows.

    Sampling = one vector-rate Mosaic lane gather for the tap columns +
    a one-hot row reduction — zero scalar gathers. Bit-identical to
    brief_describe (same rounding, same clamp semantics).
    """
    from kornia_tpu.ops.pallas_kernels import lane_gather

    k = windows.shape[0]
    rows, cols = _brief_tap_coords(angle, seed, pattern)

    from kornia_tpu.utils.tracing import env_variant

    if env_variant("brief", "pallas" if jax.default_backend() == "tpu"
                   else "xla") == "pallas":
        # one VMEM-resident kernel: in-register lane gather + row
        # select; ~5x the HBM-round-trip formulation below (0.81 ->
        # ~0.15 ms at K=2048 on v5e — PERF_NOTES round 4b)
        from kornia_tpu.ops.pallas_kernels import brief_sample_pallas

        s = brief_sample_pallas(windows, rows, cols)
        return (s[:, :256] < s[:, 256:]).astype(jnp.uint8)

    src = windows.reshape(k * _WIN_H, _WIN_W)
    samples = []
    iota_y = jnp.arange(_WIN_H)[None, :, None]
    for g in range(4):
        cg = cols[:, g * 128: (g + 1) * 128]           # (K, 128)
        idx = jnp.broadcast_to(cg[:, None, :],
                               (k, _WIN_H, 128)).reshape(-1, 128)
        gathered = lane_gather(src, idx).reshape(k, _WIN_H, 128)
        rg = rows[:, g * 128: (g + 1) * 128]           # (K, 128)
        oh = (iota_y == rg[:, None, :])
        samples.append(jnp.sum(jnp.where(oh, gathered, 0.0), axis=1))
    s = jnp.concatenate(samples, axis=1)               # (K, 512)
    return (s[:, :256] < s[:, 256:]).astype(jnp.uint8)


def brief_describe(
    blurred_f: jax.Array, xy: jax.Array, angle: jax.Array, seed: int = 7,
    pattern: str = "rublee2011",
) -> jax.Array:
    """Rotated BRIEF-256: (K, 256) uint8 bits (reference orb/pattern.rs +
    process_octave_u8 descriptor stage)."""
    pat = jnp.asarray(_resolve_pattern(pattern, seed))  # (256, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    h, w = blurred_f.shape

    def rot(px, py):
        # (K, 256) rotated integer offsets
        rx = jnp.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None])
        ry = jnp.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None])
        return rx.astype(jnp.int32), ry.astype(jnp.int32)

    x0, y0 = rot(pat[:, 0].astype(jnp.float32), pat[:, 1].astype(jnp.float32))
    x1, y1 = rot(pat[:, 2].astype(jnp.float32), pat[:, 3].astype(jnp.float32))
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None]

    def sample(ix, iy):
        gx = jnp.clip(cx + ix, 0, w - 1)
        gy = jnp.clip(cy + iy, 0, h - 1)
        return blurred_f[gy, gx]

    bits = sample(x0, y0) < sample(x1, y1)
    return bits.astype(jnp.uint8)


def pack_descriptors(bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} → (N, 32) uint8 packed (reference [u8;32] layout)."""
    b = bits.reshape(bits.shape[0], 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_descriptors(packed: jax.Array) -> jax.Array:
    """(N, 32) uint8 → (N, 256) {0,1} bits."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(packed.shape[0], -1)


def _extract_windows_packed(frames: List[jax.Array],
                            xys: List[jax.Array]) -> jax.Array:
    """ONE window-extraction call over all pyramid levels.

    Per-level prepared (edge-replicated, align-padded) buffers are
    stacked into a single canvas and every keypoint's y is offset by
    its level's canvas start — the extractor then runs ONCE at the
    full keypoint count instead of once per level. Window values are
    bit-identical to per-level extraction (each level's clamp
    semantics are baked into its own prepared rows; the zero padding
    between levels is never read). Kills 2·(n_levels−1) kernel
    launches + pipeline drains per frame (PERF_NOTES round 4d).
    """
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import (
            extract_windows_prepared, prepare_window_source)

        pads = [prepare_window_source(f, _WIN_H, _WIN_CY, _WIN_CX)
                for f in frames]
        wmax = max(int(p.shape[1]) for p in pads)
        pads = [p if int(p.shape[1]) == wmax
                else jnp.pad(p, ((0, 0), (0, wmax - int(p.shape[1]))))
                for p in pads]
        starts = np.cumsum([0] + [int(p.shape[0]) for p in pads])
        canvas = jnp.concatenate(pads, axis=0)
        xy = jnp.concatenate([
            x + jnp.asarray([0, s], jnp.int32)[None]
            for x, s in zip(xys, starts)])
        wimg = max(int(f.shape[1]) for f in frames)
        return extract_windows_prepared(
            canvas, (int(starts[-1]), wimg), xy, _WIN_H)

    pads = [jnp.pad(f, ((_WIN_CY, _WIN_H - _WIN_CY),
                        (_WIN_CX, _WIN_W - _WIN_CX)), mode="edge")
            for f in frames]
    wmax = max(int(p.shape[1]) for p in pads)
    pads = [p if int(p.shape[1]) == wmax
            else jnp.pad(p, ((0, 0), (0, wmax - int(p.shape[1]))))
            for p in pads]
    starts = np.cumsum([0] + [int(p.shape[0]) for p in pads])
    canvas = jnp.concatenate(pads, axis=0)
    xy = jnp.concatenate([
        x + jnp.asarray([0, s], jnp.int32)[None]
        for x, s in zip(xys, starts)])

    def one(c):
        return jax.lax.dynamic_slice(canvas, (c[1], c[0]),
                                     (_WIN_H, _WIN_W))

    return jax.vmap(one)(xy)


_PAIR_CX = (32, 96)   # per-half centers in the paired window layout
_PAIR_WIN_H = 40      # rows: rotated taps reach ≤ ±19 of the center,
_PAIR_CY = 20         # so 40 rows suffice (48 is the unpaired layout)


def _extract_windows_packed_paired(frames: List[jax.Array],
                                   xys: List[jax.Array]) -> jax.Array:
    """Paired variant of :func:`_extract_windows_packed`: keypoints 2i
    and 2i+1 share one 128-lane window ((K/2, 48, 128), halves centered
    at lanes 32 / 96). Bit-identical window values (ORB consumers read
    ≤ ±20 lanes of the center); HALF the extraction traffic — the
    describe stage is bandwidth-bound (PERF_NOTES round 5b). K must be
    even (callers pad budgets)."""
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import (
            extract_windows_prepared_paired, prepare_window_source)

        pads = [prepare_window_source(f, _PAIR_WIN_H, _PAIR_CY, _WIN_CX)
                for f in frames]
        wmax = max(int(p.shape[1]) for p in pads)
        pads = [p if int(p.shape[1]) == wmax
                else jnp.pad(p, ((0, 0), (0, wmax - int(p.shape[1]))))
                for p in pads]
        starts = np.cumsum([0] + [int(p.shape[0]) for p in pads])
        canvas = jnp.concatenate(pads, axis=0)
        xy = jnp.concatenate([
            x + jnp.asarray([0, s], jnp.int32)[None]
            for x, s in zip(xys, starts)])
        wimg = max(int(f.shape[1]) for f in frames)
        return extract_windows_prepared_paired(
            canvas, (int(starts[-1]), wimg), xy, _PAIR_WIN_H)

    full = _extract_windows_packed(frames, xys)          # (K, 48, 128)
    full = full[:, _WIN_CY - _PAIR_CY: _WIN_CY - _PAIR_CY + _PAIR_WIN_H]
    a = full[0::2, :, _WIN_CX - 32: _WIN_CX + 32]
    b = full[1::2, :, _WIN_CX - 32: _WIN_CX + 32]
    return jnp.concatenate([a, b], axis=2)


def orientation_from_windows_paired(windows: jax.Array) -> jax.Array:
    """Intensity-centroid orientation from paired (K/2, 48, 128)
    windows → (K,) radians interleaved back to keypoint order."""
    mask = jnp.asarray(_circular_mask())
    offs = jnp.arange(-_HALF, _HALF + 1, dtype=jnp.float32)
    angs = []
    for cx in _PAIR_CX:
        patches = windows[:, _PAIR_CY - _HALF: _PAIR_CY + _HALF + 1,
                          cx - _HALF: cx + _HALF + 1]
        m10 = jnp.sum(patches * mask * offs[None, None, :], axis=(1, 2))
        m01 = jnp.sum(patches * mask * offs[None, :, None], axis=(1, 2))
        angs.append(jnp.arctan2(m01, m10))
    return jnp.stack(angs, axis=1).reshape(-1)


def brief_from_windows_paired(windows: jax.Array, angle: jax.Array,
                              seed: int = 7,
                              pattern: str = "rublee2011") -> jax.Array:
    """Rotated BRIEF-256 from paired (K/2, 48, 128) blurred windows and
    (K,) angles. Each pair's 1024 tap coordinates (A's 512 at lane base
    32, B's at 96) go through ONE brief_sample_pallas pass — same
    gather count as unpaired, half the window read traffic."""
    k = angle.shape[0]
    rows, cols = _brief_tap_coords(angle, seed, pattern, half_w=32)
    rows = rows.reshape(k // 2, 1024)
    cols = (cols.reshape(k // 2, 2, 512)
            + jnp.asarray([0, 64], jnp.int32)[None, :, None]
            ).reshape(k // 2, 1024)
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import brief_sample_pallas

        s = brief_sample_pallas(windows, rows, cols)   # (K/2, 1024)
    else:
        s = jnp.take_along_axis(
            windows.reshape(k // 2, -1), rows * 128 + cols, axis=1)
    s = s.reshape(k, 512)
    return (s[:, :256] < s[:, 256:]).astype(jnp.uint8)


def _level_candidates(level_img: jax.Array, budget: int, cfg: OrbConfig):
    """Per-cell-capped candidates for one pyramid octave: (xy (C, 2),
    score (C,) with −inf marking invalid slots)."""
    gray_f = level_img.astype(jnp.float32)
    lh, lw = level_img.shape
    n_cells = (-(-lh // cfg.cell_size)) * (-(-lw // cfg.cell_size))
    # enough per-cell capacity that the level budget is reachable even when
    # responses concentrate in few cells (2× oversampling)
    per_cell = max(2, -(-2 * budget // n_cells))
    if cfg.harris_rescore:
        # reference contract (extractor.rs + responses.rs:153): FAST
        # proposes, Harris decides retainment (OpenCV HARRIS_SCORE).
        # A dense central-diff Harris map ranks the NMS'd FAST
        # survivors in-cell via the packed reduce_window top-k — no
        # per-keypoint Harris windows and no second top_k stage
        # (PERF_NOTES round 4c).
        from kornia_tpu.features.fast import (_two_tier_gate,
                                              fast_harris_cells)
        from kornia_tpu.features.responses import harris_response
        from kornia_tpu.utils.tracing import env_variant

        default = "pallas" if jax.default_backend() == "tpu" else "xla"
        if env_variant("fast", default) == "pallas":
            # FAST score+NMS and the dense Harris map in ONE stencil
            # pass over the VMEM-resident tile (the separate XLA
            # harris pass costs 0.13 ms across the pyramid, mostly
            # materialized intermediates — PERF_NOTES round 5c);
            # bit-identical at every eligible pixel
            from kornia_tpu.ops.pallas_kernels import fast_score_pallas

            s_lo, hmap = fast_score_pallas(
                level_img, cfg.fast_threshold_low, 9, nms=True,
                harris=True)
            sel = _two_tier_gate(s_lo, cfg.fast_threshold_high,
                                 cfg.cell_size)
        else:
            sel = None
            hmap = harris_response(gray_f, k=0.04, block_size=5,
                                   sigma=1.0, grad="central")
        kps = fast_harris_cells(
            level_img,
            hmap,
            cell_size=cfg.cell_size,
            threshold_high=cfg.fast_threshold_high,
            threshold_low=cfg.fast_threshold_low,
            per_cell=per_cell,
            sel=sel,
        )
    else:
        kps = fast_detect_cells(
            level_img,
            cell_size=cfg.cell_size,
            threshold_high=cfg.fast_threshold_high,
            threshold_low=cfg.fast_threshold_low,
            per_cell=per_cell,
        )
    return kps.xy, jnp.where(kps.mask, kps.score, -jnp.inf)


def _select_level(
    level_img: jax.Array,
    budget: int,
    cfg: OrbConfig,
):
    """Detection + budgeted selection for one pyramid octave
    (the detection half of reference process_octave_u8,
    extractor.rs:713). Returns (xy level-coords, vals, valid).

    Global top-`budget` among cell winners keeps spatial spread (cells
    already capped) while filling the level budget."""
    xy_all, scores = _level_candidates(level_img, budget, cfg)
    vals, idx = jax.lax.top_k(scores, budget)
    xy = xy_all[idx]
    valid = jnp.isfinite(vals)
    return xy, jnp.where(valid, vals, 0.0), valid


def orb_detect_and_describe(gray_u8: jax.Array, cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """Full multi-scale ORB (reference OrbDetector::detect_and_extract_u8,
    extractor.rs:763). Detection + selection run per level (fixed-shape
    programs; XLA overlaps independent subgraphs the way the reference
    pipelines levels with rayon::scope); the describe stage packs all
    levels into ONE window-extraction canvas and runs orientation +
    BRIEF once at the full keypoint count (PERF_NOTES round 4d)."""
    budgets = _level_budgets(cfg)
    h, w = gray_u8.shape
    levels = [gray_u8]
    for i in range(1, cfg.n_levels):
        s = cfg.scale_factor**i
        nh, nw = int(round(h / s)), int(round(w / s))
        levels.append(resize(levels[-1], (nh, nw), mode="bilinear"))

    from kornia_tpu.utils.tracing import env_variant

    # per-level selection programs: measured FASTER than both a
    # level-packed detection canvas (0.45 vs 0.67 ms — padded-width
    # waste dominates, launches inside one jit are cheap) and grouped
    # packed-cells rounds / batched top_k (0.46 vs 0.49; the 8 top_k
    # calls cost only 0.0095 ms total) — PERF_NOTES round 5b
    sels = [_select_level(img, budget, cfg)
            for img, budget in zip(levels, budgets)]
    grays_f, blurs = [], []
    for img in levels:
        gf = img.astype(jnp.float32)
        grays_f.append(gf)
        blurs.append(gaussian_blur(gf[..., None], (7, 7), 2.0)[..., 0])

    if os.environ.get("KORNIA_TPU_ORB", "windows") == "windows":
        # gather-free describe: per-kp windows via contiguous slices
        # from ONE packed canvas, BRIEF taps via Mosaic lane gather
        # (PERF_NOTES.md — scattered gathers run at scalar rate)
        xy_ints = [jnp.round(xy).astype(jnp.int32) for xy, _, _ in sels]
        if (sum(budgets) % 2 == 0
                and env_variant("orb_pair", "paired") == "paired"):
            # two keypoints per 128-lane window: half the window
            # traffic, bit-identical (PERF_NOTES round 5b);
            # KORNIA_TPU_ORB_PAIR=unpaired restores single windows
            ang = orientation_from_windows_paired(
                _extract_windows_packed_paired(grays_f, xy_ints))
            desc = brief_from_windows_paired(
                _extract_windows_packed_paired(blurs, xy_ints), ang,
                cfg.pattern_seed, cfg.pattern)
        else:
            ang = orientation_from_windows(
                _extract_windows_packed(grays_f, xy_ints))
            desc = brief_from_windows(
                _extract_windows_packed(blurs, xy_ints), ang,
                cfg.pattern_seed, cfg.pattern)
    else:
        angs = [orientation_ic(gf, xy)
                for gf, (xy, _, _) in zip(grays_f, sels)]
        desc = jnp.concatenate([
            brief_describe(bl, xy, a, cfg.pattern_seed, cfg.pattern)
            for bl, (xy, _, _), a in zip(blurs, sels, angs)])
        ang = jnp.concatenate(angs)

    xy = jnp.concatenate([s[0] * cfg.scale_factor**i
                          for i, s in enumerate(sels)])
    score = jnp.concatenate([s[1] for s in sels])
    octv = jnp.concatenate([jnp.full((b,), i, jnp.int32)
                            for i, b in enumerate(budgets)])
    mask = jnp.concatenate([s[2] for s in sels])
    return OrbFeatures(xy=xy, score=score, angle=ang, octave=octv,
                       descriptors=desc, mask=mask)


def orb_detect_and_describe_quadtree(
    gray_u8: jax.Array, cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """ORB with the literal ORB-SLAM3 quadtree distribution
    (reference extractor.rs:93 ExtractorNode::divide).

    Host-orchestrated: per-level FAST candidates come off the device,
    the (data-dependent) quadtree selects on host, and the
    orientation+BRIEF describe runs on device at the selected
    positions. The fully-jitted default (per-cell caps + global top-k)
    remains :func:`orb_detect_and_describe`; PARITY.md documents the
    measured distribution equivalence between the two.
    """
    from kornia_tpu.features.quadtree import distribute_quadtree

    budgets = _level_budgets(cfg)
    h, w = gray_u8.shape
    levels = [gray_u8]
    for i in range(1, cfg.n_levels):
        s = cfg.scale_factor**i
        nh, nw = int(round(h / s)), int(round(w / s))
        levels.append(resize(levels[-1], (nh, nw), mode="bilinear"))

    parts = []
    for i, (img, budget) in enumerate(zip(levels, budgets)):
        lh, lw = img.shape
        n_cells = (-(-lh // cfg.cell_size)) * (-(-lw // cfg.cell_size))
        per_cell = max(2, -(-2 * budget // n_cells))
        kps = fast_detect_cells(
            img,
            cell_size=cfg.cell_size,
            threshold_high=cfg.fast_threshold_high,
            threshold_low=cfg.fast_threshold_low,
            per_cell=per_cell,
        )
        xy_np = np.asarray(kps.xy)
        sc_np = np.asarray(jnp.where(kps.mask, kps.score, -jnp.inf))
        valid = sc_np > 0.0
        sel = distribute_quadtree(
            xy_np[valid], sc_np[valid], budget, lw, lh)
        chosen = np.nonzero(valid)[0][sel]
        # fixed-shape device describe: pad the selection to the budget
        pad = budget - len(chosen)
        idx = np.concatenate([chosen, np.zeros(pad, np.int64)])
        vmask = np.arange(budget) < len(chosen)

        gray_f = img.astype(jnp.float32)
        xy = jnp.asarray(xy_np[idx])
        xy_int = jnp.round(xy).astype(jnp.int32)
        blurred = gaussian_blur(gray_f[..., None], (7, 7), 2.0)[..., 0]
        ang = orientation_from_windows(_extract_windows(gray_f, xy_int))
        desc = brief_from_windows(
            _extract_windows(blurred, xy_int), ang, cfg.pattern_seed,
            cfg.pattern)
        parts.append((
            xy * (cfg.scale_factor**i),
            jnp.asarray(np.where(vmask, sc_np[idx], 0.0)
                        .astype(np.float32)),
            ang,
            jnp.full((budget,), i, jnp.int32),
            desc,
            jnp.asarray(vmask),
        ))

    return OrbFeatures(
        xy=jnp.concatenate([p[0] for p in parts]),
        score=jnp.concatenate([p[1] for p in parts]),
        angle=jnp.concatenate([p[2] for p in parts]),
        octave=jnp.concatenate([p[3] for p in parts]),
        descriptors=jnp.concatenate([p[4] for p in parts]),
        mask=jnp.concatenate([p[5] for p in parts]),
    )
