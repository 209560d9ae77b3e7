"""Pyramidal Lucas-Kanade optical flow — batched TPU formulation.

Capability parity with the reference's optical_flow_pyr_lk.rs (2,168 LoC:
PyrLKParams, precompute reuse, calc_optical_flow_pyr_lk). The TPU design
is batched-not-branchy (SURVEY.md §7): every tracked point runs the same
fixed-iteration Newton loop (lax.fori_loop) at every pyramid level, vmapped
over points; convergence is a mask, not an early exit. Patch sampling is a
dense bilinear gather over a static (win, win) stencil — XLA fuses the
gather + 2×2 solve per point into one program.

Matches cv2.calcOpticalFlowPyrLK semantics: window cost is unweighted,
status goes false when the spatial-gradient matrix is near-singular or
the point leaves the image.

Two sampling formulations share the math:

* ``gather`` — per-pixel index arrays (``img[y0, x0]``). Exact, but
  scattered gathers run at SCALAR rate on TPU (PERF_NOTES.md "gather
  cliff"): every Newton iteration pays N·win²·4 scattered reads.
* ``windows`` (TPU default) — each point's neighborhood is fetched
  ONCE per level as a VMEM-resident window (the Pallas extractor used
  by ORB), and every bilinear resample inside the Newton loop becomes
  two small one-hot matmuls (separable interpolation: patch =
  R(fy) @ window @ C(fx)ᵀ) — zero gathers after extraction. The
  Newton loop is a ``while_loop`` so the batch stops at the slowest
  point's convergence instead of always paying max_iters.

Select with ``KORNIA_TPU_LK=gather|windows`` or the ``method=`` kwarg.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.ops import pyramid as pyr_mod


@dataclass(frozen=True)
class PyrLKParams:
    """Mirror of the reference's PyrLKParams (optical_flow_pyr_lk.rs:35)."""

    window: int = 21
    max_level: int = 3
    max_iters: int = 30
    eps: float = 0.01
    min_eig_threshold: float = 1e-4


class FlowResult(NamedTuple):
    points: jax.Array   # (N, 2) tracked xy in the next image
    status: jax.Array   # (N,) bool — tracked successfully
    errors: jax.Array   # (N,) mean |I - J| over the window


def _scharr_gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """3×3 Scharr derivatives (cv2's choice for LK), reflect border."""
    p = jnp.pad(img, 1, mode="edge")
    # separable: central difference along the deriv axis, [3 10 3]/16
    # smoothing along the other, overall /32 like cv2's Scharr-based LK
    gx = p[:, 2:] - p[:, :-2]
    gx = (gx[:-2] * 3 + gx[1:-1] * 10 + gx[2:] * 3) * (1.0 / 32.0)
    gy = p[2:, :] - p[:-2, :]
    gy = (gy[:, :-2] * 3 + gy[:, 1:-1] * 10 + gy[:, 2:] * 3) * (1.0 / 32.0)
    return gx, gy


def _bilinear_patch(img: jax.Array, center: jax.Array,
                    offsets: jax.Array) -> jax.Array:
    """Sample a (win²,) patch at subpixel `center` (xy) + integer offsets."""
    h, w = img.shape
    xy = center[None, :] + offsets  # (win², 2)
    x = jnp.clip(xy[:, 0], 0.0, w - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _track_level(prev: jax.Array, nxt: jax.Array, gx: jax.Array,
                 gy: jax.Array, pt: jax.Array, guess: jax.Array,
                 params: PyrLKParams):
    """One point, one pyramid level. Returns (flow, ok, err)."""
    half = (params.window - 1) / 2.0
    r = jnp.arange(params.window, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offsets = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=1)

    ip = _bilinear_patch(prev, pt, offsets)
    ix = _bilinear_patch(gx, pt, offsets)
    iy = _bilinear_patch(gy, pt, offsets)

    a11 = jnp.sum(ix * ix)
    a12 = jnp.sum(ix * iy)
    a22 = jnp.sum(iy * iy)
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0
    n_px = params.window * params.window
    ok = min_eig / n_px > params.min_eig_threshold
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    def body(_, carry):
        d, done = carry
        jp = _bilinear_patch(nxt, pt + guess + d, offsets)
        diff = ip - jp
        b1 = jnp.sum(diff * ix)
        b2 = jnp.sum(diff * iy)
        du = (a22 * b1 - a12 * b2) * inv_det
        dv = (a11 * b2 - a12 * b1) * inv_det
        step = jnp.stack([du, dv])
        new_d = jnp.where(done, d, d + step)
        done = done | (jnp.sum(step * step) < params.eps * params.eps)
        return new_d, done

    d0 = jnp.zeros(2, jnp.float32)
    d, _ = jax.lax.fori_loop(0, params.max_iters, body,
                             (d0, jnp.logical_not(ok)))
    jp = _bilinear_patch(nxt, pt + guess + d, offsets)
    err = jnp.mean(jnp.abs(ip - jp))

    h, w = prev.shape
    end = pt + guess + d
    inside = ((end[0] >= 0) & (end[0] <= w - 1)
              & (end[1] >= 0) & (end[1] <= h - 1))
    return d, ok & inside, err


# ---------------------------------------------------------------------
# windows formulation: per-point windows + separable one-hot matmul
# resampling (no gathers inside the Newton loop)
_LKW_H = 48       # window rows (extractor contract)
_LKW_W = 64       # window cols kept after extraction (of the 128
#                   fetched) — ±21 px lane drift margin. A 48-col slab
#                   (25% fewer matmul flops) measured IDENTICAL
#                   (27.43 vs 27.38 ms): the per-iteration cost is MXU
#                   tile-padding-bound (21x48 tiles pad to 128x128
#                   regardless), so keep the wider margin for free.
_LKW_CY = 24      # window-space row of the point center
_LKW_CX = 32      # window-space col of the point center


def _extract_lk_windows(img: jax.Array, centers: jax.Array) -> jax.Array:
    """(N, 48, 64) edge-replicated windows at integer ``centers`` (xy).

    TPU: ops.pallas_kernels.extract_windows_pallas (frame VMEM-resident,
    one slice per window); elsewhere vmapped dynamic_slice.
    """
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import extract_windows_pallas

        w128 = extract_windows_pallas(img, centers, _LKW_H, 128,
                                      _LKW_CY, 64)
        return w128[:, :, 64 - _LKW_CX: 64 + (_LKW_W - _LKW_CX)]
    pad = jnp.pad(img, ((_LKW_CY, _LKW_H - _LKW_CY),
                        (_LKW_CX, _LKW_W - _LKW_CX)), mode="edge")

    def one(c):
        return jax.lax.dynamic_slice(pad, (c[1], c[0]), (_LKW_H, _LKW_W))

    return jax.vmap(one)(centers)


def _sep_weights(base: jax.Array, n: int, size: int) -> jax.Array:
    """(n, size) separable bilinear one-hot rows: row i holds (1-f) at
    floor(base+i) and f at floor(base+i)+1, clamped to the window."""
    t = base + jnp.arange(n, dtype=jnp.float32)
    t = jnp.clip(t, 0.0, size - 1.001)
    t0 = jnp.floor(t)
    f = t - t0
    idx = jnp.arange(size, dtype=jnp.float32)
    lo = (idx[None, :] == t0[:, None]).astype(jnp.float32)
    hi = (idx[None, :] == (t0 + 1.0)[:, None]).astype(jnp.float32)
    return lo * (1.0 - f)[:, None] + hi * f[:, None]


def _sample_window_patch(win2d: jax.Array, off_xy: jax.Array,
                         n: int) -> jax.Array:
    """(n, n) bilinear patch from one (H, W) window, centered at the
    window center + subpixel ``off_xy`` — two small matmuls, no
    gathers."""
    half = (n - 1) / 2.0
    ry = _sep_weights(off_xy[1] + (_LKW_CY - half), n, win2d.shape[0])
    cx = _sep_weights(off_xy[0] + (_LKW_CX - half), n, win2d.shape[1])
    return ry @ win2d @ cx.T


def _track_level_win(prevw: jax.Array, nxtw: jax.Array, gxw: jax.Array,
                     gyw: jax.Array, sub_prev: jax.Array,
                     off_nxt: jax.Array, params: PyrLKParams):
    """One point, one level, windows formulation.

    ``sub_prev`` = pt - round(pt) (subpixel of the template center in
    its window); ``off_nxt`` = pt + guess - round(pt + guess). Returns
    (flow, ok, err) with flow relative to the initial guess.
    """
    win = params.window
    ip = _sample_window_patch(prevw, sub_prev, win)
    ix = _sample_window_patch(gxw, sub_prev, win)
    iy = _sample_window_patch(gyw, sub_prev, win)

    a11 = jnp.sum(ix * ix)
    a12 = jnp.sum(ix * iy)
    a22 = jnp.sum(iy * iy)
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0
    ok = min_eig / (win * win) > params.min_eig_threshold
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    def cond(carry):
        _, done, it = carry
        return (~done) & (it < params.max_iters)

    def body(carry):
        d, done, it = carry
        jp = _sample_window_patch(nxtw, off_nxt + d, win)
        diff = ip - jp
        b1 = jnp.sum(diff * ix)
        b2 = jnp.sum(diff * iy)
        du = (a22 * b1 - a12 * b2) * inv_det
        dv = (a11 * b2 - a12 * b1) * inv_det
        step = jnp.stack([du, dv])
        d = d + step
        done = jnp.sum(step * step) < params.eps * params.eps
        return d, done, it + 1

    d0 = jnp.zeros(2, jnp.float32)
    d, _, _ = jax.lax.while_loop(
        cond, body, (d0, jnp.logical_not(ok), jnp.int32(0)))
    jp = _sample_window_patch(nxtw, off_nxt + d, win)
    err = jnp.mean(jnp.abs(ip - jp))
    return d, ok, err


def _track_level_batch_win(prev: jax.Array, nxt: jax.Array,
                           gx: jax.Array, gy: jax.Array,
                           pts: jax.Array, guess: jax.Array,
                           params: PyrLKParams):
    """All points, one level: 4 window fetches + the vmapped
    window-resident Newton loop."""
    h, w = prev.shape
    cen_prev = jnp.round(pts).astype(jnp.int32)
    tgt = pts + guess
    cen_nxt = jnp.round(tgt).astype(jnp.int32)
    # extractor expects in-image centers; clamp (content is
    # edge-replicated, matching the gather path's coordinate clamp)
    cen_prev = jnp.clip(cen_prev, 0, jnp.asarray([w - 1, h - 1]))
    cen_nxt = jnp.clip(cen_nxt, 0, jnp.asarray([w - 1, h - 1]))
    # NOTE: batching the prev/gx/gy extractions into one pallas call
    # over a vertical plane stack was measured and does NOT move the
    # total (11.41 vs 11.23 ms at max_iters=8) — the per-call dispatch
    # is already hidden; the fixed cost lives in level plumbing.
    prevw = _extract_lk_windows(prev, cen_prev)
    gxw = _extract_lk_windows(gx, cen_prev)
    gyw = _extract_lk_windows(gy, cen_prev)
    nxtw = _extract_lk_windows(nxt, cen_nxt)
    sub_prev = pts - cen_prev.astype(jnp.float32)
    off_nxt = tgt - cen_nxt.astype(jnp.float32)
    d, ok, err = jax.vmap(_track_level_win,
                          in_axes=(0, 0, 0, 0, 0, 0, None))(
        prevw, nxtw, gxw, gyw, sub_prev, off_nxt, params)
    end = tgt + d
    inside = ((end[:, 0] >= 0) & (end[:, 0] <= w - 1)
              & (end[:, 1] >= 0) & (end[:, 1] <= h - 1))
    return d, ok & inside, err


# ---------------------------------------------------------------------
# taps formulation: re-extract (win+1)-row windows at the CURRENT
# integer estimate every Newton iteration (the Pallas extractor costs
# ~15 µs per 1024 windows — cheaper than one per-point one-hot matmul
# resample), so the subpixel resample degenerates to a 4-tap weighted
# sum of STATIC window slices. No per-point matmuls anywhere, and no
# drift-margin cap: the window follows the estimate.
_TAPS_H = 24     # extraction rows (win + 1 <= 24, 8-aligned)
_TAPS_M = 8      # placement margin: patch top-lefts down to -8 px stay
#                  inside the extractor's edge-replicated pad instead of
#                  getting clamp-shifted (coarse pyramid levels put
#                  near-border points there)
_TAPS_CX = 64    # extraction col offset (extractor contract)


def _prepare_taps_source(img: jax.Array):
    """One-time pad of a frame for repeated taps extraction (the Newton
    loop re-extracts every iteration; the pads must not be in it)."""
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import prepare_window_source

        return prepare_window_source(img, _TAPS_H, _TAPS_M, _TAPS_CX), \
            img.shape
    pad = jnp.pad(img, ((_TAPS_M, _TAPS_H - _TAPS_M),
                        (_TAPS_CX, 128 - _TAPS_CX)), mode="edge")
    return pad, img.shape


def _extract_taps_windows(prepared, center: jax.Array) -> jax.Array:
    """(N, 24, 128) edge-replicated windows; window (row r, col c) holds
    the image pixel (center.y + r - _TAPS_M, center.x + c - _TAPS_CX)."""
    pad, shape = prepared
    if jax.default_backend() == "tpu":
        from kornia_tpu.ops.pallas_kernels import extract_windows_prepared

        return extract_windows_prepared(pad, shape, center, _TAPS_H)

    def one(c):
        return jax.lax.dynamic_slice(pad, (c[1], c[0]), (_TAPS_H, 128))

    return jax.vmap(one)(center)


def _four_tap(w: jax.Array, f: jax.Array, win: int) -> jax.Array:
    """(N, win, win) bilinear patches from taps windows whose patch
    top-left sits at window (row 0, col _TAPS_CX - _TAPS_M) +
    fractional ``f`` (windows are extracted at center = top-left +
    margin, so row 0 is the top-left row)."""
    fx = f[:, 0][:, None, None]
    fy = f[:, 1][:, None, None]
    c = _TAPS_CX - _TAPS_M
    w00 = w[:, 0:win, c: c + win]
    w01 = w[:, 0:win, c + 1: c + win + 1]
    w10 = w[:, 1: win + 1, c: c + win]
    w11 = w[:, 1: win + 1, c + 1: c + win + 1]
    return ((1 - fy) * ((1 - fx) * w00 + fx * w01)
            + fy * ((1 - fx) * w10 + fx * w11))


def _track_level_batch_taps(prev: jax.Array, nxt: jax.Array,
                            gx: jax.Array, gy: jax.Array,
                            pts: jax.Array, guess: jax.Array,
                            params: PyrLKParams):
    """All points, one level, taps formulation: per-iteration window
    re-extraction + static-slice 4-tap resampling."""
    win = params.window
    h, w = prev.shape
    half = (win - 1) / 2.0
    lim = jnp.asarray([w - 1, h - 1], jnp.int32)

    def tl_frac(target):
        """(extraction center, fractional offset) for a patch whose
        top-left lands at target - half. Top-lefts down to -_TAPS_M ride
        the edge-replicated margin un-shifted; beyond that the clamp
        shifts placement (same corridor as the windows method)."""
        base = target - half
        cen = jnp.clip(jnp.floor(base).astype(jnp.int32) + _TAPS_M,
                       0, lim)
        f = jnp.clip(base - (cen - _TAPS_M).astype(jnp.float32),
                     0.0, 1.0)
        return cen, f

    tl_t, f_t = tl_frac(pts)
    ip = _four_tap(_extract_taps_windows(_prepare_taps_source(prev),
                                         tl_t), f_t, win)
    ix = _four_tap(_extract_taps_windows(_prepare_taps_source(gx),
                                         tl_t), f_t, win)
    iy = _four_tap(_extract_taps_windows(_prepare_taps_source(gy),
                                         tl_t), f_t, win)
    nxt_src = _prepare_taps_source(nxt)

    # NOTE: a fused Newton-step Pallas kernel (resample + b1/b2
    # projection per point, frame VMEM-resident, only (N, 128) written
    # per iteration) was built and measured at 41.5 ms on the worst-case
    # fixture — 4x WORSE than this XLA composition (10.4 ms): the
    # per-point kernel body serializes 1024 dependent slice+roll chains
    # and pays ~7 unaligned lane-slice shuffles per point, reproducing
    # the round-2 rejected roll-kernel result (PERF_NOTES round 4b).
    # Code removed; the note is the record.

    a11 = jnp.sum(ix * ix, axis=(1, 2))
    a12 = jnp.sum(ix * iy, axis=(1, 2))
    a22 = jnp.sum(iy * iy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0
    ok = min_eig / (win * win) > params.min_eig_threshold
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    def sample_j(d):
        tl_j, f_j = tl_frac(pts + guess + d)
        return _four_tap(_extract_taps_windows(nxt_src, tl_j), f_j, win)

    def cond(carry):
        _, done, it = carry
        return jnp.logical_not(jnp.all(done)) & (it < params.max_iters)

    def body(carry):
        d, done, it = carry
        diff = ip - sample_j(d)
        b1 = jnp.sum(diff * ix, axis=(1, 2))
        b2 = jnp.sum(diff * iy, axis=(1, 2))
        du = (a22 * b1 - a12 * b2) * inv_det
        dv = (a11 * b2 - a12 * b1) * inv_det
        step = jnp.stack([du, dv], axis=1)
        d = jnp.where(done[:, None], d, d + step)
        done = done | (jnp.sum(step * step, axis=1)
                       < params.eps * params.eps)
        return d, done, it + 1

    d0 = jnp.zeros_like(pts)
    d, _, _ = jax.lax.while_loop(
        cond, body, (d0, jnp.logical_not(ok), jnp.int32(0)))
    err = jnp.mean(jnp.abs(ip - sample_j(d)), axis=(1, 2))
    end = pts + guess + d
    inside = ((end[:, 0] >= 0) & (end[:, 0] <= w - 1)
              & (end[:, 1] >= 0) & (end[:, 1] <= h - 1))
    return d, ok & inside, err


# Largest params.window the fixed (48, 64) extraction window serves
# with a useful Newton-drift budget (±(48-win)/2-1 rows). Bigger
# windows fall back to the gather formulation — correct at any size.
_LKW_MAX_WIN = 27
# Largest window the 24-row taps extraction serves (win + 1 rows and
# _TAPS_CX + win + 1 <= 128 cols).
_TAPS_MAX_WIN = _TAPS_H - 1


def _default_method() -> str:
    env = os.environ.get("KORNIA_TPU_LK", "")
    if env in ("gather", "windows", "taps"):
        return env
    return "taps" if jax.default_backend() == "tpu" else "gather"


def _resolve_method(method: str, window: int) -> str:
    """Resolve 'auto' + apply the windows-capacity guard.

    Runs OUTSIDE jit so the KORNIA_TPU_LK env override takes effect on
    every call (a trace-time read would be cached under the 'auto'
    key). ``windows``/``taps`` silently clamp sampling beyond their
    extraction windows, so oversized requests route down the chain
    (taps → windows → gather, whose results are exact at any size)."""
    if method == "auto":
        method = _default_method()
    if method == "taps" and window > _TAPS_MAX_WIN:
        method = "windows"
    if method == "windows" and window > _LKW_MAX_WIN:
        return "gather"
    return method


class LKPrecomputed(NamedTuple):
    """Reusable per-frame pyramids + gradients.

    Mirror of the reference's build_lk_precomputed
    (optical_flow_pyr_lk.rs:1243) — when tracking many point sets against
    the same frame pair, the pyramid/gradient stack is built once.
    """

    prev_levels: Tuple[jax.Array, ...]
    next_levels: Tuple[jax.Array, ...]
    gx_levels: Tuple[jax.Array, ...]
    gy_levels: Tuple[jax.Array, ...]


def build_lk_precomputed(
    prev_gray: jax.Array, next_gray: jax.Array, params: PyrLKParams = PyrLKParams()
) -> LKPrecomputed:
    """Build the pyramid + Scharr gradient stack for both frames."""
    prev_f = prev_gray.astype(jnp.float32)
    next_f = next_gray.astype(jnp.float32)
    if prev_f.ndim == 3:
        prev_f = prev_f[..., 0]
    if next_f.ndim == 3:
        next_f = next_f[..., 0]
    n_levels = params.max_level + 1
    prevs = [prev_f]
    nxts = [next_f]
    for _ in range(n_levels - 1):
        prevs.append(pyr_mod.pyrdown(prevs[-1][..., None])[..., 0])
        nxts.append(pyr_mod.pyrdown(nxts[-1][..., None])[..., 0])
    grads = [_scharr_gradients(p) for p in prevs]
    return LKPrecomputed(
        prev_levels=tuple(prevs),
        next_levels=tuple(nxts),
        gx_levels=tuple(g[0] for g in grads),
        gy_levels=tuple(g[1] for g in grads),
    )


def calc_optical_flow_pyr_lk_with_precomputed(
    pre: LKPrecomputed, points: jax.Array,
    params: PyrLKParams = PyrLKParams(), method: str = "auto",
) -> FlowResult:
    """Track (N, 2) xy points using a prebuilt pyramid stack."""
    method = _resolve_method(method, params.window)
    n_levels = len(pre.prev_levels)
    points = points.astype(jnp.float32)
    status = jnp.ones(points.shape[0], bool)
    err = jnp.zeros(points.shape[0], jnp.float32)
    flow = jnp.zeros_like(points)

    track = jax.vmap(_track_level, in_axes=(None, None, None, None, 0, 0, None))
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        pts_lvl = points / scale
        if method == "taps":
            d, ok, err = _track_level_batch_taps(
                pre.prev_levels[lvl], pre.next_levels[lvl],
                pre.gx_levels[lvl], pre.gy_levels[lvl],
                pts_lvl, flow, params)
        elif method == "windows":
            d, ok, err = _track_level_batch_win(
                pre.prev_levels[lvl], pre.next_levels[lvl],
                pre.gx_levels[lvl], pre.gy_levels[lvl],
                pts_lvl, flow, params)
        else:
            d, ok, err = track(
                pre.prev_levels[lvl], pre.next_levels[lvl],
                pre.gx_levels[lvl], pre.gy_levels[lvl],
                pts_lvl, flow, params)
        flow = flow + d
        status = status & ok
        if lvl > 0:
            flow = flow * 2.0
    return FlowResult(points=points + flow, status=status, errors=err)


@partial(jax.jit, static_argnames=("params", "method"))
def _lk_jit(prev_gray, next_gray, points, params, method):
    pre = build_lk_precomputed(prev_gray, next_gray, params)
    return calc_optical_flow_pyr_lk_with_precomputed(pre, points, params,
                                                     method)


def calc_optical_flow_pyr_lk(
    prev_gray: jax.Array, next_gray: jax.Array, points: jax.Array,
    params: PyrLKParams = PyrLKParams(), method: str = "auto",
) -> FlowResult:
    """Pyramidal LK: track `points` from prev_gray to next_gray.

    Reference: calc_optical_flow_pyr_lk, optical_flow_pyr_lk.rs:1311.
    ``method``: "windows" (TPU default — window-resident matmul
    resampling; windows > 27 px route to gather, whose results are
    exact at any size), "gather" (CPU default), or "auto". Resolved
    per call so the ``KORNIA_TPU_LK`` override always takes effect.
    """
    return _lk_jit(prev_gray, next_gray, points, params,
                   _resolve_method(method, params.window))
