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
"""

from __future__ import annotations

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
    params: PyrLKParams = PyrLKParams(),
) -> FlowResult:
    """Track (N, 2) xy points using a prebuilt pyramid stack."""
    n_levels = len(pre.prev_levels)
    points = points.astype(jnp.float32)
    status = jnp.ones(points.shape[0], bool)
    err = jnp.zeros(points.shape[0], jnp.float32)
    flow = jnp.zeros_like(points)

    track = jax.vmap(_track_level, in_axes=(None, None, None, None, 0, 0, None))
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        pts_lvl = points / scale
        d, ok, err = track(
            pre.prev_levels[lvl], pre.next_levels[lvl],
            pre.gx_levels[lvl], pre.gy_levels[lvl],
            pts_lvl, flow, params)
        flow = flow + d
        status = status & ok
        if lvl > 0:
            flow = flow * 2.0
    return FlowResult(points=points + flow, status=status, errors=err)


@partial(jax.jit, static_argnames=("params",))
def calc_optical_flow_pyr_lk(
    prev_gray: jax.Array, next_gray: jax.Array, points: jax.Array,
    params: PyrLKParams = PyrLKParams(),
) -> FlowResult:
    """Pyramidal LK: track `points` from prev_gray to next_gray.

    Reference: calc_optical_flow_pyr_lk, optical_flow_pyr_lk.rs:1311.
    """
    pre = build_lk_precomputed(prev_gray, next_gray, params)
    return calc_optical_flow_pyr_lk_with_precomputed(pre, points, params)
