"""Pose refinement stages — the accuracy tail of the reference.

The reference finishes every geometric estimate with an LM polish:
two-view with a Sampson-cost refiner with annealed thresholds
(kornia-3d/src/pose/twoview.rs:336 LmRefiner, pose/lm_pose.rs:205
refine_pose_lm) and PnP with a reprojection-cost refinement builder
(pnp/refine.rs:46-75). Its headline two-view accuracy (rot_err 0.040°,
BASELINE.md) is produced by this stage.

TPU design: both refiners run on the fixed-iteration manifold LM core
(optim.lm.lm_manifold — one compiled lax.scan, accept/reject as
selects). Thresholds anneal across two LM phases like the reference;
robustness is a Huber clip on the per-point cost so the residual vector
stays fixed-shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.geometry import epipolar as epi
from kornia_tpu.geometry.liegroup import so3_exp_matrix
from kornia_tpu.optim.lm import lm_manifold

_HI_PREC = jax.lax.Precision.HIGHEST


def _huber_sqrt(sq_err: jax.Array, delta: float) -> jax.Array:
    """sqrt of the Huber cost of a SQUARED error — usable as an LM
    residual (r^2 = huber(e^2)): linear near zero, sqrt-growth past
    delta (reference RobustLoss, kornia-algebra losses.rs:6-79)."""
    e = jnp.sqrt(jnp.maximum(sq_err, 1e-18))
    hub = jnp.where(e <= delta, sq_err, delta * (2.0 * e - delta))
    return jnp.sqrt(hub)


def _tangent_basis(t: jax.Array) -> jax.Array:
    """(3, 2) orthonormal basis of the plane perpendicular to t."""
    a = jnp.where(jnp.abs(t[0]) < 0.7,
                  jnp.asarray([1.0, 0.0, 0.0], t.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=-1)


def refine_pose_sampson(
    r: jax.Array, t: jax.Array,
    x1: jax.Array, x2: jax.Array,
    k1: jax.Array, k2: jax.Array,
    inliers: jax.Array,
    iters: int = 12,
    threshold_px: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Sampson-cost LM on the essential manifold (SO3 x S^2, 5 DOF).

    Matches twoview.rs:336 LmRefiner semantics: minimize the Sampson
    distance of E(R, t) in pixel units over the RANSAC inliers, with
    the robust threshold annealed (2*tau then tau) across two LM
    phases. Returns the refined (R, t), t unit-norm.
    """
    kinv1 = jnp.linalg.inv(k1.astype(jnp.float32))
    kinv2t = jnp.linalg.inv(k2.astype(jnp.float32)).T
    w = inliers.astype(jnp.float32)

    def residual_at(state, delta_px):
        rr, tt = state
        ex = jnp.stack([
            jnp.stack([0.0 * tt[0], -tt[2], tt[1]]),
            jnp.stack([tt[2], 0.0 * tt[0], -tt[0]]),
            jnp.stack([-tt[1], tt[0], 0.0 * tt[0]]),
        ])
        e = ex @ rr
        f_px = kinv2t @ e @ kinv1
        sq = epi.sampson_distance(f_px, x1, x2)
        return _huber_sqrt(sq, delta_px) * w

    def retract(state, delta):
        rr, tt = state
        r_new = rr @ so3_exp_matrix(delta[:3])
        t_new = tt + _tangent_basis(tt) @ delta[3:5]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return (r_new, t_new)

    state = (r.astype(jnp.float32),
             t.astype(jnp.float32)
             / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    for phase_tau in (2.0 * threshold_px, threshold_px):
        res = lm_manifold(
            lambda s, tau=phase_tau: residual_at(s, tau),
            retract, state, tangent_dim=5,
            max_iterations=max(iters // 2, 1))
        state = res.params
    return state[0], state[1]


def refine_pose_reprojection(
    r: jax.Array, t: jax.Array,
    world: jax.Array, pixels: jax.Array, k: jax.Array,
    inliers: jax.Array,
    iters: int = 10,
    threshold_px: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Reprojection-cost LM on SE3 (6 DOF) after PnP RANSAC
    (reference pnp/refine.rs:46-75). Returns refined (R, t).

    Uses analytic 2x6 Jacobians (IRLS-weighted Gauss-Newton with LM
    damping) instead of forward-mode autodiff through the retraction —
    ~5x cheaper per iteration on the tracking hot path (the autodiff
    version put PnP at 5.3 ms/frame, dominating frames/s/chip).
    """
    from kornia_tpu.geometry.linalg import solve_cholesky_damped

    wmask = inliers.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    fx, fy = kf[0, 0], kf[1, 1]
    cx, cy = kf[0, 2], kf[1, 2]
    wpts = world.astype(jnp.float32)
    px = pixels.astype(jnp.float32)
    tau2 = jnp.float32(threshold_px * threshold_px)

    def cost_of(rr, tt):
        cam = wpts @ rr.T + tt
        z = jnp.maximum(cam[:, 2], 1e-6)
        u = fx * cam[:, 0] / z + cx
        v = fy * cam[:, 1] / z + cy
        sq = (u - px[:, 0]) ** 2 + (v - px[:, 1]) ** 2
        sq = jnp.where(cam[:, 2] <= 1e-6, 1e6, sq)
        hub = jnp.where(sq <= tau2, sq,
                        2.0 * jnp.sqrt(sq * tau2) - tau2)
        return jnp.sum(wmask * hub)

    def step(carry, _):
        rr, tt, lam, cost = carry
        cam = wpts @ rr.T + tt
        z = jnp.maximum(cam[:, 2], 1e-6)
        iz = 1.0 / z
        u = fx * cam[:, 0] * iz + cx
        v = fy * cam[:, 1] * iz + cy
        e = jnp.stack([u - px[:, 0], v - px[:, 1]], -1)      # (N, 2)
        sq = jnp.sum(e * e, -1)
        # IRLS Huber weight: 1 inside tau, tau/|e| outside
        wr = jnp.where(sq <= tau2, 1.0,
                       jnp.sqrt(tau2 / jnp.maximum(sq, 1e-12)))
        wr = wr * wmask * (cam[:, 2] > 1e-6)

        # dpi/dcam (N, 2, 3)
        a = jnp.stack([
            jnp.stack([fx * iz, jnp.zeros_like(iz),
                       -fx * cam[:, 0] * iz * iz], -1),
            jnp.stack([jnp.zeros_like(iz), fy * iz,
                       -fy * cam[:, 1] * iz * iz], -1),
        ], -2)
        # dcam/d(delta_r) with R' = R exp([delta]x): -R [p]x
        zr = jnp.zeros_like(wpts[:, 0])
        phat = jnp.stack([
            jnp.stack([zr, -wpts[:, 2], wpts[:, 1]], -1),
            jnp.stack([wpts[:, 2], zr, -wpts[:, 0]], -1),
            jnp.stack([-wpts[:, 1], wpts[:, 0], zr], -1),
        ], -2)                                               # (N, 3, 3)
        dr = -jnp.einsum("ij,njk->nik", rr, phat)            # (N, 3, 3)
        j = jnp.concatenate([
            jnp.einsum("nij,njk->nik", a, dr),               # rot part
            a,                                               # trans part
        ], -1)                                               # (N, 2, 6)
        jw = j * wr[:, None, None]
        jtj = jnp.einsum("nki,nkj->ij", jw, j, precision=_HI_PREC)
        g = jnp.einsum("nki,nk->i", jw, e, precision=_HI_PREC)
        delta = solve_cholesky_damped(jtj, -g, lam)
        r_new = rr @ so3_exp_matrix(delta[:3])
        t_new = tt + delta[3:6]
        new_cost = cost_of(r_new, t_new)
        accept = new_cost < cost
        rr = jnp.where(accept, r_new, rr)
        tt = jnp.where(accept, t_new, tt)
        lam = jnp.clip(jnp.where(accept, lam * 0.1, lam * 10.0),
                       1e-10, 1e6)
        return (rr, tt, lam, jnp.where(accept, new_cost, cost)), None

    r0 = r.astype(jnp.float32)
    t0 = t.astype(jnp.float32)
    c0 = cost_of(r0, t0)
    (rf, tf, _, _), _ = jax.lax.scan(
        step, (r0, t0, jnp.float32(1e-3), c0), None, length=iters)
    return rf, tf
