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
    (reference pnp/refine.rs:46-75). Returns refined (R, t)."""
    from kornia_tpu.geometry.camera import project_points

    w = inliers.astype(jnp.float32)
    kf = k.astype(jnp.float32)

    def residual(state):
        rr, tt = state
        cam = world.astype(jnp.float32) @ rr.T + tt
        proj = project_points(cam, kf)
        err = (proj - pixels.astype(jnp.float32))
        sq = jnp.sum(err * err, axis=-1)
        sq = jnp.where(cam[:, 2] <= 1e-6, 1e6, sq)
        return _huber_sqrt(sq, threshold_px) * w

    def retract(state, delta):
        rr, tt = state
        return (rr @ so3_exp_matrix(delta[:3]), tt + delta[3:6])

    state = (r.astype(jnp.float32), t.astype(jnp.float32))
    res = lm_manifold(residual, retract, state, tangent_dim=6,
                      max_iterations=iters)
    return res.params[0], res.params[1]
