"""Bundle adjustment with Schur-complement reduction
(reference: kornia-3d/src/ba.rs:646 bundle_adjust, ba_schur.rs:352
bundle_adjust_schur — dense reduced camera system M = A − B C⁻¹ Bᵀ, per-3×3
point-block inversion, B never materialized as a matrix, faer Cholesky,
point back-substitution; tangent convention [ρ; ω], MIN_Z clamp).

TPU re-design:
  * observations are flat arrays (cam_idx, pt_idx, uv, weight) — the block
    Hessian accumulation is ``segment_sum`` over observations (one pass,
    no hash maps; the reference's string-keyed Problem is explicitly the
    part NOT to imitate, SURVEY.md §3.4);
  * the reduced camera system S is assembled by scattering per-point
    observation-pair outer products Yₐ·Bᵦᵀ into a dense (6P, 6P) buffer —
    per-point obs lists are padded to a static K at problem build time;
  * the LM loop is a ``lax.scan``; accept/reject is a `where`-select;
  * analytic Jacobians ([ρ; ω] left-perturbation), f32 with HIGHEST-precision
    matmuls (SURVEY.md §7: f32 + conditioning instead of f64).

This single-host kernel is reused verbatim by the distributed BA
(kornia_tpu.parallel.ba_dist): each device runs the accumulation on its
observation shard, the reduced system is psum'd, the solve is replicated.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import inv3x3

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim.losses import LOSSES

_MIN_Z = 1e-3  # reference ba_schur.rs:49 z-clamp
_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class BAParams:
    """Reference BaParams (ba.rs:116)."""

    max_iterations: int = 20
    lambda_init: float = 1e-4
    lambda_factor: float = 10.0
    loss: str = "huber"
    loss_scale: float = 1.0  # pixels
    cost_tolerance: float = 1e-9
    # reduced-camera-system solver: "dense" materializes S (6P, 6P) and
    # Cholesky-solves (the reference ba_schur.rs regime, fine to a few
    # hundred poses); "pcg" runs matrix-free block-Jacobi-preconditioned
    # CG with O(M) work per CG step (pod-scale maps; never builds the
    # (N, P) coupling tensor). "auto" picks pcg when P > 400.
    solver: str = "auto"
    cg_iters: int = 60


class BAProblem(NamedTuple):
    """Static-topology BA problem. Build with :func:`build_problem`."""

    poses: jax.Array        # (P, 7) se3 world→camera
    points: jax.Array       # (N, 3)
    k: jax.Array            # (3, 3) shared intrinsics
    obs_cam: jax.Array      # (M,) int32
    obs_pt: jax.Array       # (M,) int32
    obs_uv: jax.Array       # (M, 2)
    obs_w: jax.Array        # (M,) confidence; 0 = padding
    fixed_poses: jax.Array  # (P,) bool
    fixed_points: jax.Array  # (N,) bool
    obs_by_point: jax.Array  # (N, K) int32 obs indices (padded w/ 0)
    obs_by_point_mask: jax.Array  # (N, K) bool
    # optional RGB-D channel (reference BaObservation depth, ba.rs:41,83):
    # per-observation measured camera-frame depth + weight (0 = none)
    obs_depth: Optional[jax.Array] = None      # (M,)
    obs_depth_w: Optional[jax.Array] = None    # (M,)
    # tiled segment engine (built host-side when observations are
    # sorted by point and every _SEG_T-tile spans <= _SEG_S points):
    # TPU scatter/gather runs at scalar rate (~0.6 ms per (M,3)
    # segment_sum at M=100k — PERF_NOTES gather cliff), so the
    # point-side segmented reductions become tiled one-hot MXU
    # contractions and the camera-side ones a (P, M) one-hot matmul.
    seg_oh: Optional[jax.Array] = None    # (n_tiles, _SEG_T, _SEG_S) f32
    seg_ids: Optional[jax.Array] = None   # (n_tiles * _SEG_S,) int32
    cam_oh: Optional[jax.Array] = None    # (P, M) f32
    # per-pose translation priors (reference BaPosePrior, ba.rs:107 /
    # bundle_adjust_schur_with_priors, ba_schur.rs:385): residual
    # r = (C − center) / σ with C = −Rᵀt the camera centre in world
    # frame; anchors gauge / fuses odometry-GPS. prior_invs[i] = 1/σᵢ,
    # 0 = no prior on pose i.
    prior_center: Optional[jax.Array] = None   # (P, 3)
    prior_invs: Optional[jax.Array] = None     # (P,)


class BAResult(NamedTuple):
    """Reference BaResult (ba.rs:156)."""

    poses: jax.Array
    points: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array


# tiled segment engine geometry: _SEG_T sorted observations per tile,
# local one-hot over a <= _SEG_S point window (SLAM maps average >= 3
# observations per point, so a 512-obs tile spans far fewer than 128
# points; problems that violate the span fall back to segment_sum)
_SEG_T = 1024
_SEG_S = 128
_CAM_OH_BYTES = 512 * 1024 * 1024   # (P, M) one-hot budget


def _engine_enabled() -> bool:
    """KORNIA_TPU_BA_ENGINE = on | off | auto (default). Auto enables
    the one-hot engine only on TPU — on CPU (the virtual-mesh test
    backend) scatters are cheap and the extra matmul FLOPs just slow
    things down (same A/B convention as KORNIA_TPU_FAST, §5.1)."""
    import os

    mode = os.environ.get("KORNIA_TPU_BA_ENGINE", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


def build_problem(
    poses, points, k, obs_cam, obs_pt, obs_uv,
    obs_w=None, fixed_poses=None, fixed_points=None,
    max_obs_per_point: Optional[int] = None,
    obs_depth=None, obs_depth_w=None,
    pose_prior_center=None, pose_prior_sigma=None,
) -> BAProblem:
    """Host-side construction: sorts observations by point, groups them
    by point (static topology → static shapes, padded to K = max obs
    per point), and precomputes the tiled segment engine (see the
    BAProblem field comments) when the topology admits it."""
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)
    n_pts = np.asarray(points).shape[0]
    n_poses = np.asarray(poses).shape[0]
    m = obs_cam.shape[0]
    if obs_w is None:
        obs_w = np.ones(m, np.float32)
    obs_w = np.asarray(obs_w, np.float32)
    if obs_depth is not None:
        obs_depth = np.asarray(obs_depth, np.float32)
        obs_depth_w = np.asarray(
            np.ones(m, np.float32) if obs_depth_w is None else obs_depth_w,
            np.float32)

    prior_center = prior_invs = None
    if pose_prior_center is not None:
        prior_center = np.zeros((n_poses, 3), np.float32)
        prior_invs = np.zeros(n_poses, np.float32)
        prior_center[:] = np.nan_to_num(
            np.asarray(pose_prior_center, np.float32))
        sig = np.asarray(pose_prior_sigma, np.float32)
        # reference clamps σ ≥ 1e-6 (ba.rs:111); σ ≤ 0 / NaN = no prior
        good = np.isfinite(sig) & (sig > 0.0)
        prior_invs[good] = 1.0 / np.maximum(sig[good], 1e-6)

    # sort by point: the segmented reductions become tile-local, and
    # results are order-independent
    perm = np.argsort(obs_pt, kind="stable")
    obs_cam = obs_cam[perm]
    obs_pt = obs_pt[perm]
    obs_uv = obs_uv[perm]
    obs_w = obs_w[perm]
    if obs_depth is not None:
        obs_depth = obs_depth[perm]
        obs_depth_w = obs_depth_w[perm]

    # pad M to a tile multiple with zero-weight observations (they
    # contribute exactly zero everywhere: every accumulated quantity
    # is scaled by obs_w)
    m_pad = -m % _SEG_T
    if m_pad:
        obs_cam = np.concatenate([obs_cam, np.zeros(m_pad, np.int32)])
        obs_pt = np.concatenate(
            [obs_pt, np.full(m_pad, n_pts - 1, np.int32)])
        obs_uv = np.concatenate([obs_uv, np.zeros((m_pad, 2), np.float32)])
        obs_w = np.concatenate([obs_w, np.zeros(m_pad, np.float32)])
        if obs_depth is not None:
            obs_depth = np.concatenate(
                [obs_depth, np.zeros(m_pad, np.float32)])
            obs_depth_w = np.concatenate(
                [obs_depth_w, np.zeros(m_pad, np.float32)])
    mp = m + m_pad

    counts = np.bincount(obs_pt[:m], minlength=n_pts)
    K = int(counts.max()) if max_obs_per_point is None else max_obs_per_point
    K = max(K, 1)
    by_pt = np.zeros((n_pts, K), np.int32)
    by_pt_mask = np.zeros((n_pts, K), bool)
    slot = np.zeros(n_pts, np.int32)
    for i in range(m):
        j = obs_pt[i]
        if slot[j] < K:
            by_pt[j, slot[j]] = i
            by_pt_mask[j, slot[j]] = True
            slot[j] += 1

    # tiled segment engine (point side) + camera one-hot
    seg_oh = seg_ids = cam_oh = None
    enabled = _engine_enabled()
    pt_tiles = obs_pt.reshape(-1, _SEG_T)
    base = pt_tiles.min(axis=1)
    span = pt_tiles.max(axis=1) - base + 1
    if enabled and span.max() <= _SEG_S:
        n_tiles = pt_tiles.shape[0]
        local = pt_tiles - base[:, None]
        seg_oh_np = np.zeros((n_tiles, _SEG_T, _SEG_S), np.float32)
        ti = np.repeat(np.arange(n_tiles), _SEG_T)
        oi = np.tile(np.arange(_SEG_T), n_tiles)
        seg_oh_np[ti, oi, local.reshape(-1)] = 1.0
        ids = base[:, None] + np.arange(_SEG_S)[None, :]
        seg_ids_np = np.clip(ids, 0, n_pts - 1).astype(np.int32)
        # rows clipped at the top contribute zeros (no one-hot mass)
        seg_oh = jnp.asarray(seg_oh_np)
        seg_ids = jnp.asarray(seg_ids_np.reshape(-1))
    if enabled and n_poses * mp * 4 <= _CAM_OH_BYTES:
        # padding columns keep their one-hot (camera 0): reductions
        # through them are exactly zero (every accumulated quantity is
        # obs_w-scaled and padding has w=0) and expansions then return
        # real pose values (zeros would poison downstream quaternion
        # math with NaNs)
        cam_oh_np = np.zeros((n_poses, mp), np.float32)
        cam_oh_np[obs_cam, np.arange(mp)] = 1.0
        cam_oh = jnp.asarray(cam_oh_np)

    return BAProblem(
        poses=jnp.asarray(poses, jnp.float32),
        points=jnp.asarray(points, jnp.float32),
        k=jnp.asarray(k, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_w=jnp.asarray(obs_w, jnp.float32),
        fixed_poses=jnp.zeros(n_poses, bool) if fixed_poses is None else jnp.asarray(fixed_poses),
        fixed_points=jnp.zeros(n_pts, bool) if fixed_points is None else jnp.asarray(fixed_points),
        obs_by_point=jnp.asarray(by_pt),
        obs_by_point_mask=jnp.asarray(by_pt_mask),
        obs_depth=(None if obs_depth is None
                   else jnp.asarray(obs_depth, jnp.float32)),
        obs_depth_w=(None if obs_depth is None
                     else jnp.asarray(obs_depth_w, jnp.float32)),
        seg_oh=seg_oh,
        seg_ids=seg_ids,
        cam_oh=cam_oh,
        prior_center=(None if prior_center is None
                      else jnp.asarray(prior_center)),
        prior_invs=(None if prior_invs is None
                    else jnp.asarray(prior_invs)),
    )


# ---------------------------------------------------------------------------
# residuals + analytic Jacobians
# ---------------------------------------------------------------------------


def prior_terms(poses, prior_center, prior_invs, fixed_poses,
                loss: str, loss_scale: float):
    """Per-pose translation-prior contributions (reference
    ba_schur.rs:666-770, re-derived for this module's LEFT-perturbation
    convention exp(δ)·T — under which ∂C/∂ρ = −Rᵀ and ∂C/∂ω = 0, where
    C = −Rᵀt is the camera centre in world frame).

    Returns (dU (P, 6, 6), dg (P, 6), cost scalar) to add to the pose
    blocks of the normal equations — priors couple to no point, so only
    the on-diagonal camera blocks change (B, V untouched). Priors on
    fixed poses are silently ignored (reference semantics)."""
    rm = lg.quat_to_matrix(poses[:, 0:4])            # (P, 3, 3)
    t = poses[:, 4:7]
    c_pred = -jnp.einsum("pji,pj->pi", rm, t, precision=_HI)  # −Rᵀt
    invs = prior_invs * (~fixed_poses)
    r = (c_pred - prior_center) * invs[:, None]      # whitened (P, 3)
    sq = jnp.sum(r * r, axis=-1)
    w = LOSSES[loss](sq, loss_scale) * (invs > 0.0)
    # J = [−Rᵀ·invσ | 0]  (P, 3, 6)
    j = jnp.concatenate(
        [-jnp.swapaxes(rm, -1, -2) * invs[:, None, None],
         jnp.zeros_like(rm)], axis=-1)
    du = jnp.einsum("pki,pkj->pij", j * w[:, None, None], j, precision=_HI)
    dg = -jnp.einsum("pki,pk->pi", j * w[:, None, None], r, precision=_HI)
    cost = 0.5 * jnp.sum(w * sq)
    return du, dg, cost


def _project_with_jacobians(
    poses: jax.Array, points: jax.Array, k: jax.Array,
    obs_cam: jax.Array, obs_pt: jax.Array, obs_uv: jax.Array,
    obs_depth: Optional[jax.Array] = None,
    obs_depth_w: Optional[jax.Array] = None,
    seg_oh=None, seg_ids=None, cam_oh=None,
):
    """Per-observation residual (M, R), J_pose (M, R, 6) wrt [ρ; ω] left
    perturbation, J_pt (M, R, 3) (reference ba_schur.rs residual/Jacobian
    conventions, :31-36). R = 2 monocular; with ``obs_depth`` an RGB-D
    row ``w_d · (z_cam − depth)`` is appended (R = 3; reference
    BaObservation depth channel, ba.rs:41,83) — the per-row weight rides
    the residual AND Jacobian row so the normal equations see w_d²."""
    pose_i = _expand_cam(poses, obs_cam, cam_oh)   # (M, 7)
    pt_i = _expand_pt(points, obs_pt, seg_oh, seg_ids)  # (M, 3)
    p_cam = lg.se3_apply(pose_i, pt_i)  # (M, 3)
    x, y = p_cam[:, 0], p_cam[:, 1]
    z = jnp.maximum(p_cam[:, 2], _MIN_Z)
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    u = fx * x / z + cx
    v = fy * y / z + cy
    r = jnp.stack([u, v], axis=-1) - obs_uv  # (M, 2)

    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # ∂π/∂p_cam (M, 2, 3)
    jproj = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    if obs_depth is not None:
        dw = (jnp.ones_like(z) if obs_depth_w is None
              else obs_depth_w) * (obs_depth > 0.0)
        r = jnp.concatenate(
            [r, (dw * (p_cam[:, 2] - obs_depth))[:, None]], axis=-1)
        one = jnp.ones_like(x)
        jproj = jnp.concatenate(
            [jproj,
             (dw[:, None] * jnp.stack([zero, zero, one], -1))[:, None]],
            axis=-2)  # (M, 3, 3): ∂(w_d z)/∂p_cam = w_d·[0,0,1]

    # ∂p_cam/∂δ = [I | −[p_cam]×] (left perturbation exp(δ)·T)
    jp_rot = -lg.so3_hat(p_cam)  # (M, 3, 3)
    j_pose = jnp.concatenate(
        [jproj, jnp.einsum("mij,mjk->mik", jproj, jp_rot, precision=_HI)], axis=-1
    )  # (M, R, 6)
    # ∂p_cam/∂X = R
    r_mats = lg.quat_to_matrix(pose_i[:, 0:4])  # (M, 3, 3)
    j_pt = jnp.einsum("mij,mjk->mik", jproj, r_mats, precision=_HI)  # (M, R, 3)
    return r, j_pose, j_pt


def ba_cost(problem: BAProblem, poses=None, points=None, params: BAParams = BAParams()) -> jax.Array:
    """Total robust cost (0.5 Σ w·ρ(‖r‖²))."""
    poses = problem.poses if poses is None else poses
    points = problem.points if points is None else points
    r, _, _ = _project_with_jacobians(
        poses, points, problem.k, problem.obs_cam, problem.obs_pt,
        problem.obs_uv, problem.obs_depth, problem.obs_depth_w,
        seg_oh=problem.seg_oh, seg_ids=problem.seg_ids,
        cam_oh=problem.cam_oh,
    )
    sq = jnp.sum(r * r, axis=-1)
    w = LOSSES[params.loss](sq, params.loss_scale)
    cost = 0.5 * jnp.sum(problem.obs_w * w * sq)
    if problem.prior_center is not None:
        _, _, pc = prior_terms(
            poses, problem.prior_center, problem.prior_invs,
            problem.fixed_poses, params.loss, params.loss_scale)
        cost = cost + pc
    return cost


# ---------------------------------------------------------------------------
# one damped Schur step (shared by single-host and distributed BA)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# tiled segment engine: segmented reductions / expansions without
# scalar-rate scatters and gathers (PERF_NOTES gather cliff: one
# (100k, 3) segment_sum costs ~0.6 ms on v5e; the PCG matvec does four
# such ops per CG step). With observations sorted by point, the
# point-side reduction is a per-tile one-hot contraction on the MXU
# plus a 16x-smaller combine scatter; the camera side is one (P, M)
# one-hot matmul. All paths fall back to segment_sum when the engine
# is absent (unsorted problems, over-span tiles, huge P*M).
# ---------------------------------------------------------------------------


def _seg_sum_pt(vals, obs_pt, n, seg_oh=None, seg_ids=None):
    """segment_sum(vals (M, ...), obs_pt, n) at vector rate."""
    if seg_oh is None:
        return jax.ops.segment_sum(vals, obs_pt, num_segments=n)
    t, tt, s = seg_oh.shape
    trail = vals.shape[1:]
    flat = vals.reshape(t, tt, -1)
    part = jnp.einsum("tos,tok->tsk", seg_oh, flat, precision=_HI)
    out = jax.ops.segment_sum(part.reshape(t * s, -1), seg_ids,
                              num_segments=n)
    return out.reshape((n,) + trail)


def _expand_pt(vals_n, obs_pt, seg_oh=None, seg_ids=None):
    """vals_n[obs_pt] (an (M,)-row gather) at near-vector rate."""
    if seg_oh is None:
        return vals_n[obs_pt]
    t, tt, s = seg_oh.shape
    trail = vals_n.shape[1:]
    rows = vals_n.reshape(vals_n.shape[0], -1)[seg_ids].reshape(t, s, -1)
    out = jnp.einsum("tos,tsk->tok", seg_oh, rows, precision=_HI)
    return out.reshape((t * tt,) + trail)


def _seg_sum_cam(vals, obs_cam, p, cam_oh=None):
    if cam_oh is None:
        return jax.ops.segment_sum(vals, obs_cam, num_segments=p)
    trail = vals.shape[1:]
    out = jnp.einsum("pm,mk->pk", cam_oh,
                     vals.reshape(vals.shape[0], -1), precision=_HI)
    return out.reshape((p,) + trail)


def _expand_cam(vals_p, obs_cam, cam_oh=None):
    if cam_oh is None:
        return vals_p[obs_cam]
    trail = vals_p.shape[1:]
    out = jnp.einsum("pm,pk->mk", cam_oh,
                     vals_p.reshape(vals_p.shape[0], -1), precision=_HI)
    return out.reshape((cam_oh.shape[1],) + trail)


def schur_normal_equations(
    problem: BAProblem, poses: jax.Array, points: jax.Array,
    params: BAParams,
):
    """Accumulate the block normal equations. Returns
    (U (P,6,6), g_p (P,6), V (N,3,3), g_x (N,3), B (M,6,3)) where B is the
    per-observation pose-point coupling block."""
    p = poses.shape[0]
    n = points.shape[0]
    r, j_pose, j_pt = _project_with_jacobians(
        poses, points, problem.k, problem.obs_cam, problem.obs_pt,
        problem.obs_uv, problem.obs_depth, problem.obs_depth_w,
        seg_oh=problem.seg_oh, seg_ids=problem.seg_ids,
        cam_oh=problem.cam_oh,
    )
    sq = jnp.sum(r * r, axis=-1)
    w = problem.obs_w * LOSSES[params.loss](sq, params.loss_scale)
    # zero out obs touching fixed structure handled later via masks
    wj_pose = j_pose * w[:, None, None]
    wj_pt = j_pt * w[:, None, None]

    u_blocks = jnp.einsum("mki,mkj->mij", wj_pose, j_pose, precision=_HI)  # (M,6,6)
    v_blocks = jnp.einsum("mki,mkj->mij", wj_pt, j_pt, precision=_HI)      # (M,3,3)
    b_blocks = jnp.einsum("mki,mkj->mij", wj_pose, j_pt, precision=_HI)    # (M,6,3)
    gp_terms = -jnp.einsum("mki,mk->mi", wj_pose, r, precision=_HI)        # (M,6)
    gx_terms = -jnp.einsum("mki,mk->mi", wj_pt, r, precision=_HI)          # (M,3)

    U = _seg_sum_cam(u_blocks, problem.obs_cam, p, problem.cam_oh)
    g_p = _seg_sum_cam(gp_terms, problem.obs_cam, p, problem.cam_oh)
    V = _seg_sum_pt(v_blocks, problem.obs_pt, n,
                    problem.seg_oh, problem.seg_ids)
    g_x = _seg_sum_pt(gx_terms, problem.obs_pt, n,
                      problem.seg_oh, problem.seg_ids)
    if problem.prior_center is not None:
        du, dg, _ = prior_terms(
            poses, problem.prior_center, problem.prior_invs,
            problem.fixed_poses, params.loss, params.loss_scale)
        U = U + du
        g_p = g_p + dg
    return U, g_p, V, g_x, b_blocks


def reduce_camera_system(
    problem: BAProblem, U, g_p, V, g_x, b_blocks, lam,
):
    """Build the dense reduced camera system S (6P, 6P) and rhs (6P,)
    (reference ba_schur.rs: M = A − B C⁻¹ Bᵀ with B streamed per point)."""
    p = U.shape[0]
    n = V.shape[0]
    eye3 = jnp.eye(3, dtype=jnp.float32)
    # damp V, invert per point; fixed points drop out of the reduction
    v_damped = V + (lam * jnp.maximum(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-9))[..., None, :] * eye3
    active_pt = (~problem.fixed_points) & (problem.obs_by_point_mask.any(axis=1))
    v_inv = jnp.where(
        active_pt[:, None, None],
        inv3x3(v_damped + (~active_pt)[:, None, None] * eye3),
        0.0,
    )  # (N, 3, 3)

    # per-observation Y_i = B_i · V⁻¹[pt_i]
    y_blocks = jnp.einsum(
        "mij,mjk->mik", b_blocks,
        _expand_pt(v_inv, problem.obs_pt,
                   problem.seg_oh, problem.seg_ids), precision=_HI
    )  # (M, 6, 3)

    # rhs_p = g_p − Σ_i Y_i g_x[pt_i]
    rhs_terms = jnp.einsum(
        "mij,mj->mi", y_blocks,
        _expand_pt(g_x, problem.obs_pt,
                   problem.seg_oh, problem.seg_ids), precision=_HI)
    rhs_p = g_p - _seg_sum_cam(rhs_terms, problem.obs_cam, p,
                               problem.cam_oh)

    # S = blockdiag(U damped) − Σ_pt Yc[pt,a] Bc[pt,b]ᵀ where
    # Bc[pt,cam] = Σ_{i: pt_i=pt, cam_i=cam} B_i and Yc = Bc·V⁻¹[pt].
    # This replaces the naive (N, K, K, 6, 6) pairwise tensor (≈1 GB at
    # the 170×3k×100k-obs regime) + 6.9M-row scatter with ONE
    # (6P, 3N)·(3N, 6P) MXU matmul — the TPU-shaped Schur reduction.
    m = b_blocks.shape[0]
    pair_key = problem.obs_pt.astype(jnp.int32) * p + problem.obs_cam
    bc = jax.ops.segment_sum(
        b_blocks.reshape(m, 18), pair_key, num_segments=n * p
    ).reshape(n, p, 6, 3)
    yc = jnp.einsum("npis,nst->npit", bc, v_inv, precision=_HI)
    s = -jnp.einsum("npis,nqjs->pqij", yc, bc, precision=_HI)
    # add damped U on the diagonal
    u_damped = U + (lam * jnp.maximum(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-9))[..., None, :] * jnp.eye(6, dtype=U.dtype)
    s = s.at[jnp.arange(p), jnp.arange(p)].add(u_damped)

    # gauge fixing: fixed poses → identity rows/cols, zero rhs
    free = (~problem.fixed_poses).astype(jnp.float32)
    s = s * free[:, None, None, None] * free[None, :, None, None]
    s = s.at[jnp.arange(p), jnp.arange(p)].add(
        (1.0 - free)[:, None, None] * jnp.eye(6, dtype=s.dtype)
    )
    rhs_p = rhs_p * free[:, None]

    s_dense = s.transpose(0, 2, 1, 3).reshape(p * 6, p * 6)
    return s_dense, rhs_p.reshape(-1), v_inv, y_blocks


def back_substitute_points(
    problem: BAProblem, v_inv, b_blocks, g_x, delta_pose,
):
    """δx_j = V⁻¹_j (g_x_j − Σ_{i ∈ obs(j)} Bᵢᵀ δp[camᵢ])."""
    n = v_inv.shape[0]
    dp_obs = _expand_cam(delta_pose, problem.obs_cam, problem.cam_oh)
    bt_dp = jnp.einsum("mij,mi->mj", b_blocks, dp_obs, precision=_HI)  # (M, 3)
    acc = _seg_sum_pt(bt_dp, problem.obs_pt, n,
                      problem.seg_oh, problem.seg_ids)
    dx = jnp.einsum("nij,nj->ni", v_inv, g_x - acc, precision=_HI)
    return dx * (~problem.fixed_points)[:, None]


def _damped_point_inverses(problem: BAProblem, V, lam):
    eye3 = jnp.eye(3, dtype=jnp.float32)
    v_damped = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-9))[..., None, :] * eye3
    active_pt = (~problem.fixed_points) & (
        problem.obs_by_point_mask.any(axis=1))
    v_inv = jnp.where(
        active_pt[:, None, None],
        inv3x3(v_damped + (~active_pt)[:, None, None] * eye3),
        0.0)
    return v_inv


def _pcg_reduced_solve(problem: BAProblem, U, g_p, V, g_x, b_blocks,
                       lam, cg_iters: int):
    """Matrix-free PCG on the reduced camera system.

    S v = U_d v - sum_i B_i V^-1[pt_i] (sum_{j: pt_j = pt_i} B_j^T
    v[cam_j]) — O(M) einsums + segment sums per CG step; the dense
    (N, P, 6, 3) coupling tensor of the materialized path (3.6 GB at
    1000 poses x 50k points) never exists. Block-Jacobi preconditioner
    = per-pose inverse of the damped U block.
    """
    from kornia_tpu.geometry.linalg import solve_unrolled

    p = U.shape[0]
    n = V.shape[0]
    free = (~problem.fixed_poses).astype(jnp.float32)
    v_inv = _damped_point_inverses(problem, V, lam)
    u_damped = U + (lam * jnp.maximum(
        jnp.diagonal(U, axis1=-2, axis2=-1), 1e-9))[..., None, :] \
        * jnp.eye(6, dtype=U.dtype)

    # rhs = g_p - sum_i B_i V^-1[pt_i] g_x[pt_i], gauge-masked
    yg = jnp.einsum(
        "mij,mj->mi", b_blocks,
        _expand_pt(jnp.einsum("nij,nj->ni", v_inv, g_x),
                   problem.obs_pt, problem.seg_oh, problem.seg_ids),
        precision=_HI)
    rhs = (g_p - _seg_sum_cam(yg, problem.obs_cam, p,
                              problem.cam_oh)) * free[:, None]

    def matvec(v):
        vf = v * free[:, None]
        t1 = jnp.einsum("mij,mi->mj", b_blocks,
                        _expand_cam(vf, problem.obs_cam, problem.cam_oh),
                        precision=_HI)
        t2 = _seg_sum_pt(t1, problem.obs_pt, n,
                         problem.seg_oh, problem.seg_ids)
        t3 = jnp.einsum("nij,nj->ni", v_inv, t2, precision=_HI)
        t4 = jnp.einsum("mij,mj->mi", b_blocks,
                        _expand_pt(t3, problem.obs_pt,
                                   problem.seg_oh, problem.seg_ids),
                        precision=_HI)
        uv = jnp.einsum("pij,pj->pi", u_damped, vf, precision=_HI)
        sv = uv - _seg_sum_cam(t4, problem.obs_cam, p, problem.cam_oh)
        return sv * free[:, None] + v * (1.0 - free[:, None])

    # block-Jacobi preconditioner (identity on fixed poses)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (p, 6, 6))
    m_blocks = jnp.where(free[:, None, None] > 0, u_damped, eye6)
    minv = solve_unrolled(m_blocks, eye6)

    def apply_minv(r):
        return jnp.einsum("pij,pj->pi", minv, r, precision=_HI)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = apply_minv(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, pk, rz = carry
        ap = matvec(pk)
        denom = jnp.sum(pk * ap)
        alive = (rz > 1e-20) & (denom > 1e-20)
        alpha = jnp.where(alive, rz / jnp.maximum(denom, 1e-20), 0.0)
        x = x + alpha * pk
        r = r - alpha * ap
        z = apply_minv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(alive, rz_new / jnp.maximum(rz, 1e-20), 0.0)
        pk = z + beta * pk
        return (x, r, pk, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, p0, rz0), None, length=cg_iters)
    return x, v_inv


def _schur_step(problem: BAProblem, poses, points, lam, params: BAParams):
    U, g_p, V, g_x, b_blocks = schur_normal_equations(problem, poses, points, params)
    p = poses.shape[0]
    use_pcg = params.solver == "pcg" or (
        params.solver == "auto" and p > 400)
    if use_pcg:
        delta_pose, v_inv = _pcg_reduced_solve(
            problem, U, g_p, V, g_x, b_blocks, lam, params.cg_iters)
    else:
        s_dense, rhs, v_inv, _ = reduce_camera_system(problem, U, g_p, V, g_x, b_blocks, lam)
        l = jnp.linalg.cholesky(s_dense)
        yv = jax.scipy.linalg.solve_triangular(l, rhs, lower=True)
        delta_pose = jax.scipy.linalg.solve_triangular(l.T, yv, lower=False).reshape(p, 6)
    delta_pose = delta_pose * (~problem.fixed_poses)[:, None]
    dx = back_substitute_points(problem, v_inv, b_blocks, g_x, delta_pose)
    new_poses = lg.se3_retract(poses, delta_pose)
    new_points = points + dx
    return new_poses, new_points


def bundle_adjust_schur(
    problem: BAProblem, params: BAParams = BAParams()
) -> BAResult:
    """LM-damped Schur BA (reference bundle_adjust_schur, ba_schur.rs:352)."""

    def step(carry, _):
        poses, points, lam, cost = carry
        new_poses, new_points = _schur_step(problem, poses, points, lam, params)
        new_cost = ba_cost(problem, new_poses, new_points, params)
        accept = new_cost < cost
        poses_o = jnp.where(accept, new_poses, poses)
        points_o = jnp.where(accept, new_points, points)
        lam_o = jnp.clip(
            jnp.where(accept, lam / params.lambda_factor, lam * params.lambda_factor),
            1e-10, 1e8,
        )
        cost_o = jnp.where(accept, new_cost, cost)
        return (poses_o, points_o, lam_o, cost_o), cost_o

    c0 = ba_cost(problem, params=params)
    (poses, points, lam, cost), _ = jax.lax.scan(
        step,
        (problem.poses, problem.points, jnp.asarray(params.lambda_init, jnp.float32), c0),
        None,
        length=params.max_iterations,
    )
    return BAResult(
        poses=poses, points=points, initial_cost=c0, final_cost=cost,
        iterations=jnp.asarray(params.max_iterations, jnp.int32),
    )
