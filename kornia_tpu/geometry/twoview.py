"""Two-view relative pose estimation — the SLAM bootstrap
(reference: kornia-3d/src/pose/twoview.rs — TwoViewEstimator :460,
estimate :1437: parallel F‖H RANSAC, model pick by inlier ratio,
essential/homography decomposition, cheirality vote, triangulation).

TPU design: both RANSACs are batched programs inside ONE jitted function —
XLA schedules the independent F and H subgraphs concurrently (the
reference uses rayon::join, twoview.rs:1449). The cheirality vote over the
4 (R, t) candidates is a vmapped closed-form midpoint evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kornia_tpu.geometry import epipolar as epi
from kornia_tpu.geometry import triangulation as tri
from kornia_tpu.geometry.camera import normalize_points
from kornia_tpu.geometry.ransac import RansacResult, ransac


@dataclasses.dataclass(frozen=True)
class TwoViewParams:
    """Reference RansacParams + estimator knobs (twoview.rs:130-160)."""

    n_hypotheses: int = 512
    threshold_px: float = 1.5
    h_threshold_px: float = 3.0
    lo_iters: int = 2
    # pick H when its inlier support is ≥ ratio × F's — for planar/low-
    # parallax scenes F fits everything H fits, so near-parity means planar
    # (ORB-SLAM's RH heuristic; reference twoview.rs:1456 model pick)
    h_over_e_ratio: float = 0.9
    min_parallax_cos: float = 0.99998
    # epipolar solver: "8pt" (fundamental DLT, default — the reference's
    # Fundamental8ptSolver) or "5pt" (Nistér essential,
    # EssentialNister5ptSolver — calibrated, 6-point samples with
    # 6th-point disambiguation)
    solver: str = "8pt"
    # Sampson-cost LM iterations on the winning pose (reference
    # LmRefiner, twoview.rs:336; 0 disables). Runs as two annealed
    # phases (2*tau then tau).
    refine_iters: int = 12


class TwoViewResult(NamedTuple):
    """Reference TwoViewResult (twoview.rs:557)."""

    rotation: jax.Array      # (3, 3) R: cam1 → cam2
    translation: jax.Array   # (3,) unit-norm t
    model: jax.Array         # (3, 3) winning F (or H mapped through)
    use_homography: jax.Array  # () bool — which model won
    inliers: jax.Array       # (N,) bool
    n_inliers: jax.Array     # () int32
    points3d: jax.Array      # (N, 3) triangulated (in cam1 frame; masked)
    cheirality_votes: jax.Array  # (4,) votes per (R, t) candidate


def estimate_relative_pose(
    key: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    mask: Optional[jax.Array] = None,
    params: TwoViewParams = TwoViewParams(),
) -> TwoViewResult:
    """Full two-view bootstrap on (N, 2) pixel correspondences."""
    n = x1.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    kf, kh = jax.random.split(key)

    # --- epipolar RANSAC: 8pt F (Sampson scoring) or Nistér 5pt E ---
    if params.solver == "5pt":
        from kornia_tpu.geometry.essential5pt import essential_5pt

        kinv1 = jnp.linalg.inv(k1)
        kinv2 = jnp.linalg.inv(k2)
        xn1_all = normalize_points(x1, k1)
        xn2_all = normalize_points(x2, k2)

        def solve_e(a, b, weights=None):
            if weights is not None:  # LO refit → weighted 8-pt on E
                return epi.fundamental_8pt(a, b, weights)
            return essential_5pt(a, b)

        # residuals in pixel units: F = K2⁻ᵀ E K1⁻¹
        def resid_e(models, _a, _b):
            f_px = jnp.swapaxes(kinv2, -1, -2) @ models @ kinv1
            return epi.sampson_distance(f_px, x1, x2)

        e_res = ransac(
            kf, xn1_all, xn2_all,
            solver_fn=solve_e,
            residual_fn=resid_e,
            sample_size=6,
            threshold=params.threshold_px,
            mask=mask,
            n_hypotheses=params.n_hypotheses,
            lo_iters=params.lo_iters,
        )
        f_model = jnp.swapaxes(kinv2, -1, -2) @ e_res.model @ kinv1
        f_model = f_model / jnp.maximum(
            jnp.linalg.norm(f_model.reshape(9)), 1e-12)
        f_res = e_res._replace(model=f_model)
    else:
        f_res = ransac(
            kf, x1, x2,
            solver_fn=lambda a, b, weights=None: epi.fundamental_8pt(a, b, weights),
            residual_fn=epi.sampson_distance,
            sample_size=8,
            threshold=params.threshold_px,
            mask=mask,
            n_hypotheses=params.n_hypotheses,
            lo_iters=params.lo_iters,
        )

    # --- H-RANSAC (4-point DLT, symmetric transfer scoring) ---
    h_res = ransac(
        kh, x1, x2,
        solver_fn=lambda a, b, weights=None: epi.homography_dlt(a, b, weights),
        residual_fn=epi.homography_transfer_error,
        sample_size=4,
        threshold=params.h_threshold_px,
        mask=mask,
        n_hypotheses=params.n_hypotheses,
        lo_iters=params.lo_iters,
    )

    use_h = h_res.n_inliers.astype(jnp.float32) > (
        params.h_over_e_ratio * f_res.n_inliers.astype(jnp.float32)
    )

    # --- candidate poses ---
    e = epi.essential_from_fundamental(f_res.model, k1, k2)
    rs_e, ts_e = epi.decompose_essential(e)  # (4, 3, 3), (4, 3)
    rs_h, ts_h, _ = epi.decompose_homography(h_res.model, k1, k2)  # same shapes
    ts_h_norm = ts_h / jnp.maximum(jnp.linalg.norm(ts_h, axis=-1, keepdims=True), 1e-12)

    rs = jnp.where(use_h, rs_h, rs_e)
    ts = jnp.where(use_h, ts_h_norm, ts_e)
    inliers = jnp.where(use_h, h_res.inliers, f_res.inliers)

    # --- cheirality vote over the candidates (vmapped closed form) ---
    xn1 = normalize_points(x1, k1)
    xn2 = normalize_points(x2, k2)
    votes = jax.vmap(
        lambda r, t: tri.count_cheirality(
            r, t, xn1, xn2, mask=inliers, min_parallax_cos=params.min_parallax_cos
        )
    )(rs, ts)
    winner = jnp.argmax(votes)
    r_best = rs[winner]
    t_best = ts[winner]

    # --- Sampson-cost LM refinement of the winner (twoview.rs:336) ---
    if params.refine_iters > 0:
        from kornia_tpu.geometry.refine import refine_pose_sampson

        r_best, t_best = refine_pose_sampson(
            r_best, t_best, x1, x2, k1, k2, inliers,
            iters=params.refine_iters,
            threshold_px=params.threshold_px)
        # re-derive the epipolar inlier set from the refined pose
        ex = jnp.stack([
            jnp.stack([0.0 * t_best[0], -t_best[2], t_best[1]]),
            jnp.stack([t_best[2], 0.0 * t_best[0], -t_best[0]]),
            jnp.stack([-t_best[1], t_best[0], 0.0 * t_best[0]]),
        ])
        f_ref = (jnp.linalg.inv(k2).T @ (ex @ r_best)
                 @ jnp.linalg.inv(k1))
        sq = epi.sampson_distance(f_ref, x1, x2)
        inliers = mask & (sq < params.threshold_px ** 2)

    # --- triangulate inliers with the winning pose ---
    eye3 = jnp.eye(3, dtype=x1.dtype)
    p1 = tri.projection_matrix(eye3, jnp.zeros(3, x1.dtype), k1)
    p2 = tri.projection_matrix(r_best, t_best, k2)
    pts3d = tri.triangulate_dlt(p1, p2, x1, x2)

    return TwoViewResult(
        rotation=r_best,
        translation=t_best,
        model=jnp.where(use_h, h_res.model, f_res.model),
        use_homography=use_h,
        inliers=inliers,
        n_inliers=jnp.where(use_h, h_res.n_inliers, f_res.n_inliers),
        points3d=pts3d,
        cheirality_votes=votes,
    )
