"""Perspective-n-Point (reference: kornia-3d/src/pnp/ — epnp.rs (756 LoC),
ap3p.rs, dispatch mod.rs:121, RANSAC wrapper ransac.rs:84, LM refine
refine.rs:46).

Batched solvers: (B, N, 3) world points × (B, N, 2) pixels → (B, pose).
EPnP follows Lepetit et al.: 4 control points from PCA, barycentric
coordinates, 12×12 eigen null-space; the β estimation uses the N=1 case
plus a short Gauss-Newton polish (fixed iterations), which matches cv2's
accuracy on non-degenerate inputs while staying fully batched/jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.geometry.camera import normalize_points, project_points
from kornia_tpu.geometry.linalg import rigid_transform_3d, eigh3x3, inv4x4, svd3
from kornia_tpu.geometry.ransac import RansacResult, ransac


class PnPResult(NamedTuple):
    rotation: jax.Array     # (..., 3, 3) world → camera
    translation: jax.Array  # (..., 3)


# ---------------------------------------------------------------------------
# EPnP
# ---------------------------------------------------------------------------


def _control_points(pts: jax.Array, weights: jax.Array) -> jax.Array:
    """(..., N, 3) → (..., 4, 3): centroid + principal axes scaled by the
    data spread (Lepetit's choice)."""
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    c = jnp.sum(pts * weights[..., None], axis=-2) / wsum
    centered = (pts - c[..., None, :]) * weights[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered) / wsum[..., None]
    evals, evecs = eigh3x3(cov)  # ascending (closed form)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-12))
    axes = evecs * scale[..., None, :]  # columns scaled
    return jnp.concatenate(
        [
            c[..., None, :],
            c[..., None, :] + axes[..., :, 2][..., None, :],
            c[..., None, :] + axes[..., :, 1][..., None, :],
            c[..., None, :] + axes[..., :, 0][..., None, :],
        ],
        axis=-2,
    )


def _barycentric(pts: jax.Array, ctrl: jax.Array) -> jax.Array:
    """alphas (..., N, 4) with pts = Σ αᵢ ctrlᵢ, Σ αᵢ = 1."""
    ones_c = jnp.ones(ctrl.shape[:-1] + (1,), ctrl.dtype)
    ch = jnp.concatenate([ctrl, ones_c], axis=-1)  # (..., 4, 4)
    ones_p = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = jnp.concatenate([pts, ones_p], axis=-1)  # (..., N, 4)
    # alphas = ph @ ch^{-T}
    chinv = inv4x4(jnp.swapaxes(ch, -1, -2))
    return jnp.einsum("...ij,...nj->...ni", chinv, ph)


def pnp_epnp(
    world: jax.Array, pixels: jax.Array, k: jax.Array,
    weights: Optional[jax.Array] = None,
) -> PnPResult:
    """EPnP (batched). world: (..., N, 3); pixels: (..., N, 2); k: (3, 3)."""
    if weights is None:
        weights = jnp.ones(world.shape[:-1], world.dtype)
    ctrl_w = _control_points(world, weights)
    alphas = _barycentric(world, ctrl_w)  # (..., N, 4)

    xn = normalize_points(pixels, k)  # (..., N, 2)
    u, v = xn[..., 0], xn[..., 1]

    # M rows — per point, two equations over the 12 control-point coords
    # [x1 y1 z1 … x4 y4 z4]:  Σⱼ αⱼ xⱼ − u Σⱼ αⱼ zⱼ = 0  (and the v row),
    # in normalized coords (f = 1, c = 0).
    zeros = jnp.zeros_like(alphas)
    row_x = jnp.stack(
        [alphas, zeros, -u[..., :, None] * alphas], axis=-1
    ).reshape(alphas.shape[:-1] + (12,))
    row_y = jnp.stack(
        [zeros, alphas, -v[..., :, None] * alphas], axis=-1
    ).reshape(alphas.shape[:-1] + (12,))
    m = jnp.concatenate([row_x, row_y], axis=-2)  # (..., 2N, 12)
    m = m * jnp.concatenate([weights, weights], axis=-1)[..., None]

    mtm = jnp.einsum("...ni,...nj->...ij", m, m, precision=jax.lax.Precision.HIGHEST)  # (..., 12, 12)
    # smallest eigenvector via ridged inverse iteration on the unrolled
    # 12x12 solve: batched jnp.linalg.eigh is a scalar-rate LAPACK
    # kernel on TPU (256 hypotheses cost ~5 ms — the PnP RANSAC
    # bottleneck; PERF_NOTES small-matrix rule)
    from kornia_tpu.geometry.linalg import solve_unrolled

    ridge = (1e-9 * jnp.trace(mtm, axis1=-2, axis2=-1)
             + 1e-20)[..., None, None]
    m_r = mtm + ridge * np.eye(12, dtype=np.float32)
    vb = jnp.broadcast_to(
        np.full((12,), 1.0 / np.sqrt(12.0), np.float32),
        mtm.shape[:-1])
    for _ in range(4):
        vb = solve_unrolled(m_r, vb[..., None])[..., 0]
        vb = vb / jnp.maximum(
            jnp.linalg.norm(vb, axis=-1, keepdims=True), 1e-30)
    vbasis = vb  # (..., 12) smallest — the N=1 case
    ctrl_c = vbasis.reshape(vbasis.shape[:-1] + (4, 3))

    # fix sign: reconstructed camera points must be in front (mean z > 0)
    z_mean = jnp.sum(
        jnp.einsum("...nj,...jc->...nc", alphas, ctrl_c)[..., 2] * weights, axis=-1
    )
    zsign = jnp.where(z_mean < 0, -1.0, 1.0)
    ctrl_c = ctrl_c * zsign[..., None, None]

    # β scale from distance preservation between control points
    def pdists(c):
        d01 = c[..., 0, :] - c[..., 1, :]
        d02 = c[..., 0, :] - c[..., 2, :]
        d03 = c[..., 0, :] - c[..., 3, :]
        d12 = c[..., 1, :] - c[..., 2, :]
        d13 = c[..., 1, :] - c[..., 3, :]
        d23 = c[..., 2, :] - c[..., 3, :]
        return jnp.stack([d01, d02, d03, d12, d13, d23], axis=-2)

    dw = jnp.linalg.norm(pdists(ctrl_w), axis=-1)
    dc = jnp.linalg.norm(pdists(ctrl_c), axis=-1)
    beta = jnp.sum(dw * dc, axis=-1) / jnp.maximum(jnp.sum(dc * dc, axis=-1), 1e-12)
    ctrl_c = ctrl_c * beta[..., None, None]

    # camera-frame points, then rigid fit world→camera
    pts_c = jnp.einsum("...nj,...jc->...nc", alphas, ctrl_c)

    if world.ndim == 2:
        r, t, _ = rigid_transform_3d(world, pts_c, weights)
    else:
        flat_w = world.reshape((-1,) + world.shape[-2:])
        flat_c = pts_c.reshape((-1,) + pts_c.shape[-2:])
        flat_wt = weights.reshape((-1, weights.shape[-1]))
        r, t = jax.vmap(lambda a, b, c: rigid_transform_3d(a, b, c)[:2])(flat_w, flat_c, flat_wt)
        r = r.reshape(world.shape[:-2] + (3, 3))
        t = t.reshape(world.shape[:-2] + (3,))
    return PnPResult(rotation=r, translation=t)


def pnp_dlt(
    world: jax.Array, pixels: jax.Array, k: jax.Array,
    weights: Optional[jax.Array] = None,
) -> PnPResult:
    """Direct linear transform PnP (≥6 points), batched."""
    if weights is None:
        weights = jnp.ones(world.shape[:-1], world.dtype)
    xn = normalize_points(pixels, k)
    X, Y, Z = world[..., 0], world[..., 1], world[..., 2]
    u, v = xn[..., 0], xn[..., 1]
    ones = jnp.ones_like(X)
    zeros = jnp.zeros_like(X)
    rx = jnp.stack([X, Y, Z, ones, zeros, zeros, zeros, zeros, -u * X, -u * Y, -u * Z, -u], axis=-1)
    ry = jnp.stack([zeros, zeros, zeros, zeros, X, Y, Z, ones, -v * X, -v * Y, -v * Z, -v], axis=-1)
    a = jnp.concatenate([rx, ry], axis=-2)
    a = a * jnp.concatenate([weights, weights], axis=-1)[..., None]
    ata = jnp.einsum("...ni,...nj->...ij", a, a, precision=jax.lax.Precision.HIGHEST)
    _, evecs = jnp.linalg.eigh(ata)
    p = evecs[..., :, 0].reshape(world.shape[:-2] + (3, 4))
    # sign: points must have positive depth
    depth = jnp.einsum("...ij,...nj->...ni", p[..., :3], world)[..., 2] + p[..., None, 2, 3]
    sgn = jnp.sign(jnp.sum(jnp.sign(depth) * weights, axis=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    p = p * sgn[..., None, None]
    # orthogonalize R, recover scale
    m = p[..., :3]
    um, sm, vtm = svd3(m)
    scale = jnp.mean(sm, axis=-1)
    r = um @ vtm
    det = jnp.linalg.det(r)
    # fix improper rotation
    fixd = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    r = um @ (fixd[..., :, None] * vtm)
    t = p[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    return PnPResult(rotation=r, translation=t)


def reprojection_residuals(
    pose: PnPResult, world: jax.Array, pixels: jax.Array, k: jax.Array
) -> jax.Array:
    """(B-posed) squared pixel reprojection errors (B, N)."""
    pts_cam = jnp.einsum("...ij,nj->...ni", pose.rotation, world) + pose.translation[..., None, :]
    proj = project_points(pts_cam, k)
    behind = pts_cam[..., 2] <= 1e-6
    err = jnp.sum((proj - pixels) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def solve_pnp_ransac(
    key: jax.Array,
    world: jax.Array,
    pixels: jax.Array,
    k: jax.Array,
    threshold_px: float = 2.0,
    mask: Optional[jax.Array] = None,
    n_hypotheses: int = 256,
    sample_size: int = 6,
    lo_iters: int = 2,
    method: str = "epnp",
    scoring: str = "msac",
    refine_iters: int = 10,
) -> Tuple[PnPResult, jax.Array, jax.Array]:
    """RANSAC PnP (reference solve_pnp_ransac, pnp/ransac.rs:84;
    method dispatch = reference PnPMethod, pnp/mod.rs:121).

    method "epnp" (default) or "p3p" (Grunert minimal solver, 4-point
    samples, EPnP-weighted local optimization). The winning pose gets a
    reprojection-cost LM polish over the inliers (reference
    pnp/refine.rs:46-75; refine_iters=0 disables). Returns
    (pose, inlier_mask, n_inliers).
    """
    n = world.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)

    if method in ("p3p", "ap3p"):
        sample_size = 4
        minimal = pnp_p3p if method == "p3p" else pnp_ap3p

        def solver(a, b, weights=None):
            if weights is not None:  # LO refit path → weighted EPnP
                return pnp_epnp(a, b, k, weights)
            return minimal(a, b, k)
    elif method == "epnp":
        def solver(a, b, weights=None):
            return pnp_epnp(a, b, k, weights)
    else:
        raise ValueError(f"unknown PnP method {method!r}")

    res = ransac(
        key,
        world,  # x1 slot carries 3-D points; sampled as (B, S, 3)
        pixels,
        solver_fn=solver,
        residual_fn=lambda m, _a, _b: reprojection_residuals(m, world, pixels, k),
        sample_size=sample_size,
        threshold=threshold_px,
        mask=mask,
        n_hypotheses=n_hypotheses,
        lo_iters=lo_iters,
        scoring=scoring,
    )
    pose = res.model
    inliers, n_inliers = res.inliers, res.n_inliers
    if refine_iters > 0:
        from kornia_tpu.geometry.refine import refine_pose_reprojection

        r_ref, t_ref = refine_pose_reprojection(
            pose.rotation, pose.translation, world, pixels, k,
            inliers, iters=refine_iters, threshold_px=threshold_px)
        pose = PnPResult(rotation=r_ref, translation=t_ref)
        sq = reprojection_residuals(pose, world, pixels, k)
        inliers = mask & (sq < threshold_px ** 2)
        n_inliers = jnp.sum(inliers).astype(jnp.int32)
    return pose, inliers, n_inliers


# ---------------------------------------------------------------------------
# P3P (Grunert) — minimal 3-point solver + 4th-point disambiguation
# (reference capability: ap3p.rs / PnPMethod dispatch, pnp/mod.rs:121)
# ---------------------------------------------------------------------------


def pnp_p3p(
    world: jax.Array, pixels: jax.Array, k: jax.Array,
    weights: Optional[jax.Array] = None,
) -> PnPResult:
    """Minimal perspective-3-point pose (Grunert's quartic, Haralick's
    formulation), disambiguated by the 4th correspondence.

    world: (..., 4, 3); pixels: (..., 4, 2). The first 3 rows form the
    minimal set; the 4th picks among the ≤4 physical solutions. Fully
    batched — pairs with geometry.ransac at sample_size=4.
    """
    from kornia_tpu.geometry.linalg import solve_quartic

    del weights  # minimal solver; LO refits route through EPnP
    kinv_f = 1.0 / jnp.stack([k[..., 0, 0], k[..., 1, 1]], -1)
    pp = jnp.stack([k[..., 0, 2], k[..., 1, 2]], -1)
    bearings = jnp.concatenate(
        [(pixels - pp[..., None, :]) * kinv_f[..., None, :],
         jnp.ones_like(pixels[..., :1])], axis=-1)
    f = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    p1, p2, p3 = world[..., 0, :], world[..., 1, :], world[..., 2, :]

    a2 = jnp.sum((p2 - p3) ** 2, -1)
    b2 = jnp.sum((p1 - p3) ** 2, -1)
    c2 = jnp.sum((p1 - p2) ** 2, -1)
    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    ca = jnp.sum(f2 * f3, -1)   # cos α (opposite side a)
    cb = jnp.sum(f1 * f3, -1)
    cg = jnp.sum(f1 * f2, -1)

    ac = (a2 - c2) / b2s
    ac1 = (a2 + c2) / b2s
    # Grunert/Haralick quartic in v = s3/s1
    a4 = (ac - 1.0) ** 2 - 4.0 * c2 / b2s * ca ** 2
    a3 = 4.0 * (ac * (1.0 - ac) * cb
                - (1.0 - ac1) * ca * cg + 2.0 * c2 / b2s * ca ** 2 * cb)
    a2_ = 2.0 * (ac ** 2 - 1.0 + 2.0 * ac ** 2 * cb ** 2
                 + 2.0 * (b2 - c2) / b2s * ca ** 2
                 - 4.0 * ac1 * ca * cb * cg
                 + 2.0 * (b2 - a2) / b2s * cg ** 2)
    a1 = 4.0 * (-ac * (1.0 + ac) * cb + 2.0 * a2 / b2s * cg ** 2 * cb
                - (1.0 - ac1) * ca * cg)
    a0 = (1.0 + ac) ** 2 - 4.0 * a2 / b2s * cg ** 2

    coeffs = jnp.stack([a4, a3, a2_, a1, a0], axis=-1)
    roots = solve_quartic(coeffs)                       # (..., 4) complex
    is_real = jnp.abs(roots.imag) < 1e-4
    v = roots.real
    v_ok = is_real & (v > 1e-6)

    # u = s2/s1 from the linear relation, then absolute depths
    denom = 2.0 * (cg[..., None] - v * ca[..., None])
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    u = ((-1.0 + ac[..., None]) * v ** 2
         - 2.0 * ac[..., None] * cb[..., None] * v
         + 1.0 + ac[..., None]) / denom
    s1_sq = b2s[..., None] / jnp.maximum(
        1.0 + v ** 2 - 2.0 * v * cb[..., None], 1e-12)
    s1 = jnp.sqrt(jnp.maximum(s1_sq, 0.0))
    s2 = u * s1
    s3 = v * s1
    valid = v_ok & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points per root → rigid alignment world → camera
    # stack over points: (..., 4 roots, 3 points, 3)
    cam_pts = jnp.stack([
        s1[..., :, None] * f1[..., None, :],
        s2[..., :, None] * f2[..., None, :],
        s3[..., :, None] * f3[..., None, :]], axis=-2)
    w3 = jnp.broadcast_to(world[..., None, :3, :], cam_pts.shape)
    # rigid_transform_3d is (N, 3)-shaped: vmap over flattened batch+roots
    lead = cam_pts.shape[:-2]
    flat_w = w3.reshape((-1, 3, 3))
    flat_c = cam_pts.reshape((-1, 3, 3))
    r_f, t_f, _ = jax.vmap(
        lambda a, b: rigid_transform_3d(a, b))(flat_w, flat_c)
    r_all = r_f.reshape(lead + (3, 3))
    t_all = t_f.reshape(lead + (3,))

    # disambiguate with the 4th point's reprojection error
    p4 = world[..., 3, :]
    px4 = pixels[..., 3, :]
    cam4 = jnp.einsum("...rij,...j->...ri", r_all, p4) + t_all
    z4 = jnp.where(jnp.abs(cam4[..., 2]) < 1e-9, 1e-9, cam4[..., 2])
    uv4 = cam4[..., :2] / z4[..., None]
    uv4 = uv4 / kinv_f[..., None, :] + pp[..., None, :]
    err4 = jnp.sum((uv4 - px4[..., None, :]) ** 2, -1)
    err4 = jnp.where(valid & (z4 > 0), err4, jnp.inf)
    best = jnp.argmin(err4, axis=-1)
    r_best = jnp.take_along_axis(
        r_all, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t_best = jnp.take_along_axis(
        t_all, best[..., None, None], axis=-2)[..., 0, :]
    return PnPResult(rotation=r_best, translation=t_best)


# ---------------------------------------------------------------------------
# AP3P (Ke & Roumeliotis, CVPR 2017) — algebraic minimal 3-point solver
# (reference pnp/ap3p.rs; distinct numerical behavior from Grunert:
# solves directly for the rotation via two intermediate frames instead
# of for the three depths, so it avoids the depth-quartic's
# conditioning near coplanar-with-center configurations)
# ---------------------------------------------------------------------------


def pnp_ap3p(
    world: jax.Array, pixels: jax.Array, k: jax.Array,
    weights: Optional[jax.Array] = None,
) -> PnPResult:
    """Algebraic P3P, disambiguated by the 4th correspondence.

    world: (..., 4, 3); pixels: (..., 4, 2) like :func:`pnp_p3p`.
    Implements the published AP3P recipe (quartic in cos(theta1') over
    the intermediate frames spanned by the bearing/world baselines),
    fully batched with the closed-form Ferrari quartic + 2 Newton
    polish steps — no data-dependent branching.
    """
    from kornia_tpu.geometry.linalg import solve_quartic

    del weights
    kinv_f = 1.0 / jnp.stack([k[..., 0, 0], k[..., 1, 1]], -1)
    pp = jnp.stack([k[..., 0, 2], k[..., 1, 2]], -1)
    bearings = jnp.concatenate(
        [(pixels - pp[..., None, :]) * kinv_f[..., None, :],
         jnp.ones_like(pixels[..., :1])], axis=-1)
    f = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    b1, b2, b3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    w1, w2, w3 = world[..., 0, :], world[..., 1, :], world[..., 2, :]

    def _norm(v):
        return jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           1e-12)

    u0 = w1 - w2
    nu0 = _norm(u0)[..., 0]
    k1 = u0 / _norm(u0)
    k3r = jnp.cross(b1, b2)
    nk3 = _norm(k3r)[..., 0]
    k3 = k3r / _norm(k3r)
    tz = jnp.cross(b1, k3)
    v1 = jnp.cross(b1, b3)
    v2 = jnp.cross(b2, b3)
    u1 = w1 - w3

    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    u1k1 = dot(u1, k1)
    k3b3 = dot(k3, b3)
    f11 = k3b3
    f13 = dot(k3, v1)
    f15 = -u1k1 * f11
    nl_r = jnp.cross(u1, k1)
    delta = _norm(nl_r)[..., 0]
    nl = nl_r / _norm(nl_r)
    f11 = f11 * delta
    f13 = f13 * delta
    u2k1 = u1k1 - nu0
    f21 = dot(tz, v2)
    f22 = nk3 * k3b3
    f23 = dot(k3, v2)
    f24 = u2k1 * f22
    f25 = -u2k1 * f21
    f21 = f21 * delta
    f22 = f22 * delta
    f23 = f23 * delta

    g1 = f13 * f22
    g2 = f13 * f25 - f15 * f23
    g3 = f11 * f23 - f13 * f21
    g4 = -f13 * f24
    g5 = f11 * f22
    g6 = f11 * f25 - f15 * f21
    g7 = -f15 * f24

    coeffs = jnp.stack([
        g5 * g5 + g1 * g1 + g3 * g3,
        2.0 * (g5 * g6 + g1 * g2 + g3 * g4),
        (g6 * g6 + 2.0 * g5 * g7 + g2 * g2 + g4 * g4
         - g1 * g1 - g3 * g3),
        2.0 * (g6 * g7 - g1 * g2 - g3 * g4),
        g7 * g7 - g2 * g2 - g4 * g4,
    ], axis=-1)
    roots = solve_quartic(coeffs)                      # (..., 4) complex
    ct = roots.real
    scale = jnp.maximum(jnp.max(jnp.abs(roots), axis=-1, keepdims=True),
                        1.0)
    is_real = jnp.abs(roots.imag) < 1e-4 * scale

    # 2 Newton polish steps on the real parts (reference
    # polish_quartic_roots)
    for _ in range(2):
        err = ((((coeffs[..., 0:1] * ct + coeffs[..., 1:2]) * ct
                 + coeffs[..., 2:3]) * ct + coeffs[..., 3:4]) * ct
               + coeffs[..., 4:5])
        der = (((4.0 * coeffs[..., 0:1] * ct + 3.0 * coeffs[..., 1:2])
                * ct + 2.0 * coeffs[..., 2:3]) * ct + coeffs[..., 3:4])
        der = jnp.where(jnp.abs(der) < 1e-12, 1e-12, der)
        ct = ct - err / der

    valid = is_real & (jnp.abs(ct) <= 1.0)
    ctc = jnp.clip(ct, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ctc * ctc, 0.0))
    st = st * jnp.where(k3b3 < 0.0, -1.0, 1.0)[..., None]

    ct3 = g1[..., None] * ctc + g2[..., None]
    st3 = g3[..., None] * ctc + g4[..., None]
    nt3_den = ((g5[..., None] * ctc + g6[..., None]) * ctc
               + g7[..., None])
    nt3_den = jnp.where(jnp.abs(nt3_den) < 1e-12, 1e-12, nt3_den)
    nt3 = st / nt3_den
    ct3 = ct3 * nt3
    st3 = st3 * nt3

    # C13 rotation per root: (..., 4, 3, 3)
    zero = jnp.zeros_like(ct3)
    c13 = jnp.stack([
        jnp.stack([ct3, zero, -st3], -1),
        jnp.stack([st * st3, ctc, st * ct3], -1),
        jnp.stack([ctc * st3, -st, ctc * ct3], -1),
    ], axis=-2)

    temp = jnp.cross(k1, nl)
    ck1nl = jnp.stack([k1, nl, temp], axis=-1)         # (..., 3, 3) cols
    cb1k3tz = jnp.stack([b1, k3, tz], axis=-2)         # (..., 3, 3) rows

    r_cw = jnp.einsum("...ij,...rjk,...kl->...ril", ck1nl, c13, cb1k3tz)
    # world->camera: R = r_cw^T, t = s(theta1')*(delta/k3b3)*b3 - R^T... 
    # (reference: solutions_t = stheta1p*b3p - r_mat^T w3; R_out = r_mat^T)
    b3p = (delta / jnp.where(jnp.abs(k3b3) < 1e-12, 1e-12, k3b3)
           )[..., None] * b3
    rp3 = jnp.einsum("...rij,...i->...rj", r_cw, w3)   # r_mat^T w3
    t_all = st[..., None] * b3p[..., None, :] - rp3
    r_all = jnp.swapaxes(r_cw, -1, -2)

    # disambiguate with the 4th point (same protocol as pnp_p3p)
    p4 = world[..., 3, :]
    px4 = pixels[..., 3, :]
    cam4 = jnp.einsum("...rij,...j->...ri", r_all, p4) + t_all
    z4 = jnp.where(jnp.abs(cam4[..., 2]) < 1e-9, 1e-9, cam4[..., 2])
    uv4 = cam4[..., :2] / z4[..., None]
    uv4 = uv4 / kinv_f[..., None, :] + pp[..., None, :]
    err4 = jnp.sum((uv4 - px4[..., None, :]) ** 2, -1)
    # cheirality on the three minimal points
    cam123 = (jnp.einsum("...rij,...pj->...rpi", r_all,
                         world[..., :3, :])
              + t_all[..., None, :])
    che = jnp.all(cam123[..., 2] > 0, axis=-1)
    err4 = jnp.where(valid & che & (z4 > 0), err4, jnp.inf)
    best = jnp.argmin(err4, axis=-1)
    r_best = jnp.take_along_axis(
        r_all, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t_best = jnp.take_along_axis(
        t_all, best[..., None, None], axis=-2)[..., 0, :]
    return PnPResult(rotation=r_best, translation=t_best)
