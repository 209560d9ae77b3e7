"""Epipolar geometry: fundamental / essential / homography estimation
(reference: kornia-3d/src/pose/ — fundamental.rs (8-pt, 920 LoC),
essential.rs (decomposition), homography.rs (DLT + decomposition),
twoview.rs Sampson scoring).

TPU-first: every solver is *batched over minimal samples* — RANSAC calls
these with (B, 8, 2) point sets and gets (B, 3, 3) models back, so all
hypotheses are solved as one SVD batch (SURVEY.md §3.3: "batched
hypothesize-and-verify ... the design divergence to embrace").
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import homogenize, inv3x3


def _det_lu(m: jax.Array) -> jax.Array:
    """Batched determinant of (..., n, n) via unrolled partial-pivot LU.

    Every step is elementwise/select over the batch — no LAPACK-style
    iterative kernel. TPU eigh/svd on thousands of tiny matrices run at
    scalar rate (512 9×9 eighs ≈ 10 ms); this is vector-rate.
    """
    n = m.shape[-1]
    det = jnp.ones(m.shape[:-2], m.dtype)
    sign = jnp.ones(m.shape[:-2], m.dtype)
    rows = np.arange(n)
    for k in range(n):
        col = m[..., :, k]
        cand = jnp.where(rows >= k, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=-1)                       # (...,)
        e_p = (rows == p[..., None]).astype(m.dtype)        # (..., n)
        e_k = jnp.zeros((n,), m.dtype).at[k].set(1.0)
        row_k = m[..., k, :]
        row_p = jnp.einsum("...r,...rc->...c", e_p, m)
        m = (m
             - e_k[..., :, None] * (row_k - row_p)[..., None, :]
             - e_p[..., None] * (row_p - row_k)[..., None, :])
        sign = sign * jnp.where(p == k, 1.0, -1.0)
        piv = m[..., k, k]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1.0)
        factor = jnp.where(rows > k, m[..., :, k] / safe[..., None], 0.0)
        m = m - factor[..., None] * m[..., k, None, :]
    return det * sign


def _nullvec_cramer(a: jax.Array) -> jax.Array:
    """Exact null vector of a minimal (..., n, n+1) system via Cramer:
    v_j = (−1)^j det(A with column j dropped). One batched LU-det over
    the (n+1) minors — fully vectorized, no eigh."""
    n = a.shape[-2]
    d = a.shape[-1]
    minors = jnp.stack(
        [a[..., :, [c for c in range(d) if c != j]] for j in range(d)],
        axis=-3)                                   # (..., d, n, n)
    dets = _det_lu(minors)                         # (..., d)
    signs = np.asarray([(-1.0) ** j for j in range(d)], np.float32)
    v = dets * signs
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(nrm, 1e-30)


def _eigvec_min_sym3(s: jax.Array) -> jax.Array:
    """Smallest-eigenvalue unit eigenvector of symmetric (..., 3, 3),
    closed form (Cardano roots + Cayley–Hamilton column extraction) —
    replaces per-hypothesis 3×3 SVD/eigh (scalar rate on TPU)."""
    q = jnp.trace(s, axis1=-2, axis2=-1) / 3.0
    p1 = s[..., 0, 1] ** 2 + s[..., 0, 2] ** 2 + s[..., 1, 2] ** 2
    dif = jnp.stack([s[..., 0, 0] - q, s[..., 1, 1] - q,
                     s[..., 2, 2] - q], axis=-1)
    p2 = jnp.sum(dif * dif, axis=-1) + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    eye = np.eye(3, dtype=np.float32)
    b = (s - q[..., None, None] * eye) / p[..., None, None]
    det_b = (b[..., 0, 0] * (b[..., 1, 1] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 1])
             - b[..., 0, 1] * (b[..., 1, 0] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 0])
             + b[..., 0, 2] * (b[..., 1, 0] * b[..., 2, 1] - b[..., 1, 1] * b[..., 2, 0]))
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3
    m = ((s - lam1[..., None, None] * eye)
         @ (s - lam2[..., None, None] * eye))  # columns ∝ v_min
    nrm2 = jnp.sum(m * m, axis=-2)                          # (..., 3)
    j = jnp.argmax(nrm2, axis=-1)
    col = jnp.take_along_axis(
        m, j[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    # degenerate (isotropic / p≈0): any unit vector is valid
    col = jnp.where((p2 > 1e-24)[..., None], col,
                    np.asarray([1.0, 0.0, 0.0], np.float32))
    return col / jnp.maximum(
        jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-30)


def _nullvec(a: jax.Array) -> jax.Array:
    """Smallest right-singular vector of (..., N, D).

    Minimal systems (N == D−1, the per-hypothesis RANSAC shape) go
    through the vectorized Cramer path; overdetermined systems use eigh
    of AᵀA. SVD with full_matrices=False drops the null vector when
    N == D−1, and batched eigh/svd on tiny matrices is scalar-rate on
    TPU — the Cramer path cut the 512-hypothesis 8-pt solve from 9.8 ms
    to vector rate (PERF_NOTES.md).
    """
    if a.shape[-2] == a.shape[-1] - 1:
        return _nullvec_cramer(a)
    ata = jnp.einsum("...ni,...nj->...ij", a, a, precision=jax.lax.Precision.HIGHEST)
    _, evecs = jnp.linalg.eigh(ata)  # ascending eigenvalues
    return evecs[..., :, 0]


# ---------------------------------------------------------------------------
# normalization (Hartley)
# ---------------------------------------------------------------------------


def normalize_points2d(pts: jax.Array, mask: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization: zero-mean, mean distance √2.

    pts: (..., N, 2); mask: (..., N) optional validity. Returns (pts_norm,
    T (..., 3, 3)) with pts_norm = T · pts.
    """
    if mask is None:
        w = jnp.ones(pts.shape[:-1], pts.dtype)
    else:
        w = mask.astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    centered = (pts - mean) * w[..., None]
    d = jnp.sqrt(jnp.sum(centered * centered, axis=-1))
    mean_d = jnp.sum(d, axis=-1, keepdims=True) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    s = scale[..., 0]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    t = jnp.stack(
        [s, zero, -s * mx, zero, s, -s * my, zero, zero, one], axis=-1
    ).reshape(pts.shape[:-2] + (3, 3))
    pn = (pts - mean) * scale[..., None]
    return pn, t


# ---------------------------------------------------------------------------
# fundamental matrix — normalized 8-point (batched)
# ---------------------------------------------------------------------------


def fundamental_8pt(x1: jax.Array, x2: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """(..., N≥8, 2) correspondences → (..., 3, 3) F with x2ᵀ F x1 = 0
    (reference fundamental.rs 8-pt DLT + rank-2 projection)."""
    p1, t1 = normalize_points2d(x1, weights)
    p2, t2 = normalize_points2d(x2, weights)
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(u1)
    a = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (..., N, 9)
    if weights is not None:
        a = a * weights[..., None]
    f = _nullvec(a).reshape(x1.shape[:-2] + (3, 3))
    # rank-2 projection WITHOUT a batched 3×3 SVD (scalar rate on TPU):
    # F' = F − σ₃u₃v₃ᵀ = F(I − v₃v₃ᵀ) where v₃ is the smallest
    # eigenvector of FᵀF (closed form) and Fv₃ = σ₃u₃.
    v3 = _eigvec_min_sym3(jnp.swapaxes(f, -1, -2) @ f)
    f = f - (f @ v3[..., :, None]) * v3[..., None, :]
    # denormalize: F = T2ᵀ F T1
    f = jnp.swapaxes(t2, -1, -2) @ f @ t1
    # canonical scale
    norm = jnp.linalg.norm(f.reshape(f.shape[:-2] + (9,)), axis=-1)[..., None, None]
    return f / jnp.maximum(norm, 1e-12)


def essential_from_fundamental(f: jax.Array, k1: jax.Array, k2: jax.Array) -> jax.Array:
    """E = K2ᵀ F K1, with singular values projected to (1, 1, 0)."""
    e = jnp.swapaxes(k2, -1, -2) @ f @ k1
    u, s, vt = jnp.linalg.svd(e)
    s_proj = jnp.stack([jnp.ones_like(s[..., 0]), jnp.ones_like(s[..., 0]), jnp.zeros_like(s[..., 0])], axis=-1)
    return u @ (s_proj[..., :, None] * vt)


# ---------------------------------------------------------------------------
# residuals
# ---------------------------------------------------------------------------


def sampson_distance(f: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) distance², pixels²
    (reference twoview.rs RANSAC scoring). f: (..., 3, 3); x: (..., N, 2)."""
    p1 = homogenize(x1)  # (..., N, 3)
    p2 = homogenize(x2)
    fx1 = jnp.einsum("...ij,...nj->...ni", f, p1)
    ftx2 = jnp.einsum("...ji,...nj->...ni", f, p2)
    num = jnp.sum(p2 * fx1, axis=-1) ** 2
    den = fx1[..., 0] ** 2 + fx1[..., 1] ** 2 + ftx2[..., 0] ** 2 + ftx2[..., 1] ** 2
    # a (near-)zero F gives 0/0 — that must be a REJECTION, not a perfect
    # fit, or degenerate RANSAC hypotheses win with zero residual
    return jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 1e12)


def epipolar_distance(f: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Symmetric point-to-epiline distance²."""
    p1 = homogenize(x1)
    p2 = homogenize(x2)
    fx1 = jnp.einsum("...ij,...nj->...ni", f, p1)
    ftx2 = jnp.einsum("...ji,...nj->...ni", f, p2)
    dot = jnp.sum(p2 * fx1, axis=-1) ** 2
    d1 = dot / jnp.maximum(fx1[..., 0] ** 2 + fx1[..., 1] ** 2, 1e-12)
    d2 = dot / jnp.maximum(ftx2[..., 0] ** 2 + ftx2[..., 1] ** 2, 1e-12)
    return 0.5 * (d1 + d2)


# ---------------------------------------------------------------------------
# essential decomposition (reference essential.rs)
# ---------------------------------------------------------------------------

# numpy, not jnp: a module-level DEVICE constant captured into a jitted
# program costs ~34 ms/dispatch through the axon tunnel AND poisons all
# later dispatches in the process (PERF_NOTES.md); np constants fold
# in-trace for free.
_W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)


def decompose_essential(e: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """E → (4, ..., 3, 3) rotations and (4, ..., 3) translations:
    the four (R, t) chirality candidates [R1|t], [R1|−t], [R2|t], [R2|−t]."""
    u, _, vt = jnp.linalg.svd(e)
    # enforce proper rotations
    du = jnp.sign(jnp.linalg.det(u))[..., None, None]
    dv = jnp.sign(jnp.linalg.det(vt))[..., None, None]
    u = u * du
    vt = vt * dv
    r1 = u @ _W @ vt
    r2 = u @ _W.T @ vt
    t = u[..., :, 2]
    tn = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([tn, -tn, tn, -tn])
    return rs, ts


# ---------------------------------------------------------------------------
# homography — DLT (batched) + decomposition
# ---------------------------------------------------------------------------


def homography_dlt(x1: jax.Array, x2: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """(..., N≥4, 2) → (..., 3, 3) H with x2 ~ H x1 (reference homography.rs)."""
    p1, t1 = normalize_points2d(x1, weights)
    p2, t2 = normalize_points2d(x2, weights)
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(u1)
    zeros = jnp.zeros_like(u1)
    ax = jnp.stack([-u1, -v1, -ones, zeros, zeros, zeros, u2 * u1, u2 * v1, u2], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, -u1, -v1, -ones, v2 * u1, v2 * v1, v2], axis=-1)
    a = jnp.concatenate([ax, ay], axis=-2)  # (..., 2N, 9)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        a = a * w2[..., None]
    h = _nullvec(a).reshape(x1.shape[:-2] + (3, 3))
    h = inv3x3(t2) @ h @ t1
    return h / jnp.where(jnp.abs(h[..., 2:3, 2:3]) < 1e-12, 1e-12, h[..., 2:3, 2:3])


def homography_transfer_error(h: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Symmetric transfer error² in pixels² (used by H-RANSAC scoring)."""
    p1 = homogenize(x1)
    hx1 = jnp.einsum("...ij,...nj->...ni", h, p1)
    fwd = hx1[..., :2] / jnp.where(jnp.abs(hx1[..., 2:]) < 1e-12, 1e-12, hx1[..., 2:])
    e_fwd = jnp.sum((fwd - x2) ** 2, axis=-1)
    hinv = inv3x3(h)
    p2 = homogenize(x2)
    hx2 = jnp.einsum("...ij,...nj->...ni", hinv, p2)
    bwd = hx2[..., :2] / jnp.where(jnp.abs(hx2[..., 2:]) < 1e-12, 1e-12, hx2[..., 2:])
    e_bwd = jnp.sum((bwd - x1) ** 2, axis=-1)
    return 0.5 * (e_fwd + e_bwd)


def decompose_homography(h: jax.Array, k1: jax.Array, k2: jax.Array):
    """Exact decomposition of a calibrated homography H = R + t·nᵀ into its
    4 physical (R, t, n) candidates — Ma/Soatto "Invitation to 3-D Vision"
    Algorithm 5.2 (reference homography.rs decompose).

    Returns (rs (4, ..., 3, 3), ts (4, ..., 3), ns (4, ..., 3)).
    """
    hn = jnp.linalg.inv(k2) @ h @ k1
    # fix overall sign so that xᵀ Hn x > 0 for points in front; use det sign
    det = jnp.linalg.det(hn)
    hn = hn * jnp.sign(det)[..., None, None]
    # normalize: σ₂(Hn) = 1
    _, s, _ = jnp.linalg.svd(hn)
    hn = hn / s[..., 1:2, None]

    A = jnp.swapaxes(hn, -1, -2) @ hn
    evals, evecs = jnp.linalg.eigh(A)  # ascending: σ3² ≤ σ2²=1 ≤ σ1²
    s3sq = jnp.maximum(evals[..., 0], 0.0)
    s1sq = jnp.maximum(evals[..., 2], 0.0)
    v3 = evecs[..., :, 0]  # eigenvector of σ3²
    v2 = evecs[..., :, 1]
    v1 = evecs[..., :, 2]  # eigenvector of σ1²

    denom = jnp.sqrt(jnp.maximum(s1sq - s3sq, 1e-12))[..., None]
    a = jnp.sqrt(jnp.maximum(1.0 - s3sq, 0.0))[..., None]
    b = jnp.sqrt(jnp.maximum(s1sq - 1.0, 0.0))[..., None]
    u1 = (a * v1 + b * v3) / denom
    u2 = (a * v1 - b * v3) / denom

    def frame(u):
        c = jnp.cross(v2, u)
        U = jnp.stack([v2, u, c], axis=-1)  # columns
        hv2 = jnp.einsum("...ij,...j->...i", hn, v2)
        hu = jnp.einsum("...ij,...j->...i", hn, u)
        W = jnp.stack([hv2, hu, jnp.cross(hv2, hu)], axis=-1)
        r = W @ jnp.swapaxes(U, -1, -2)
        n = c
        t = jnp.einsum("...ij,...j->...i", hn - r, n)
        return r, t, n

    r1, t1, n1 = frame(u1)
    r2, t2, n2 = frame(u2)
    # 4 candidates: (R, t, n) and the (−t, −n) mirror of each
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    return rs, ts, ns
