"""Small linear-algebra utilities for geometric vision
(reference: kornia-algebra/src/linalg/ — svd.rs svd3, rigid.rs Umeyama).

Batched and jittable; f32 with conditioning via normalization (SURVEY.md §7
"f64 → f32 + compensated where needed").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def eigh3x3(s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Full closed-form eigendecomposition of symmetric (..., 3, 3):
    (evals ascending (..., 3), evecs (..., 3, 3) columns).

    Cardano roots + Cayley–Hamilton column extraction, robust to one
    repeated eigenvalue pair (the extraction for the isolated eigenvalue
    stays well-conditioned; the middle vector is the cross product).
    Batched XLA eigh runs at scalar rate on TPU (PERF_NOTES.md) — this
    is pure vector arithmetic, mirroring the reference's analytic SVD3
    (kornia-algebra svd.rs:457) rationale on NEON.
    """
    import numpy as np

    q = jnp.trace(s, axis1=-2, axis2=-1) / 3.0
    p1 = s[..., 0, 1] ** 2 + s[..., 0, 2] ** 2 + s[..., 1, 2] ** 2
    dif = jnp.stack([s[..., 0, 0] - q, s[..., 1, 1] - q,
                     s[..., 2, 2] - q], axis=-1)
    p2 = jnp.sum(dif * dif, axis=-1) + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    eye = np.eye(3, dtype=np.float32)
    b = (s - q[..., None, None] * eye) / p[..., None, None]
    det_b = (b[..., 0, 0] * (b[..., 1, 1] * b[..., 2, 2]
                             - b[..., 1, 2] * b[..., 2, 1])
             - b[..., 0, 1] * (b[..., 1, 0] * b[..., 2, 2]
                               - b[..., 1, 2] * b[..., 2, 0])
             + b[..., 0, 2] * (b[..., 1, 0] * b[..., 2, 1]
                               - b[..., 1, 1] * b[..., 2, 0]))
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)   # smallest
    lam2 = 3.0 * q - lam1 - lam3

    def extract(la, lb):
        # columns of (S − λa)(S − λb) ∝ the remaining eigenvector
        m = ((s - la[..., None, None] * eye)
             @ (s - lb[..., None, None] * eye))
        nrm2 = jnp.sum(m * m, axis=-2)
        j = jnp.argmax(nrm2, axis=-1)
        col = jnp.take_along_axis(
            m, j[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
        col = jnp.where((p2 > 1e-24)[..., None], col,
                        np.asarray([1.0, 0.0, 0.0], np.float32))
        return col / jnp.maximum(
            jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-30)

    v3 = extract(lam1, lam2)         # smallest (isolated unless λ2≈λ3)
    v1 = extract(lam2, lam3)         # largest (garbage when λ1≈λ2 — but
    # then ANY vector ⊥ v3 is an eigenvector, so orthogonalizing against
    # v3 with a perpendicular fallback is always valid)
    v1 = v1 - jnp.sum(v1 * v3, axis=-1, keepdims=True) * v3
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = jnp.where(n1 > 1e-6, v1 / jnp.maximum(n1, 1e-30), _perp(v3))
    v2 = jnp.cross(v3, v1)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True),
                          1e-30)
    evecs = jnp.stack([v3, v2, v1], axis=-1)   # columns, ascending
    evals = jnp.stack([lam3, lam2, lam1], axis=-1)
    return evals, evecs


def _perp(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to each (..., 3) unit vector."""
    import numpy as np

    ex = np.asarray([1.0, 0.0, 0.0], np.float32)
    ey = np.asarray([0.0, 1.0, 0.0], np.float32)
    alt = jnp.where((jnp.abs(v[..., 0:1]) < 0.9), ex, ey)
    w = jnp.cross(v, alt)
    return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                           1e-30)


def svd3(m: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched closed-form 3×3 SVD (descending σ), (u, s, vt).

    V from eigh3x3(MᵀM), σ = √λ, U = MVΣ⁻¹ with the degenerate third
    column rebuilt via cross product (rank-2 inputs — Procrustes/
    rank-projection uses). The reference ships the same analytic-SVD3
    design for scalar speed (svd.rs:457); on TPU it dodges the
    scalar-rate batched LAPACK kernel.
    """
    mtm = jnp.swapaxes(m, -1, -2) @ m
    evals, v = eigh3x3(mtm)
    # descending order
    sig = jnp.sqrt(jnp.maximum(evals[..., ::-1], 0.0))      # (..., 3)
    v = v[..., ::-1]                                        # columns desc
    u = m @ v
    s0 = jnp.maximum(sig[..., 0], 1e-20)
    # column-wise with rank fallbacks: σ ratios below √eps(f32) ≈ 1e-3
    # make the quotient direction noise — rebuild orthogonally instead
    u1 = u[..., 0] / jnp.maximum(sig[..., 0:1], 1e-20)
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True),
                          1e-30)
    u2 = u[..., 1] / jnp.maximum(sig[..., 1:2], 1e-20)
    u2 = u2 - jnp.sum(u2 * u1, axis=-1, keepdims=True) * u1
    n2 = jnp.linalg.norm(u2, axis=-1, keepdims=True)
    ok2 = (sig[..., 1] > 1e-3 * s0)[..., None] & (n2 > 1e-6)
    u2 = jnp.where(ok2, u2 / jnp.maximum(n2, 1e-30), _perp(u1))
    u3_direct = u[..., 2] / jnp.maximum(sig[..., 2:3], 1e-20)
    u3_cross = jnp.cross(u1, u2)
    healthy3 = (sig[..., 2] > 1e-3 * s0)[..., None]
    u3 = jnp.where(healthy3, u3_direct, u3_cross)
    u3 = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True),
                          1e-30)
    u = jnp.stack([u1, u2, u3], axis=-1)
    return u, sig, jnp.swapaxes(v, -1, -2)


def inv4x4(m: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 4, 4) — cofactor arithmetic
    only; batched jnp.linalg.inv is scalar-rate on TPU."""

    def det3(r, c):
        r0, r1, r2 = r
        c0, c1, c2 = c
        return (m[..., r0, c0] * (m[..., r1, c1] * m[..., r2, c2]
                                  - m[..., r1, c2] * m[..., r2, c1])
                - m[..., r0, c1] * (m[..., r1, c0] * m[..., r2, c2]
                                    - m[..., r1, c2] * m[..., r2, c0])
                + m[..., r0, c2] * (m[..., r1, c0] * m[..., r2, c1]
                                    - m[..., r1, c1] * m[..., r2, c0]))

    idx = [0, 1, 2, 3]
    cols = []
    for j in range(4):
        col = []
        for i in range(4):
            rows3 = tuple(r for r in idx if r != j)
            cols3 = tuple(c for c in idx if c != i)
            col.append(((-1.0) ** (i + j)) * det3(rows3, cols3))
        cols.append(jnp.stack(col, axis=-1))
    adj = jnp.stack(cols, axis=-1)                          # (..., 4, 4)
    det = sum(m[..., 0, j] * adj[..., j, 0] for j in range(4))
    det = jnp.where(jnp.abs(det) < 1e-30,
                    jnp.where(det < 0, -1e-30, 1e-30), det)
    return adj / det[..., None, None]


def rigid_transform_3d(
    src: jax.Array, dst: jax.Array, weights: jax.Array | None = None,
    with_scale: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Umeyama/Kabsch: weighted least-squares (R, t, s) with dst ≈ s·R·src + t
    (reference rigid.rs; used by ICP fit_transformation, registration/ops.rs:5).

    src, dst: (N, 3); weights: (N,) or None. Returns (R (3,3), t (3,), s ()).
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = jax.lax.dot_general(
        (dc * w[:, None]), sc, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (3, 3)
    u, s, vt = svd3(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0, 1.0], src.dtype).at[2].multiply(d)
    r = (u * diag[None, :]) @ vt
    if with_scale:
        var_s = jnp.sum(w * jnp.sum(sc * sc, axis=1))
        scale = jnp.sum(s * diag) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.asarray(1.0, src.dtype)
    t = mu_d - scale * (r @ mu_s)
    return r, t, scale


def solve_cholesky(a: jax.Array, b: jax.Array) -> jax.Array:
    """SPD solve via Cholesky (the reference's faer path, ba_schur.rs:40)."""
    l = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


def solve_cholesky_damped(a: jax.Array, b: jax.Array, damping) -> jax.Array:
    """LM-style (A + λ·diag(diag(A))) x = b (batched over leading dims)."""
    d = jnp.diagonal(a, axis1=-2, axis2=-1)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    a_damped = a + eye * (damping * jnp.maximum(d, 1e-12))[..., None, :]
    return solve_cholesky(a_damped, b)


def inv3x3(m: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 3, 3).

    Batched `jnp.linalg.inv` lowers to a scalar-rate LU kernel on TPU;
    the adjugate is pure elementwise math and vectorizes over any batch
    (used per-RANSAC-hypothesis — see PERF_NOTES.md)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    det = jnp.where(jnp.abs(det) < 1e-30,
                    jnp.where(det < 0, -1e-30, 1e-30), det)
    adj = jnp.stack([
        co_a, c * h - b * i, b * f - c * e,
        co_b, a * i - c * g, c * d - a * f,
        co_c, b * g - a * h, a * e - b * d,
    ], axis=-1).reshape(m.shape)
    return adj / det[..., None, None]


def hnormalize(x: jax.Array) -> jax.Array:
    """Homogeneous → euclidean: divide by last coordinate."""
    return x[..., :-1] / jnp.where(jnp.abs(x[..., -1:]) < 1e-12, 1e-12, x[..., -1:])


def homogenize(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def transform_points(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (4, 4) (or batched) matrix to (..., 3) points."""
    return jnp.einsum("...ij,...nj->...ni", m[..., :3, :3], pts) + m[..., None, :3, 3]


def solve_quartic(coeffs: jax.Array) -> jax.Array:
    """Closed-form (Ferrari) roots of a₄x⁴+a₃x³+a₂x²+a₁x+a₀.

    coeffs: (..., 5) real, highest degree first. Returns (..., 4)
    complex64 roots. Fully elementwise → batched/vmapped/TPU-safe (no
    companion-matrix eig, which XLA only lowers on CPU).
    """
    c = coeffs.astype(jnp.complex64)
    a4 = jnp.where(jnp.abs(c[..., 0]) < 1e-12, 1e-12, c[..., 0])
    p3 = c[..., 1] / a4
    q2 = c[..., 2] / a4
    r1 = c[..., 3] / a4
    s0 = c[..., 4] / a4

    # depressed quartic y⁴ + αy² + βy + γ, x = y − p3/4
    alpha = q2 - 3.0 * p3 * p3 / 8.0
    beta = r1 - p3 * q2 / 2.0 + p3 ** 3 / 8.0
    gamma = (s0 - 3.0 * p3 ** 4 / 256.0 + p3 * p3 * q2 / 16.0
             - p3 * r1 / 4.0)

    # resolvent cubic z³ + 2αz² + (α²−4γ)z − β² = 0; take one root
    b2 = 2.0 * alpha
    b1 = alpha * alpha - 4.0 * gamma
    b0 = -beta * beta
    pp = b1 - b2 * b2 / 3.0
    qq = 2.0 * b2 ** 3 / 27.0 - b2 * b1 / 3.0 + b0
    disc = (qq / 2.0) ** 2 + (pp / 3.0) ** 3
    sq = jnp.sqrt(disc)
    u3 = -qq / 2.0 + sq
    # principal cube root; avoid 0^(1/3) NaN
    u = jnp.where(jnp.abs(u3) < 1e-30, 0.0, u3 ** (1.0 / 3.0))
    v = jnp.where(jnp.abs(u) < 1e-30, 0.0, -pp / (3.0 * u))
    z = u + v - b2 / 3.0

    # split into two quadratics: y² ∓ y√z + (α+z)/2 ± β/(2√z)
    w = jnp.sqrt(z)
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    t1 = (alpha + z) / 2.0
    t2 = beta / (2.0 * w_safe)

    def quad_roots(b, cc):
        d = jnp.sqrt(b * b - 4.0 * cc)
        return (-b + d) / 2.0, (-b - d) / 2.0

    # (y² + wy + (t1−t2)) (y² − wy + (t1+t2))
    y1, y2 = quad_roots(w, t1 - t2)
    y3, y4 = quad_roots(-w, t1 + t2)
    roots = jnp.stack([y1, y2, y3, y4], axis=-1) - (p3 / 4.0)[..., None]

    # two Newton polish steps recover the precision complex64 loses near
    # resolvent branch cuts (worst fuzz error 0.12 → <1e-3)
    cc = c[..., None, :]
    for _ in range(2):
        x = roots
        p = (((cc[..., 0] * x + cc[..., 1]) * x + cc[..., 2]) * x
             + cc[..., 3]) * x + cc[..., 4]
        dp = ((4.0 * cc[..., 0] * x + 3.0 * cc[..., 1]) * x
              + 2.0 * cc[..., 2]) * x + cc[..., 3]
        dp = jnp.where(jnp.abs(dp) < 1e-12, 1e-12, dp)
        roots = x - p / dp
    return roots


def solve_unrolled(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve a x = b for small static n via unrolled partial-pivot
    Gauss-Jordan, fully vectorized over the batch. a: (..., n, n),
    b: (..., n, k) → (..., n, k).

    Batched `jnp.linalg.solve` lowers to a scalar-rate LU kernel on TPU
    (PERF_NOTES.md small-matrix rule); this is select/elementwise only.
    """
    import numpy as np

    n = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)          # (..., n, n+k)
    rows = np.arange(n)
    for c in range(n):
        col = aug[..., :, c]
        cand = jnp.where(rows >= c, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=-1)
        e_p = (rows == p[..., None]).astype(aug.dtype)
        e_c = jnp.zeros((n,), aug.dtype).at[c].set(1.0)
        row_c = aug[..., c, :]
        row_p = jnp.einsum("...r,...rk->...k", e_p, aug)
        aug = (aug
               - e_c[..., :, None] * (row_c - row_p)[..., None, :]
               - e_p[..., None] * (row_p - row_c)[..., None, :])
        piv = aug[..., c, c]
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv,
                         jnp.where(piv < 0, -1e-30, 1e-30))
        pivot_row = aug[..., c, :] / safe[..., None]
        factor = aug[..., :, c] * (1.0 - e_c)       # eliminate all ≠ c
        aug = aug - factor[..., None] * pivot_row[..., None, :]
        aug = aug - e_c[..., :, None] * (aug[..., c, :]
                                         - pivot_row)[..., None, :]
    return aug[..., :, a.shape[-1]:]


def det_unrolled(a: jax.Array) -> jax.Array:
    """Determinant of small static-n matrices via unrolled partial-pivot
    Gaussian elimination, fully vectorized over the batch: (..., n, n)
    -> (...,).

    Batched ``jnp.linalg.det`` lowers to a scalar-rate LU kernel on TPU
    (measured 20 ms for 8192 10x10s — the 5pt solver's real bottleneck);
    this is select/elementwise only. Sign of the row swaps is tracked so
    the signed determinant is exact.
    """
    import numpy as np

    n = a.shape[-1]
    aug = a
    rows = np.arange(n)
    det = jnp.ones(a.shape[:-2], a.dtype)
    for c in range(n):
        col = aug[..., :, c]
        cand = jnp.where(rows >= c, jnp.abs(col), -1.0)
        p = jnp.argmax(cand, axis=-1)
        det = det * jnp.where(p == c, 1.0, -1.0)
        e_p = (rows == p[..., None]).astype(aug.dtype)
        e_c = jnp.zeros((n,), aug.dtype).at[c].set(1.0)
        row_c = aug[..., c, :]
        row_p = jnp.einsum("...r,...rk->...k", e_p, aug)
        aug = (aug
               - e_c[..., :, None] * (row_c - row_p)[..., None, :]
               - e_p[..., None] * (row_p - row_c)[..., None, :])
        piv = aug[..., c, c]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv,
                         jnp.where(piv < 0, -1e-30, 1e-30))
        factor = aug[..., :, c] / safe[..., None]
        factor = factor * (rows > c).astype(aug.dtype)
        aug = aug - factor[..., None] * aug[..., c, :][..., None, :]
    return det
