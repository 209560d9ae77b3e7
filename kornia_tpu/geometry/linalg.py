"""Small linear-algebra utilities for geometric vision
(reference: kornia-algebra/src/linalg/ — svd.rs svd3, rigid.rs Umeyama).

Batched and jittable; f32 with conditioning via normalization (SURVEY.md §7
"f64 → f32 + compensated where needed").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def svd3(m: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched 3×3 SVD. The reference ships an analytic SVD3 (svd.rs:457)
    for scalar speed; XLA's QR-iteration SVD is fine on TPU and batched."""
    return jnp.linalg.svd(m, full_matrices=True)


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
    u, s, vt = jnp.linalg.svd(cov)
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
