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


def hnormalize(x: jax.Array) -> jax.Array:
    """Homogeneous → euclidean: divide by last coordinate."""
    return x[..., :-1] / jnp.where(jnp.abs(x[..., -1:]) < 1e-12, 1e-12, x[..., -1:])


def homogenize(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def transform_points(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (4, 4) (or batched) matrix to (..., 3) points."""
    return jnp.einsum("...ij,...nj->...ni", m[..., :3, :3], pts) + m[..., None, :3, 3]
