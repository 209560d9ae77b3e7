"""Triangulation (reference: kornia-3d/src/pose/triangulation.rs:420).

Batched DLT (SVD of the 4×4 design matrix) and the closed-form midpoint
method the reference uses for fast cheirality voting (twoview.rs
count_cheirality_fast).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def projection_matrix(r: jax.Array, t: jax.Array, k: jax.Array) -> jax.Array:
    """P = K [R | t], (..., 3, 4)."""
    rt = jnp.concatenate([r, t[..., :, None]], axis=-1)
    return k @ rt


def triangulate_dlt(
    p1: jax.Array, p2: jax.Array, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """DLT triangulation. p1/p2: (..., 3, 4); x1/x2: (..., N, 2) pixels.
    Returns (..., N, 3) world points."""
    rows = []
    for p, x in ((p1, x1), (p2, x2)):
        u = x[..., 0:1]
        v = x[..., 1:2]
        p0 = p[..., None, 0, :]  # (..., 1, 4)
        p1r = p[..., None, 1, :]
        p2r = p[..., None, 2, :]
        rows.append(u * p2r - p0)
        rows.append(v * p2r - p1r)
    a = jnp.stack(rows, axis=-2)  # (..., N, 4, 4)
    # Null vector without N batched 4×4 SVDs (scalar rate on TPU, ~10 ms
    # for 2000 points): for M = AᵀA with λ_min ≪ λ₂ (the triangulation
    # regime), adj(M) = det(M)·M⁻¹ ≈ (λ₁λ₂λ₃)·vvᵀ is rank-1 along the
    # null direction, and adj(M)·M = det(M)·I → its columns ARE the null
    # space when M is exactly rank-3. Pure cofactor arithmetic, fully
    # vectorized.
    m = jnp.einsum("...ki,...kj->...ij", a, a)

    def det3(r0, r1, r2, cols):
        c0, c1, c2 = cols
        return (m[..., r0, c0] * (m[..., r1, c1] * m[..., r2, c2]
                                  - m[..., r1, c2] * m[..., r2, c1])
                - m[..., r0, c1] * (m[..., r1, c0] * m[..., r2, c2]
                                    - m[..., r1, c2] * m[..., r2, c0])
                + m[..., r0, c2] * (m[..., r1, c0] * m[..., r2, c1]
                                    - m[..., r1, c1] * m[..., r2, c0]))

    idx = [0, 1, 2, 3]
    adj_cols = []
    for j in range(4):          # adj[i, j] = (−1)^{i+j} minor(j, i)
        col = []
        for i in range(4):
            rows3 = [r for r in idx if r != j]
            cols3 = [c for c in idx if c != i]
            col.append(((-1.0) ** (i + j)) * det3(*rows3, cols3))
        adj_cols.append(jnp.stack(col, axis=-1))    # (..., 4) = adj[:, j]
    adj = jnp.stack(adj_cols, axis=-1)              # (..., 4, 4)
    nrm2 = jnp.sum(adj * adj, axis=-2)              # (..., 4) col norms
    j = jnp.argmax(nrm2, axis=-1)
    xh = jnp.take_along_axis(
        adj, j[..., None, None].repeat(4, axis=-2), axis=-1)[..., 0]
    w = xh[..., 3:4]
    return xh[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)


def triangulate_midpoint_depths(
    r: jax.Array, t: jax.Array, xn1: jax.Array, xn2: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form two-ray depths for cheirality voting (reference
    twoview.rs:1505 count_cheirality_fast): rays b1 = [x1; 1] in cam1,
    b2 = Rᵀ[x2; 1] rotated into cam1, camera-2 center c = −Rᵀt.

    xn1/xn2: (..., N, 2) *normalized* coords. Returns (z1, z2, cos_parallax).
    """
    b1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
    b2_cam2 = jnp.concatenate([xn2, jnp.ones_like(xn2[..., :1])], axis=-1)
    b2 = jnp.einsum("...ji,...nj->...ni", r, b2_cam2)  # Rᵀ b2
    c2 = -jnp.einsum("...ji,...j->...i", r, t)  # cam2 center in cam1 frame

    # solve [b1, -b2] [z1; z2] = c2 in least squares (2×2 normal equations)
    a11 = jnp.sum(b1 * b1, axis=-1)
    a12 = -jnp.sum(b1 * b2, axis=-1)
    a22 = jnp.sum(b2 * b2, axis=-1)
    rhs1 = jnp.sum(b1 * c2[..., None, :], axis=-1)
    rhs2 = -jnp.sum(b2 * c2[..., None, :], axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (a22 * rhs1 - a12 * rhs2) / det
    z2 = (a11 * rhs2 - a12 * rhs1) / det
    cosp = jnp.sum(b1 * b2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(b1, axis=-1) * jnp.linalg.norm(b2, axis=-1), 1e-12
    )
    return z1, z2, cosp


def count_cheirality(
    r: jax.Array, t: jax.Array, xn1: jax.Array, xn2: jax.Array,
    mask: jax.Array | None = None, min_parallax_cos: float = 0.99998,
) -> jax.Array:
    """Number of points in front of both cameras with sufficient parallax
    (the reference's pose-disambiguation vote)."""
    z1, z2, cosp = triangulate_midpoint_depths(r, t, xn1, xn2)
    good = (z1 > 0) & (z2 > 0) & (cosp < min_parallax_cos)
    if mask is not None:
        good = good & mask
    return jnp.sum(good, axis=-1)
