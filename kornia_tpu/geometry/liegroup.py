"""Lie groups SO(2)/SE(2)/SO(3)/SE(3)/Sim(3) as pure, vmappable functions
(reference: kornia-algebra/src/lie/ — so3.rs:67-226, se3.rs:15-213, se2.rs,
sim3.rs, rxso3.rs).

TPU-first design: no group *classes* — a rotation is a (..., 4) quaternion
or (..., 3, 3) matrix, a rigid transform is a (..., 7) [qw qx qy qz tx ty tz]
vector or (..., 4, 4) matrix, and every operation is batch-polymorphic and
differentiable, so the optimizers (optim/lm.py, optim/ba.py) can vmap/grad
through them. All small-angle branches use Taylor series with `jnp.where`
guards (safe under jit and grad).

Conventions (matching the reference):
  * quaternions are wxyz, unit norm, SU(2) double cover;
  * se3 tangent is [ρ; ω] (translation part first) — the reference's
    ba_schur.rs:31-36 convention;
  * ``exp``/``log`` are principal; ``retract(T, δ) = exp(δ) ∘ T``
    (left-multiplicative update, matching variable.rs SE3 ⊕).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ===========================================================================
# quaternion utilities (wxyz)
# ===========================================================================


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,), jnp.float32).at[..., 0].set(1.0)
    return q


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate (..., 3) vectors by (..., 4) quaternions: v' = v + 2w(u×v) + 2u×(u×v)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Shepperd's method, branch-free via jnp.select (works batched)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate solutions
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    # canonical sign (w >= 0)
    return quat_normalize(jnp.where(q[..., 0:1] < 0, -q, q))


# ===========================================================================
# SO(3)
# ===========================================================================


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) → (..., 3, 3) skew (reference so3.rs hat)."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_vee(m: jax.Array) -> jax.Array:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Tangent (..., 3) → quaternion (..., 4) (reference so3.rs:167 exp).

    The sqrt is guarded *before* evaluation (not just selected away with
    ``where``) so the op is NaN-free under ``jax.grad`` at ω = 0.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta2 < _EPS
    safe_theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * safe_theta
    # sin(θ/2)/θ with Taylor guard: 1/2 − θ²/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / safe_theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Quaternion → tangent (reference so3.rs:196 log)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # principal branch
    w = q[..., 0:1]
    v = q[..., 1:4]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, 1e-24))
    small = n2 < _EPS
    angle = 2.0 * jnp.arctan2(n, w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / jnp.where(small, 1.0, n))
    return k * v


def so3_exp_matrix(w: jax.Array) -> jax.Array:
    """Rodrigues (..., 3) → (..., 3, 3)."""
    return quat_to_matrix(so3_exp(w))


def so3_log_matrix(r: jax.Array) -> jax.Array:
    return so3_log(matrix_to_quat(r))


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """J_l(ω) (reference so3.rs left_jacobian)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = so3_hat(w)
    KK = K @ K
    small = theta2 < _EPS
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * KK


def so3_inverse_left_jacobian(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = so3_hat(w)
    KK = K @ K
    small = theta2 < _EPS
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))) / theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term * KK


# ===========================================================================
# SE(3): pose = (..., 7) [qw qx qy qz tx ty tz]; tangent (..., 6) [ρ; ω]
# ===========================================================================


def se3_identity(shape=()) -> jax.Array:
    return jnp.zeros(shape + (7,), jnp.float32).at[..., 0].set(1.0)


def se3_from_qt(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([q, t], axis=-1)


def se3_quat(p: jax.Array) -> jax.Array:
    return p[..., 0:4]


def se3_trans(p: jax.Array) -> jax.Array:
    return p[..., 4:7]


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b (apply b first, then a)."""
    q = quat_mul(se3_quat(a), se3_quat(b))
    t = quat_rotate(se3_quat(a), se3_trans(b)) + se3_trans(a)
    return se3_from_qt(quat_normalize(q), t)


def se3_inverse(p: jax.Array) -> jax.Array:
    qi = quat_conj(se3_quat(p))
    return se3_from_qt(qi, -quat_rotate(qi, se3_trans(p)))


def se3_apply(p: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform (..., 3) points."""
    return quat_rotate(se3_quat(p), pts) + se3_trans(p)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Tangent [ρ; ω] → pose (reference se3.rs:92 exp)."""
    rho = xi[..., 0:3]
    w = xi[..., 3:6]
    q = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return se3_from_qt(q, t)


def se3_log(p: jax.Array) -> jax.Array:
    """Pose → tangent [ρ; ω] (reference se3.rs:143 log)."""
    w = so3_log(se3_quat(p))
    Vinv = so3_inverse_left_jacobian(w)
    rho = jnp.einsum("...ij,...j->...i", Vinv, se3_trans(p))
    return jnp.concatenate([rho, w], axis=-1)


def se3_retract(p: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-multiplicative ⊕: exp(δ) ∘ p (reference variable.rs SE3 update)."""
    return se3_compose(se3_exp(delta), p)


def se3_to_matrix(p: jax.Array) -> jax.Array:
    r = quat_to_matrix(se3_quat(p))
    t = se3_trans(p)[..., :, None]
    top = jnp.concatenate([r, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(m: jax.Array) -> jax.Array:
    return se3_from_qt(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])


def se3_adjoint(p: jax.Array) -> jax.Array:
    """6×6 adjoint with [ρ; ω] ordering (reference se3.rs adjoint)."""
    r = quat_to_matrix(se3_quat(p))
    t = se3_trans(p)
    tr = so3_hat(t) @ r
    z = jnp.zeros_like(r)
    top = jnp.concatenate([r, tr], axis=-1)
    bot = jnp.concatenate([z, r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ===========================================================================
# SO(2) / SE(2)  (reference so2.rs / se2.rs)
# ===========================================================================


def so2_exp(theta: jax.Array) -> jax.Array:
    """Angle → unit complex (..., 2) [cos, sin]."""
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def so2_log(z: jax.Array) -> jax.Array:
    return jnp.arctan2(z[..., 1], z[..., 0])


def se2_exp(xi: jax.Array) -> jax.Array:
    """(..., 3) [ρx ρy θ] → (..., 4) [cos sin tx ty]."""
    rho = xi[..., 0:2]
    theta = xi[..., 2]
    t2 = theta * theta
    small = t2 < _EPS
    s = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    c = jnp.where(small, theta / 2.0 - t2 * theta / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta))
    tx = s * rho[..., 0] - c * rho[..., 1]
    ty = c * rho[..., 0] + s * rho[..., 1]
    return jnp.concatenate([so2_exp(theta), jnp.stack([tx, ty], -1)], axis=-1)


def se2_log(g: jax.Array) -> jax.Array:
    theta = so2_log(g[..., 0:2])
    t2 = theta * theta
    small = t2 < _EPS
    # V^{-1} entries
    half = 0.5 * theta
    a = jnp.where(
        small, 1.0 - t2 / 12.0, half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-12) * jnp.where(small, 1.0, 1.0)
    )
    a = jnp.where(small, 1.0 - t2 / 12.0, half / jnp.tan(half))
    tx, ty = g[..., 2], g[..., 3]
    rx = a * tx + half * ty
    ry = -half * tx + a * ty
    return jnp.stack([rx, ry, theta], axis=-1)


def se2_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    ca, sa = a[..., 0], a[..., 1]
    cb, sb = b[..., 0], b[..., 1]
    c = ca * cb - sa * sb
    s = sa * cb + ca * sb
    tx = ca * b[..., 2] - sa * b[..., 3] + a[..., 2]
    ty = sa * b[..., 2] + ca * b[..., 3] + a[..., 3]
    return jnp.stack([c, s, tx, ty], axis=-1)


def se2_inverse(g: jax.Array) -> jax.Array:
    c, s = g[..., 0], g[..., 1]
    tx, ty = g[..., 2], g[..., 3]
    return jnp.stack([c, -s, -(c * tx + s * ty), -(-s * tx + c * ty)], axis=-1)


def se2_apply(g: jax.Array, pts: jax.Array) -> jax.Array:
    c, s = g[..., 0:1], g[..., 1:2]
    x, y = pts[..., 0:1], pts[..., 1:2]
    return jnp.concatenate([c * x - s * y + g[..., 2:3], s * x + c * y + g[..., 3:4]], axis=-1)


# ===========================================================================
# Sim(3): (..., 8) [qw qx qy qz tx ty tz s]  (reference sim3.rs / rxso3.rs)
# ===========================================================================


def sim3_identity(shape=()) -> jax.Array:
    g = jnp.zeros(shape + (8,), jnp.float32)
    return g.at[..., 0].set(1.0).at[..., 7].set(1.0)


def sim3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    q = quat_normalize(quat_mul(a[..., 0:4], b[..., 0:4]))
    t = a[..., 7:8] * quat_rotate(a[..., 0:4], b[..., 4:7]) + a[..., 4:7]
    s = a[..., 7:8] * b[..., 7:8]
    return jnp.concatenate([q, t, s], axis=-1)


def sim3_inverse(g: jax.Array) -> jax.Array:
    qi = quat_conj(g[..., 0:4])
    si = 1.0 / g[..., 7:8]
    ti = -si * quat_rotate(qi, g[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


def sim3_apply(g: jax.Array, pts: jax.Array) -> jax.Array:
    return g[..., 7:8] * quat_rotate(g[..., 0:4], pts) + g[..., 4:7]


def sim3_exp(xi: jax.Array) -> jax.Array:
    """(..., 7) [ρ; ω; σ] → Sim(3). W-matrix via closed form (sim3.rs exp)."""
    rho, w, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(w)
    s = jnp.exp(sigma)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    K = so3_hat(w)
    KK = K @ K
    sg = sigma
    es = s
    small_s = jnp.abs(sg) < 1e-5
    small_t = theta2 < _EPS
    # coefficients of W = A·I + B·K + C·KK  (Sophus closed form)
    A = jnp.where(small_s, 1.0 + sg / 2.0, (es - 1.0) / jnp.where(small_s, 1.0, sg))
    sig2t2 = sg * sg + theta2
    B_gen = (
        (es * jnp.sin(theta) * sg + (1.0 - es * jnp.cos(theta)) * theta)
        / jnp.where(small_t, 1.0, theta * sig2t2)
    )
    B_small_t = jnp.where(small_s, 0.5, ((sg - 1.0) * es + 1.0) / jnp.where(small_s, 1.0, sg * sg))
    B = jnp.where(small_t, B_small_t, B_gen)
    C_gen = (
        (A - ((es * jnp.cos(theta) - 1.0) * sg + es * jnp.sin(theta) * theta) / jnp.where(small_t, 1.0, sig2t2))
        / jnp.where(small_t, 1.0, theta2)
    )
    C_small = jnp.where(small_s, 1.0 / 6.0, (es * 0.5 * sg * sg - es * sg + es - 1.0) / jnp.where(small_s, 1.0, sg * sg * sg))
    C = jnp.where(small_t, C_small, C_gen)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * KK
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_log(g: jax.Array) -> jax.Array:
    w = so3_log(g[..., 0:4])
    sigma = jnp.log(g[..., 7])
    # invert W numerically-stable via solve (3×3)
    xi_rot = jnp.concatenate([jnp.zeros_like(w), w, sigma[..., None]], axis=-1)
    W = _sim3_W(w, sigma)
    from kornia_tpu.geometry.linalg import inv3x3

    rho = jnp.einsum("...ij,...j->...i", inv3x3(W), g[..., 4:7])
    return jnp.concatenate([rho, w, sigma[..., None]], axis=-1)


def _sim3_W(w, sigma):
    xi = jnp.concatenate([jnp.zeros(w.shape[:-1] + (3,), w.dtype), w, sigma[..., None]], axis=-1)
    # reuse exp coefficients by calling sim3_exp on [e_i; w; σ] columns
    cols = []
    for i in range(3):
        rho = jnp.zeros(w.shape[:-1] + (3,), w.dtype).at[..., i].set(1.0)
        full = jnp.concatenate([rho, w, sigma[..., None]], axis=-1)
        cols.append(sim3_exp(full)[..., 4:7])
    return jnp.stack(cols, axis=-1)


# ===========================================================================
# RxSO(3): (..., 5) [qw qx qy qz s]  — rotation × positive scale
# (reference rxso3.rs; the rotation-scale factor of Sim(3))
# ===========================================================================


def rxso3_identity(shape=()) -> jax.Array:
    g = jnp.zeros(shape + (5,), jnp.float32)
    return g.at[..., 0].set(1.0).at[..., 4].set(1.0)


def rxso3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    q = quat_mul(a[..., :4], b[..., :4])
    s = a[..., 4] * b[..., 4]
    return jnp.concatenate([q, s[..., None]], axis=-1)


def rxso3_inverse(g: jax.Array) -> jax.Array:
    q = quat_conj(g[..., :4])
    s = 1.0 / g[..., 4]
    return jnp.concatenate([q, s[..., None]], axis=-1)


def rxso3_apply(g: jax.Array, pts: jax.Array) -> jax.Array:
    return g[..., None, 4:5] * quat_rotate(g[..., None, :4], pts)


def rxso3_exp(xi: jax.Array) -> jax.Array:
    """xi = [omega(3), sigma]: exp(omega) rotation × e^sigma scale."""
    q = so3_exp(xi[..., :3])
    s = jnp.exp(xi[..., 3])
    return jnp.concatenate([q, s[..., None]], axis=-1)


def rxso3_log(g: jax.Array) -> jax.Array:
    w = so3_log(g[..., :4])
    sigma = jnp.log(g[..., 4])
    return jnp.concatenate([w, sigma[..., None]], axis=-1)


def rxso3_matrix(g: jax.Array) -> jax.Array:
    """(..., 3, 3) = s · R."""
    return g[..., 4, None, None] * quat_to_matrix(g[..., :4])
