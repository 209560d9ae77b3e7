"""Nistér five-point essential-matrix solver — batched TPU formulation.

Capability parity with the reference's essential_5pt.rs (1,454 LoC Nistér
implementation, pose/twoview.rs EssentialNister5ptSolver). The classical
eliminations (Nistér's Gauss-Jordan recipe / Stewénius' Gröbner action
matrix) end in a 10×10 nonsymmetric eigenproblem, which XLA cannot lower
on TPU. This implementation keeps everything batched and TPU-lowerable:

1. nullspace basis of the 5×9 epipolar constraint via eigh (E = xE₁ +
   yE₂ + zE₃ + E₄);
2. the ten cubic constraints' coefficients extracted **numerically** —
   evaluate det(E) and 2EEᵀE − tr(EEᵀ)E at 20 fixed sample points and
   multiply by a precomputed 20×20 inverse monomial Vandermonde (no
   hand-derived symbolic tables to get wrong);
3. hide z: the system becomes C(z)·m(x,y) = 0 with C 10×10, entries
   polynomial in z (the 10 xy-monomials of degree ≤3 are exactly the
   basis) → det C(z) is Nistér's degree-10 polynomial, recovered by
   sampling det at 16 Chebyshev nodes + a fixed least-squares fit;
4. roots by Durand–Kerner iteration in complex64 (fixed 80 steps —
   branch-free, vmappable), real roots kept;
5. per root: m = nullvec(C(z)) via eigh → (x, y) from monomial ratios →
   E candidates, disambiguated on a 6th correspondence (Sampson).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import homogenize

_HI = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------- monomials
# all (i, j, k) with i + j + k <= 3: x^i y^j z^k
_MONOS = [(i, j, k)
          for i in range(4) for j in range(4 - i) for k in range(4 - i - j)]
assert len(_MONOS) == 20
# xy-monomials (i, j), i + j <= 3 — the 10-dim basis m(x, y)
_XY = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0),
       (1, 1), (0, 2), (1, 0), (0, 1), (0, 0)]
_X_IDX = _XY.index((1, 0))
_Y_IDX = _XY.index((0, 1))
_1_IDX = _XY.index((0, 0))

# fixed evaluation points for numeric coefficient extraction (f64 host)
_rng = np.random.default_rng(12345)
_SAMPLES = _rng.uniform(-1.0, 1.0, (20, 3))
_VAND = np.stack([
    [s[0] ** i * s[1] ** j * s[2] ** k for (i, j, k) in _MONOS]
    for s in _SAMPLES
])  # (20 samples, 20 monomials)
_VAND_INV = np.linalg.inv(_VAND)  # f64, cond ~1e3

# z-sampling nodes for det C(z) (degree 10 → 16 Chebyshev nodes) and the
# least-squares coefficient fit matrix (11, 16), precomputed in f64
_ZNODES = np.cos(np.pi * (2 * np.arange(16) + 1) / 32.0) * 2.0  # scaled
_ZVAND = np.stack([_ZNODES ** d for d in range(11)], axis=1)  # (16, 11)
_ZFIT = np.linalg.pinv(_ZVAND)  # (11, 16): coeffs (deg 0..10) from samples

# map 20 (i,j,k) monomials → (xy-basis index, z power)
_M_TO_XY = np.array([_XY.index((i, j)) for (i, j, k) in _MONOS])
_M_TO_ZP = np.array([k for (i, j, k) in _MONOS])


def _constraints(e: jax.Array) -> jax.Array:
    """The 10 Nistér cubic constraints of (..., 3, 3) essential candidates:
    [det(E); vec(2EEᵀE − tr(EEᵀ)E)]."""
    det = jnp.linalg.det(e)
    eet = e @ jnp.swapaxes(e, -1, -2)
    tr = jnp.trace(eet, axis1=-2, axis2=-1)[..., None, None]
    m = 2.0 * (eet @ e) - tr * e
    return jnp.concatenate(
        [det[..., None], m.reshape(m.shape[:-2] + (9,))], axis=-1)


def _nullspace4(x1n: jax.Array, x2n: jax.Array) -> jax.Array:
    """(..., 5, 2) normalized correspondences → (..., 4, 3, 3) basis of
    the epipolar nullspace (smallest eigvecs of QᵀQ)."""
    p1 = homogenize(x1n)
    p2 = homogenize(x2n)
    q = (p2[..., :, None] * p1[..., None, :]).reshape(
        x1n.shape[:-2] + (5, 9))
    # Null-space basis WITHOUT a batched 9×9 eigh (scalar rate on TPU):
    # project a fixed (9, 4) seed through P = I − Qᵀ(QQᵀ)⁻¹Q and
    # Gram-Schmidt — any basis of null(Q) parameterizes Nistér's
    # E = x·E1 + y·E2 + z·E3 + E4 equally well.
    from kornia_tpu.geometry.linalg import solve_unrolled

    qqt = jnp.einsum("...ni,...mi->...nm", q, q, precision=_HI)
    ridge = 1e-8 * jnp.trace(qqt, axis1=-2, axis2=-1)[..., None, None]
    eye5 = np.eye(5, dtype=np.float32)
    x_sol = solve_unrolled(qqt + ridge * eye5, q)       # (..., 5, 9)
    rng_seed = np.random.default_rng(11)
    r_fixed = np.linalg.qr(rng_seed.standard_normal((9, 4)))[0].astype(
        np.float32)
    xr = jnp.einsum("...ni,ij->...nj", x_sol, r_fixed)  # X·R (..., 5, 4)
    # P·R = R − Qᵀ·(X·R)
    pr = r_fixed - jnp.einsum("...ni,...nj->...ij", q, xr)
    cols = []
    for j in range(4):                                  # Gram-Schmidt
        v = pr[..., :, j]
        for u in cols:
            v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
        cols.append(v)
    basis = jnp.stack(cols, axis=-2)                    # (..., 4, 9)
    return basis.reshape(x1n.shape[:-2] + (4, 3, 3))


def _durand_kerner(coeffs: jax.Array, iters: int = 80) -> jax.Array:
    """Roots of (..., 11) real coefficient vectors (degree 0..10 order).

    Returns (..., 10) complex64. Fixed-iteration, fully batched.
    """
    c = coeffs.astype(jnp.complex64)
    lead = c[..., 10]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    cn = c / lead[..., None]

    # initial guesses on a circle (Aberth's standard init)
    angles = 2.0 * jnp.pi * (jnp.arange(10) + 0.5) / 10.0
    w0 = (0.4 + 0.9j) * jnp.exp(1j * angles)
    w = jnp.broadcast_to(w0, coeffs.shape[:-1] + (10,)).astype(jnp.complex64)

    def horner(z):
        acc = jnp.ones_like(z) * cn[..., 10:11]
        for d in range(9, -1, -1):
            acc = acc * z + cn[..., d: d + 1]
        return acc

    def step(w, _):
        p = horner(w)
        diff = w[..., :, None] - w[..., None, :]
        diff = diff + jnp.eye(10, dtype=w.dtype) * 1.0  # kill self-term
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        return w - p / denom, None

    w, _ = jax.lax.scan(step, w, None, length=iters)
    return w


def essential_5pt(
    x1n: jax.Array, x2n: jax.Array, weights=None
) -> jax.Array:
    """Batched 5-point essential solver with 6th-point disambiguation.

    x1n/x2n: (..., S≥6, 2) NORMALIZED image coordinates (K⁻¹ applied).
    The first five rows form the minimal set, rows 5+ vote among the ≤10
    real solutions. Returns (..., 3, 3) essential matrices (‖E‖=1).
    """
    del weights  # minimal solver; LO refits route through the 8-pt path
    basis = _nullspace4(x1n[..., :5, :], x2n[..., :5, :])  # (..., 4, 3, 3)
    e1, e2, e3, e4 = (basis[..., 0, :, :], basis[..., 1, :, :],
                      basis[..., 2, :, :], basis[..., 3, :, :])

    # 10 cubic constraints, coefficients in the 20-monomial basis
    samples = jnp.asarray(_SAMPLES, jnp.float32)  # (20, 3)
    e_at = (samples[:, 0][:, None, None] * e1[..., None, :, :]
            + samples[:, 1][:, None, None] * e2[..., None, :, :]
            + samples[:, 2][:, None, None] * e3[..., None, :, :]
            + e4[..., None, :, :])                # (..., 20, 3, 3)
    cvals = _constraints(e_at)                    # (..., 20 samples, 10)
    vinv = jnp.asarray(_VAND_INV, jnp.float32)
    coef = jnp.einsum("ms,...sr->...rm", vinv, cvals,
                      precision=_HI)              # (..., 10 constr, 20 mono)

    # C(z) at the 16 z-nodes → det → degree-10 coefficient fit
    znodes = jnp.asarray(_ZNODES, jnp.float32)
    zp = znodes[:, None] ** jnp.asarray(_M_TO_ZP, jnp.float32)[None, :]
    # (16 nodes, 20 monomials) z-power values; scatter into xy columns
    sel = jax.nn.one_hot(jnp.asarray(_M_TO_XY), 10, dtype=jnp.float32)
    cz = jnp.einsum("...rm,zm,mx->...zrx", coef, zp, sel,
                    precision=_HI)                # (..., 16, 10, 10)
    from kornia_tpu.geometry.linalg import det_unrolled

    # batched jnp.linalg.det is a scalar-rate LU on TPU (20 ms for the
    # 512x16 10x10 batch — the solver's true bottleneck, PERF_NOTES)
    dets = det_unrolled(cz)                       # (..., 16)
    zfit = jnp.asarray(_ZFIT, jnp.float32)
    poly = jnp.einsum("dz,...z->...d", zfit, dets)  # (..., 11) deg 0..10

    roots = _durand_kerner(poly)                  # (..., 10) complex
    zr = roots.real
    scale = jnp.maximum(jnp.max(jnp.abs(roots.imag), axis=-1,
                                keepdims=True), 1.0)
    is_real = jnp.abs(roots.imag) < 1e-3 * scale

    # per real root: nullvector of C(z) → (x, y) → E candidate
    zpow = zr[..., None] ** jnp.asarray(_M_TO_ZP, jnp.float32)
    c_at = jnp.einsum("...rm,...km,mx->...krx", coef, zpow, sel,
                      precision=_HI)              # (..., 10 roots, 10, 10)
    ctc = jnp.einsum("...rx,...ry->...xy", c_at, c_at, precision=_HI)
    # smallest eigvec of 10×10 CᵀC per root without batched eigh
    # (5120 scalar-rate eighs ≈ 100 ms): C(z) is rank-9 at a true root,
    # so 2 rounds of ridged inverse iteration converge to the null
    # direction (unrolled Gauss-Jordan solve, vector rate)
    from kornia_tpu.geometry.linalg import solve_unrolled

    ridge = (1e-9 * jnp.trace(ctc, axis1=-2, axis2=-1)
             )[..., None, None]
    eye10 = np.eye(10, dtype=np.float32)
    m_r = ctc + ridge * eye10
    v = jnp.broadcast_to(
        np.full((10,), 1.0 / np.sqrt(10.0), np.float32),
        ctc.shape[:-1])
    for _ in range(3):
        v = solve_unrolled(m_r, v[..., None])[..., 0]
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    mvec = v                                      # (..., 10 roots, 10)
    denom = mvec[..., _1_IDX]
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    x = mvec[..., _X_IDX] / denom
    y = mvec[..., _Y_IDX] / denom

    e_cand = (x[..., None, None] * e1[..., None, :, :]
              + y[..., None, None] * e2[..., None, :, :]
              + zr[..., None, None] * e3[..., None, :, :]
              + e4[..., None, :, :])              # (..., 10, 3, 3)
    norm = jnp.linalg.norm(
        e_cand.reshape(e_cand.shape[:-2] + (9,)), axis=-1)
    e_cand = e_cand / jnp.maximum(norm, 1e-12)[..., None, None]

    # disambiguate on the extra correspondences (rows 5+), Sampson error
    from kornia_tpu.geometry.epipolar import sampson_distance

    extra1 = x1n[..., 5:, :]
    extra2 = x2n[..., 5:, :]
    err = sampson_distance(
        e_cand, extra1[..., None, :, :], extra2[..., None, :, :])
    err = jnp.sum(err, axis=-1)                   # (..., 10 roots)
    # degenerate samples (coincident points, diverged DK) yield NaN
    # candidates — demote instead of propagating (RANSAC outvotes them)
    finite = jnp.all(jnp.isfinite(
        e_cand.reshape(e_cand.shape[:-2] + (9,))), axis=-1)
    err = jnp.where(is_real & finite & jnp.isfinite(err), err, jnp.inf)
    best = jnp.argmin(err, axis=-1)
    e_best = jnp.take_along_axis(
        e_cand, best[..., None, None, None], axis=-3)[..., 0, :, :]
    ok = jnp.take_along_axis(finite, best[..., None], axis=-1)[..., 0]
    return jnp.where(ok[..., None, None], e_best, 0.0)
