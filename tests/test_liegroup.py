"""Lie group property tests (reference: kornia-algebra lie tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from kornia_tpu.geometry import liegroup as lg


def rand_w(rng, n=16, scale=2.0):
    # independent stream per call — test results must not depend on the
    # order other tests consume the session rng
    local = np.random.default_rng(42)
    return jnp.asarray(local.normal(0, scale, size=(n, 3)).astype(np.float32))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rand_w(rng, scale=1.0)
        back = lg.so3_log(lg.so3_exp(w))
        np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-5)

    def test_exp_matches_scipy(self, rng):
        w = rand_w(rng, scale=1.5)
        r_ours = np.asarray(lg.so3_exp_matrix(w))
        r_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-5)

    def test_small_angle(self):
        w = jnp.asarray([[1e-10, 0, 0], [0, 0, 0]], jnp.float32)
        q = lg.so3_exp(w)
        assert np.isfinite(np.asarray(q)).all()
        np.testing.assert_allclose(np.asarray(lg.so3_log(q)), np.asarray(w), atol=1e-8)

    def test_rotate_matches_matrix(self, rng):
        w = rand_w(rng)
        v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        q = lg.so3_exp(w)
        out_q = lg.quat_rotate(q, v)
        out_m = jnp.einsum("nij,nj->ni", lg.quat_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_m), atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        w = rand_w(rng)
        q = lg.so3_exp(w)
        q2 = lg.matrix_to_quat(lg.quat_to_matrix(q))
        # same rotation up to sign (canonicalized w>=0)
        qc = np.asarray(jnp.where(q[..., 0:1] < 0, -q, q))
        np.testing.assert_allclose(np.asarray(q2), qc, atol=1e-5)

    def test_jacobian_consistency(self, rng):
        # J_l(w) @ J_l^{-1}(w) == I
        w = rand_w(rng, scale=1.0)
        J = lg.so3_left_jacobian(w)
        Jinv = lg.so3_inverse_left_jacobian(w)
        prod = np.asarray(J @ Jinv)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5)

    def test_grad_through_exp(self):
        f = lambda w: jnp.sum(lg.quat_rotate(lg.so3_exp(w), jnp.ones(3)))
        g = jax.grad(f)(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        local = np.random.default_rng(7)
        xi = local.normal(0, 1.0, size=(16, 6)).astype(np.float32)
        # keep ||omega|| < pi: log is the principal branch
        xi[:, 3:] *= 0.5
        back = lg.se3_log(lg.se3_exp(jnp.asarray(xi)))
        np.testing.assert_allclose(np.asarray(back), xi, atol=1e-4)

    def test_compose_inverse(self, rng):
        local = np.random.default_rng(8)
        xi = jnp.asarray(local.normal(0, 1.0, size=(16, 6)).astype(np.float32))
        p = lg.se3_exp(xi)
        ident = lg.se3_compose(p, lg.se3_inverse(p))
        np.testing.assert_allclose(np.asarray(lg.se3_trans(ident)), 0.0, atol=1e-5)
        np.testing.assert_allclose(abs(np.asarray(lg.se3_quat(ident))[:, 0]), 1.0, atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        local = np.random.default_rng(14)
        xi = jnp.asarray(local.normal(0, 1.0, size=(8, 6)).astype(np.float32))
        p = lg.se3_exp(xi)
        pts = jnp.asarray(local.normal(size=(8, 3)).astype(np.float32))
        out = lg.se3_apply(p, pts)
        m = lg.se3_to_matrix(p)
        hom = jnp.concatenate([pts, jnp.ones((8, 1))], axis=-1)
        out_m = jnp.einsum("nij,nj->ni", m, hom)[:, :3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        local = np.random.default_rng(15)
        xi = jnp.asarray(local.normal(0, 1.0, size=(8, 6)).astype(np.float32))
        p = lg.se3_exp(xi)
        p2 = lg.se3_from_matrix(lg.se3_to_matrix(p))
        np.testing.assert_allclose(np.asarray(lg.se3_apply(p2, jnp.ones((8, 3)))),
                                   np.asarray(lg.se3_apply(p, jnp.ones((8, 3)))), atol=1e-5)

    def test_retract_zero(self, rng):
        local = np.random.default_rng(16)
        xi = jnp.asarray(local.normal(0, 1.0, size=(4, 6)).astype(np.float32))
        p = lg.se3_exp(xi)
        p2 = lg.se3_retract(p, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-6)

    def test_adjoint_identity(self, rng):
        # Adj(T) · ξ == log(T · exp(ξ) · T⁻¹)
        local = np.random.default_rng(9)
        xiT = jnp.asarray(local.normal(0, 0.5, size=(6,)).astype(np.float32))
        xi = jnp.asarray(local.normal(0, 0.1, size=(6,)).astype(np.float32))
        T = lg.se3_exp(xiT)
        lhs = lg.se3_adjoint(T) @ xi
        rhs = lg.se3_log(lg.se3_compose(T, lg.se3_compose(lg.se3_exp(xi), lg.se3_inverse(T))))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


class TestSE2:
    def test_exp_log_roundtrip(self, rng):
        local = np.random.default_rng(10)
        xi = jnp.asarray(local.normal(0, 1.0, size=(16, 3)).astype(np.float32))
        back = lg.se2_log(lg.se2_exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self, rng):
        local = np.random.default_rng(12)
        xi = jnp.asarray(local.normal(0, 1.0, size=(16, 3)).astype(np.float32))
        g = lg.se2_exp(xi)
        ident = lg.se2_compose(g, lg.se2_inverse(g))
        np.testing.assert_allclose(np.asarray(ident[..., 2:]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[..., 0]), 1.0, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        local = np.random.default_rng(11)
        xi = jnp.asarray(local.normal(0, 0.5, size=(16, 7)).astype(np.float32))
        back = lg.sim3_log(lg.sim3_exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-3)

    def test_compose_inverse(self, rng):
        local = np.random.default_rng(13)
        xi = jnp.asarray(local.normal(0, 0.5, size=(8, 7)).astype(np.float32))
        g = lg.sim3_exp(xi)
        ident = lg.sim3_compose(g, lg.sim3_inverse(g))
        np.testing.assert_allclose(np.asarray(ident[..., 4:7]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[..., 7]), 1.0, atol=1e-5)

    def test_apply_scale(self):
        g = lg.sim3_identity().at[7].set(2.0)
        out = lg.sim3_apply(g, jnp.ones(3))
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-6)


class TestRxSO3:
    def test_exp_log_roundtrip(self):
        import numpy as np
        rng = np.random.default_rng(0)
        xi = jnp.asarray(rng.normal(0, 0.5, (10, 4)), jnp.float32)
        g = lg.rxso3_exp(xi)
        back = lg.rxso3_log(g)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   atol=1e-5)

    def test_compose_inverse(self):
        import numpy as np
        rng = np.random.default_rng(1)
        a = lg.rxso3_exp(jnp.asarray(rng.normal(0, 0.4, 4), jnp.float32))
        b = lg.rxso3_exp(jnp.asarray(rng.normal(0, 0.4, 4), jnp.float32))
        ab = lg.rxso3_compose(a, b)
        ident = lg.rxso3_compose(ab, lg.rxso3_inverse(ab))
        np.testing.assert_allclose(
            np.asarray(ident), np.asarray(lg.rxso3_identity()), atol=1e-6)

    def test_apply_matches_matrix(self):
        import numpy as np
        rng = np.random.default_rng(2)
        g = lg.rxso3_exp(jnp.asarray([0.3, -0.2, 0.1, 0.5], jnp.float32))
        pts = jnp.asarray(rng.normal(0, 1, (7, 3)), jnp.float32)
        direct = lg.rxso3_apply(g, pts)
        via_m = pts @ np.asarray(lg.rxso3_matrix(g)).T
        np.testing.assert_allclose(np.asarray(direct), via_m, atol=1e-5)

    def test_sim3_consistency(self):
        """Sim3 with zero translation ≡ RxSO3."""
        import numpy as np
        xi = jnp.asarray([0.1, -0.3, 0.2, 0.4], jnp.float32)
        g = lg.rxso3_exp(xi)
        full = jnp.concatenate([jnp.zeros(3), xi[:3], xi[3:4]])
        s3 = lg.sim3_exp(full)
        pts = jnp.asarray(np.random.default_rng(3).normal(0, 1, (5, 3)),
                          jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lg.rxso3_apply(g, pts)),
            np.asarray(lg.sim3_apply(s3, pts)), atol=1e-5)
