"""Optimization layer tests: LM on analytic problems, BA and PGO on
synthetic scenes with known ground truth (reference: kornia-algebra
tests_l2_baseline.rs, kornia-3d ba/pgo unit tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim import ba as ba_mod
from kornia_tpu.optim import lm as lm_mod
from kornia_tpu.optim import pgo as pgo_mod


class TestLM:
    def test_rosenbrock_style(self):
        # residuals of the classic curve fit y = exp(a x + b)
        rng = np.random.default_rng(0)
        xs = np.linspace(0, 1, 30).astype(np.float32)
        ys = np.exp(0.8 * xs + 0.2).astype(np.float32)

        def res(p):
            return jnp.exp(p[0] * xs + p[1]) - ys

        out = lm_mod.lm_optimize(res, jnp.asarray([0.0, 0.0]), max_iterations=30)
        np.testing.assert_allclose(np.asarray(out.params), [0.8, 0.2], atol=1e-4)
        assert float(out.cost) < 1e-8

    def test_manifold_so3(self):
        # rotate vectors: find R aligning src→dst, parameterized on SO(3)
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        w_gt = jnp.asarray([0.3, -0.2, 0.5], jnp.float32)
        dst = lg.quat_rotate(lg.so3_exp(w_gt)[None], src)

        def residual(q):
            return (lg.quat_rotate(q[None], src) - dst).reshape(-1)

        def retract(q, d):
            return lg.quat_normalize(lg.quat_mul(lg.so3_exp(d), q))

        out = lm_mod.lm_manifold(residual, retract, lg.quat_identity(), 3, max_iterations=20)
        assert float(out.cost) < 1e-8


def make_ba_scene(seed=0, n_poses=6, n_points=120, noise_px=1.0, pose_noise=0.05):
    rng = np.random.default_rng(seed)
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    pts = rng.uniform([-3, -2, 6], [3, 2, 12], size=(n_points, 3)).astype(np.float32)
    poses_gt = []
    for i in range(n_poses):
        w = rng.normal(0, 0.03, 3).astype(np.float32)
        t = np.array([0.4 * i, 0.02 * i, 0.0], np.float32) + rng.normal(0, 0.01, 3).astype(np.float32)
        q = np.asarray(lg.so3_exp(jnp.asarray(w)))
        poses_gt.append(np.concatenate([q, -Rotation.from_quat(np.roll(q, -1)).as_matrix() @ t]))
    poses_gt = np.stack(poses_gt).astype(np.float32)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_poses):
        pc = np.asarray(lg.se3_apply(jnp.asarray(poses_gt[c])[None], jnp.asarray(pts)))
        uv = pc[:, :2] / pc[:, 2:] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
        vis = (pc[:, 2] > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.nonzero(vis)[0]
        obs_cam += [c] * len(idx)
        obs_pt += list(idx)
        obs_uv += list(uv[idx] + rng.normal(0, noise_px, (len(idx), 2)))
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.array(obs_uv, np.float32)

    # perturb initial estimates
    poses_init = poses_gt.copy()
    for c in range(1, n_poses):
        d = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses_init[c] = np.asarray(lg.se3_retract(jnp.asarray(poses_gt[c]), jnp.asarray(d)))
    pts_init = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    fixed = np.zeros(n_poses, bool)
    fixed[0] = True
    return poses_gt, poses_init, pts, pts_init, k, obs_cam, obs_pt, obs_uv, fixed


class TestBA:
    def test_schur_reduces_cost_and_recovers_geometry(self):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(noise_px=0.5)
        problem = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
        )
        params = ba_mod.BAParams(max_iterations=15, loss="identity")
        res = jax.jit(lambda pr: ba_mod.bundle_adjust_schur(pr, params))(problem)
        assert float(res.final_cost) < 0.1 * float(res.initial_cost)
        # pose error vs gt (rotation)
        for c in range(len(poses_gt)):
            q_est = np.asarray(res.poses[c, :4])
            q_gt = poses_gt[c, :4]
            dot = abs(np.dot(q_est, q_gt))
            ang = 2 * np.degrees(np.arccos(np.clip(dot, -1, 1)))
            assert ang < 0.5, f"pose {c}: {ang} deg"

    def test_noiseless_exact(self):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(noise_px=0.0, pose_noise=0.03)
        problem = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
        )
        params = ba_mod.BAParams(max_iterations=20, loss="identity", lambda_init=1e-6)
        res = ba_mod.bundle_adjust_schur(problem, params)
        # with zero observation noise the cost must go to ~0
        assert float(res.final_cost) < 1e-2

    def test_huber_with_outliers(self):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(noise_px=0.3)
        rng = np.random.default_rng(5)
        out = rng.choice(len(obs_uv), len(obs_uv) // 10, replace=False)
        obs_uv[out] += rng.uniform(30, 80, (len(out), 2)).astype(np.float32)
        problem = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
        )
        params = ba_mod.BAParams(max_iterations=15, loss="huber", loss_scale=2.0)
        res = ba_mod.bundle_adjust_schur(problem, params)
        for c in range(len(poses_gt)):
            dot = abs(np.dot(np.asarray(res.poses[c, :4]), poses_gt[c, :4]))
            ang = 2 * np.degrees(np.arccos(np.clip(dot, -1, 1)))
            assert ang < 1.0, f"pose {c}: {ang} deg"


class TestPGO:
    def make_loop(self, n=12, drift=0.02, seed=0):
        """Circular trajectory with odometry drift + one loop closure."""
        rng = np.random.default_rng(seed)
        poses_gt = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            w = np.array([0, 0, ang], np.float32)
            t = np.array([np.cos(ang), np.sin(ang), 0], np.float32)
            q = np.asarray(lg.so3_exp(jnp.asarray(w)))
            poses_gt.append(np.concatenate([q, t]).astype(np.float32))
        poses_gt = np.stack(poses_gt)

        edges_i, edges_j, meas = [], [], []
        for i in range(n - 1):
            rel = lg.se3_compose(jnp.asarray(poses_gt[i + 1]), lg.se3_inverse(jnp.asarray(poses_gt[i])))
            noise = jnp.asarray(rng.normal(0, drift, 6).astype(np.float32))
            meas.append(np.asarray(lg.se3_compose(lg.se3_exp(noise), rel)))
            edges_i.append(i)
            edges_j.append(i + 1)
        # loop closure (exact)
        rel = lg.se3_compose(jnp.asarray(poses_gt[0]), lg.se3_inverse(jnp.asarray(poses_gt[n - 1])))
        meas.append(np.asarray(rel))
        edges_i.append(n - 1)
        edges_j.append(0)

        # integrate noisy odometry as init
        init = [poses_gt[0]]
        for i in range(n - 1):
            init.append(np.asarray(lg.se3_compose(jnp.asarray(meas[i]), jnp.asarray(init[i]))))
        return poses_gt, np.stack(init).astype(np.float32), np.array(edges_i), np.array(edges_j), np.stack(meas)

    def test_loop_closure_reduces_error(self):
        poses_gt, init, ei, ej, meas = self.make_loop()
        # the loop-closure edge is exact → give it the tight-information
        # weight a real front-end would
        w = np.ones(len(ei), np.float32)
        w[-1] = 100.0
        res = jax.jit(
            lambda p: pgo_mod.pose_graph_optimize(p, ei, ej, jnp.asarray(meas), jnp.asarray(w))
        )(jnp.asarray(init))
        assert float(res.final_cost) < 0.5 * float(res.initial_cost)

        def ate(ps):
            return np.sqrt(np.mean(np.sum((np.asarray(ps)[:, 4:] - poses_gt[:, 4:]) ** 2, axis=1)))

        assert ate(res.poses) < 0.75 * ate(init)

    def test_residual_zero_at_gt(self):
        poses_gt, init, ei, ej, meas = self.make_loop(drift=0.0)
        r = jax.vmap(pgo_mod.edge_residual)(
            jnp.asarray(poses_gt)[ei], jnp.asarray(poses_gt)[ej], jnp.asarray(meas)
        )
        assert float(jnp.abs(r).max()) < 1e-5


def test_schur_pcg_matches_dense_and_scales():
    """PCG reduced-system solver (BAParams.solver='pcg') must converge to
    the same solution as the dense Cholesky path, and run at >=100 poses
    (the regime where the dense (N, P) coupling tensor stops scaling —
    VERDICT.md weak #7; reference design point ba_schur.rs:1-40)."""
    import numpy as np
    import jax.numpy as jnp
    from kornia_tpu.optim import ba as ba_mod
    from kornia_tpu.geometry import liegroup as lg

    rng = np.random.default_rng(3)
    P, N = 120, 600
    k = np.asarray([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
    # cameras on a line looking at a point cloud
    pts = rng.uniform([-5, -5, 8], [5, 5, 16], (N, 3)).astype(np.float32)
    poses = []
    for i in range(P):
        t = np.array([0.05 * i, 0.0, 0.0], np.float32)
        poses.append(np.concatenate([[1, 0, 0, 0], -t]))
    poses = np.asarray(poses, np.float32)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(P):
        cam = pts + poses[c, 4:7]
        uv = cam[:, :2] / cam[:, 2:] * [400, 400] + [320, 240]
        vis = ((uv[:, 0] > 0) & (uv[:, 0] < 640)
               & (uv[:, 1] > 0) & (uv[:, 1] < 480))
        ids = np.nonzero(vis)[0][:80]
        obs_cam += [c] * len(ids)
        obs_pt += list(ids)
        obs_uv += list(uv[ids] + rng.normal(0, 0.5, (len(ids), 2)))
    obs_uv = np.asarray(obs_uv, np.float32)

    # perturb initial geometry
    poses_noisy = poses.copy()
    poses_noisy[1:, 4:7] += rng.normal(0, 0.05, (P - 1, 3))
    pts_noisy = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
    fixed = np.zeros(P, bool)
    fixed[0] = True

    problem = ba_mod.build_problem(
        poses_noisy, pts_noisy, k, obs_cam, obs_pt, obs_uv,
        fixed_poses=fixed)

    res_pcg = ba_mod.bundle_adjust_schur(
        problem, ba_mod.BAParams(max_iterations=8, solver="pcg",
                                 cg_iters=80))
    res_dense = ba_mod.bundle_adjust_schur(
        problem, ba_mod.BAParams(max_iterations=8, solver="dense"))

    c0 = float(res_pcg.initial_cost)
    assert float(res_pcg.final_cost) < 0.1 * c0
    # both solvers reach the same basin
    assert float(res_pcg.final_cost) <= 1.2 * float(res_dense.final_cost)


class TestRgbdBA:
    """RGB-D depth channel (reference BaObservation depth, ba.rs:41,83)."""

    def _scene_with_depth(self, noise_px=1.0, depth_noise=0.005):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(
            seed=4, noise_px=noise_px)
        depths = []
        for c, j in zip(obs_cam, obs_pt):
            pc = np.asarray(lg.se3_apply(
                jnp.asarray(poses_gt[c])[None],
                jnp.asarray(pts_gt[j])[None]))[0]
            depths.append(pc[2])
        rng = np.random.default_rng(9)
        depths = (np.asarray(depths, np.float32)
                  + rng.normal(0, depth_noise, len(depths))
                  .astype(np.float32))
        return (poses_gt, poses_init, pts_gt, pts_init, k,
                obs_cam, obs_pt, obs_uv, fixed, depths)

    def test_depth_residual_zero_at_gt(self):
        (poses_gt, _, pts_gt, _, k, obs_cam, obs_pt, obs_uv, _,
         depths) = self._scene_with_depth(noise_px=0.0, depth_noise=0.0)
        problem = ba_mod.build_problem(
            poses_gt, pts_gt, k, obs_cam, obs_pt, obs_uv,
            obs_depth=depths)
        cost = float(ba_mod.ba_cost(
            problem, params=ba_mod.BAParams(loss="identity")))
        assert cost < 1e-4, cost

    def test_depth_improves_structure(self):
        """With noisy pixels, metric depth measurements must tighten
        the recovered structure vs monocular-only BA."""
        (poses_gt, poses_init, pts_gt, pts_init, k, obs_cam, obs_pt,
         obs_uv, fixed, depths) = self._scene_with_depth(
            noise_px=1.5, depth_noise=0.002)
        params = ba_mod.BAParams(max_iterations=15, loss="identity",
                                 solver="dense")

        def run(depth):
            problem = ba_mod.build_problem(
                poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
                fixed_poses=fixed, obs_depth=depth,
                obs_depth_w=None if depth is None
                else np.full(len(obs_cam), 200.0, np.float32))
            res = jax.jit(lambda pr: ba_mod.bundle_adjust_schur(
                pr, params))(problem)
            assert float(res.final_cost) < float(res.initial_cost)
            return np.linalg.norm(
                np.asarray(res.points) - pts_gt, axis=1).mean()

        err_mono = run(None)
        err_rgbd = run(depths)
        assert err_rgbd < err_mono * 0.8, (err_rgbd, err_mono)

    def test_depth_jacobian_matches_numeric(self):
        """Analytic depth-row Jacobians vs central differences."""
        (poses_gt, poses_init, pts_gt, pts_init, k, obs_cam, obs_pt,
         obs_uv, fixed, depths) = self._scene_with_depth()
        dw = np.full(len(obs_cam), 3.0, np.float32)
        poses = jnp.asarray(poses_init)
        pts = jnp.asarray(pts_init)

        def res_flat(dp, dx):
            ps = lg.se3_retract(poses, dp)
            r, _, _ = ba_mod._project_with_jacobians(
                ps, pts + dx, jnp.asarray(k), jnp.asarray(obs_cam),
                jnp.asarray(obs_pt), jnp.asarray(obs_uv),
                jnp.asarray(depths), jnp.asarray(dw))
            return r

        r0, j_pose, j_pt = ba_mod._project_with_jacobians(
            poses, pts, jnp.asarray(k), jnp.asarray(obs_cam),
            jnp.asarray(obs_pt), jnp.asarray(obs_uv),
            jnp.asarray(depths), jnp.asarray(dw))
        assert r0.shape[1] == 3 and j_pose.shape[1:] == (3, 6)

        eps = 1e-3
        rng = np.random.default_rng(1)
        dp_dir = rng.normal(0, 1, (len(poses_init), 6)).astype(np.float32)
        dx_dir = rng.normal(0, 1, pts_init.shape).astype(np.float32)
        zero_p = jnp.zeros((len(poses_init), 6), jnp.float32)
        zero_x = jnp.zeros(pts_init.shape, jnp.float32)
        num_p = (np.asarray(res_flat(eps * dp_dir, zero_x))
                 - np.asarray(res_flat(-eps * dp_dir, zero_x))) / (2 * eps)
        num_x = (np.asarray(res_flat(zero_p, eps * dx_dir))
                 - np.asarray(res_flat(zero_p, -eps * dx_dir))) / (2 * eps)
        ana_p = np.einsum("mri,mi->mr", np.asarray(j_pose),
                          dp_dir[np.asarray(obs_cam)])
        ana_x = np.einsum("mri,mi->mr", np.asarray(j_pt),
                          dx_dir[np.asarray(obs_pt)])
        np.testing.assert_allclose(ana_p, num_p, atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(ana_x, num_x, atol=5e-2, rtol=5e-2)


class TestSegmentEngine:
    """The tiled one-hot segment engine (KORNIA_TPU_BA_ENGINE) must be
    numerically interchangeable with the segment_sum fallback: same
    problems, same convergence, costs equal to summation-order noise."""

    def test_engine_matches_fallback(self, monkeypatch):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(noise_px=0.5)
        params = ba_mod.BAParams(max_iterations=10, loss="identity")

        monkeypatch.setenv("KORNIA_TPU_BA_ENGINE", "off")
        prob_off = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
            fixed_poses=fixed)
        assert prob_off.seg_oh is None and prob_off.cam_oh is None
        res_off = ba_mod.bundle_adjust_schur(prob_off, params)

        monkeypatch.setenv("KORNIA_TPU_BA_ENGINE", "on")
        prob_on = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
            fixed_poses=fixed)
        assert prob_on.seg_oh is not None and prob_on.cam_oh is not None
        res_on = ba_mod.bundle_adjust_schur(prob_on, params)

        np.testing.assert_allclose(
            float(res_on.initial_cost), float(res_off.initial_cost),
            rtol=1e-4)
        np.testing.assert_allclose(
            float(res_on.final_cost), float(res_off.final_cost),
            rtol=0.05)
        np.testing.assert_allclose(
            np.asarray(res_on.poses), np.asarray(res_off.poses),
            atol=1e-3)

    def test_engine_pcg(self, monkeypatch):
        (poses_gt, poses_init, pts_gt, pts_init, k,
         obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(noise_px=0.3)
        monkeypatch.setenv("KORNIA_TPU_BA_ENGINE", "on")
        problem = ba_mod.build_problem(
            poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
            fixed_poses=fixed)
        params = ba_mod.BAParams(max_iterations=12, loss="identity",
                                 solver="pcg", cg_iters=40)
        res = ba_mod.bundle_adjust_schur(problem, params)
        assert float(res.final_cost) < 0.1 * float(res.initial_cost)


class TestPosePriors:
    """BaPosePrior parity (reference ba.rs:90-114, ba_schur.rs:666-770),
    re-derived for the left-perturbation convention."""

    def _pose(self, rng):
        w = rng.normal(0, 0.4, 3).astype(np.float32)
        q = np.asarray(lg.so3_exp(jnp.asarray(w)))
        t = rng.normal(0, 1.0, 3).astype(np.float32)
        return np.concatenate([q, t]).astype(np.float32)[None]

    def test_prior_residual_zero_at_center(self):
        rng = np.random.default_rng(0)
        pose = self._pose(rng)
        rm = np.asarray(lg.quat_to_matrix(jnp.asarray(pose[:, :4])))
        center = -np.einsum("pji,pj->pi", rm, pose[:, 4:])
        du, dg, cost = ba_mod.prior_terms(
            jnp.asarray(pose), jnp.asarray(center, jnp.float32),
            jnp.asarray([10.0], jnp.float32),
            jnp.asarray([False]), "identity", 1.0)
        assert float(cost) < 1e-8
        assert float(jnp.abs(dg).max()) < 1e-4

    def test_prior_gradient_matches_numeric(self):
        """dg must equal −∇_δ cost(retract(pose, δ)) at δ = 0 and dU the
        Gauss-Newton JᵀJ of the prior residual (identity loss). Central
        differences (autodiff through so3_exp at θ=0 NaNs on the sinc
        branch)."""
        rng = np.random.default_rng(1)
        pose = self._pose(rng)
        center = jnp.asarray(rng.normal(0, 1, (1, 3)), jnp.float32)
        invs = jnp.asarray([2.5], jnp.float32)
        fixed = jnp.asarray([False])

        def cost_at(delta):
            p2 = lg.se3_retract(jnp.asarray(pose), delta)
            _, _, c = ba_mod.prior_terms(
                p2, center, invs, fixed, "identity", 1.0)
            return float(c)

        eps = 1e-3
        g_num = np.zeros((1, 6), np.float32)
        for a in range(6):
            d = np.zeros((1, 6), np.float32)
            d[0, a] = eps
            g_num[0, a] = (cost_at(jnp.asarray(d))
                           - cost_at(jnp.asarray(-d))) / (2 * eps)
        du, dg, _ = ba_mod.prior_terms(
            jnp.asarray(pose), center, invs, fixed, "identity", 1.0)
        np.testing.assert_allclose(np.asarray(dg), -g_num,
                                   atol=1e-2, rtol=1e-3)

        # J via central differences on the whitened residual
        def resid(delta):
            p2 = lg.se3_retract(jnp.asarray(pose), delta)
            rm = lg.quat_to_matrix(p2[:, :4])
            c = -jnp.einsum("pji,pj->pi", rm, p2[:, 4:])
            return ((c - center) * invs[:, None])[0]

        eps = 1e-3
        j_num = np.zeros((3, 6), np.float32)
        for a in range(6):
            d = np.zeros((1, 6), np.float32)
            d[0, a] = eps
            j_num[:, a] = (np.asarray(resid(jnp.asarray(d)))
                           - np.asarray(resid(jnp.asarray(-d)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(du)[0], j_num.T @ j_num,
                                   atol=1e-3)

    def test_prior_on_fixed_pose_ignored(self):
        rng = np.random.default_rng(2)
        pose = self._pose(rng)
        du, dg, cost = ba_mod.prior_terms(
            jnp.asarray(pose),
            jnp.asarray(rng.normal(0, 1, (1, 3)), jnp.float32),
            jnp.asarray([100.0], jnp.float32),
            jnp.asarray([True]), "huber", 1.0)
        assert float(cost) == 0.0
        assert float(jnp.abs(du).max()) == 0.0
        assert float(jnp.abs(dg).max()) == 0.0
