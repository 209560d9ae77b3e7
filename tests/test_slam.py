"""SLAM loop tests: evaluation metrics, synthetic-observation VO with
local BA, loop closure + PGO, and map checkpoint round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from kornia_tpu import slam
from kornia_tpu.bow import Vocabulary
from kornia_tpu.geometry import liegroup as lg


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


class TestEvaluate:
    def test_umeyama_recovers_transform(self, rng):
        src = rng.standard_normal((60, 3))
        th = 0.7
        r_true = np.array([
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1]])
        dst = 2.5 * src @ r_true.T + np.array([1.0, -2.0, 3.0])
        s, r, t = slam.umeyama_alignment(src, dst)
        assert s == pytest.approx(2.5, rel=1e-9)
        np.testing.assert_allclose(r, r_true, atol=1e-9)
        np.testing.assert_allclose(t, [1, -2, 3], atol=1e-9)

    def test_ate_zero_when_similar(self, rng):
        traj = np.cumsum(rng.standard_normal((40, 3)) * 0.1, axis=0)
        est = 0.5 * traj @ np.eye(3) + 7.0  # scaled + offset
        res = slam.absolute_trajectory_error(est, traj)
        assert res.rmse < 1e-9

    def test_ate_measures_noise(self, rng):
        traj = np.cumsum(rng.standard_normal((100, 3)) * 0.1, axis=0)
        est = traj + rng.normal(0, 0.05, traj.shape)
        res = slam.absolute_trajectory_error(est, traj)
        assert 0.02 < res.rmse < 0.15

    def test_rpe_identity(self, rng):
        t44 = np.tile(np.eye(4), (10, 1, 1))
        for i in range(10):
            t44[i, :3, 3] = [i * 0.1, 0, 0]
        res = slam.relative_pose_error(t44, t44.copy())
        assert res.trans_rmse < 1e-12
        assert res.rot_rmse_deg < 1e-9


def _make_scene(rng, n_points=800, r_in=7.0, r_out=12.0):
    """Points on an annulus wall around the camera circle (outward-looking
    cameras always see a dense patch); distinctive random binary codes."""
    ang = rng.uniform(0, 2 * np.pi, n_points)
    rad = rng.uniform(r_in, r_out, n_points)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                    rng.uniform(-2.0, 2.0, n_points)], axis=1)
    desc = rng.integers(0, 256, (n_points, 32), np.uint8)
    return pts, desc


def _camera_poses_circle(n, radius=3.0, full=1.0):
    """world→camera poses looking outward along a circle in the z=0
    plane. Returns (n, 7)."""
    poses = []
    for i in range(n):
        a = full * 2 * np.pi * i / n
        center = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        fwd = np.array([np.cos(a), np.sin(a), 0.0])  # look outward
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        r_wc = np.stack([right, -up, fwd], axis=0)  # rows: cam x/y/z in world
        t = -r_wc @ center
        q = np.asarray(lg.matrix_to_quat(jnp.asarray(r_wc, jnp.float32)))
        poses.append(np.concatenate([q, t]))
    return np.stack(poses)


def _observe(pts, desc, pose7, k, noise, rng, img_wh=(640, 480)):
    """Project the scene into a camera; returns (xy, desc, ids)."""
    cam = np.asarray(lg.se3_apply(
        jnp.asarray(pose7, jnp.float32)[None],
        jnp.asarray(pts, jnp.float32)), np.float64)
    vis = cam[:, 2] > 0.5
    uv = cam[:, :2] / cam[:, 2:]
    uv = uv * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
    vis &= ((uv[:, 0] > 5) & (uv[:, 0] < img_wh[0] - 5)
            & (uv[:, 1] > 5) & (uv[:, 1] < img_wh[1] - 5))
    ids = np.nonzero(vis)[0]
    xy = uv[ids] + rng.normal(0, noise, (len(ids), 2))
    return xy, desc[ids], ids


K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])


class TestMonocularVO:
    def test_arc_trajectory(self, rng):
        """VO over a 60° arc: ATE (after Sim3 alignment) must be small."""
        pts, desc = _make_scene(rng)
        gt = _camera_poses_circle(25, full=60.0 / 360.0)
        cfg = slam.SlamConfig(
            min_init_matches=30, keyframe_min_tracked_ratio=0.95,
            keyframe_min_interval=1, ba_window=4)
        sys_ = slam.MonocularSlam(K, cfg)
        for pose in gt:
            xy, d, _ = _observe(pts, desc, pose, K, 0.3, rng)
            sys_.process_observations(xy, d)

        assert sys_.state == slam.TrackingState.TRACKING
        tracked = [r for r in sys_.results if r.pose is not None]
        assert len(tracked) >= 20

        # compare camera centers of keyframes vs gt
        kf_frames = [kf.frame_idx for kf in sys_.map.keyframes]
        est_c = np.stack([
            np.asarray(lg.se3_inverse(jnp.asarray(kf.pose,
                                                  jnp.float32)))[4:7]
            for kf in sys_.map.keyframes])
        gt_c = np.stack([
            np.asarray(lg.se3_inverse(jnp.asarray(gt[i],
                                                  jnp.float32)))[4:7]
            for i in kf_frames])
        res = slam.absolute_trajectory_error(est_c, gt_c)
        assert res.rmse < 0.05 * 3.0  # <5% of trajectory radius

    def test_relocalize_not_lost_on_good_data(self, rng):
        pts, desc = _make_scene(rng, 600)
        gt = _camera_poses_circle(10, full=0.1)
        sys_ = slam.MonocularSlam(K, slam.SlamConfig(min_init_matches=30))
        for pose in gt:
            xy, d, _ = _observe(pts, desc, pose, K, 0.2, rng)
            sys_.process_observations(xy, d)
        assert sys_.state != slam.TrackingState.LOST

    def test_loop_closure_fires(self, rng):
        """Full circle: drift accumulates, BoW finds the revisit, PGO
        runs, and the loop edge is recorded."""
        pts, desc = _make_scene(rng, 900)
        n_frames = 40
        gt = _camera_poses_circle(n_frames, full=1.0)

        # vocabulary trained on the scene descriptors
        vocab = Vocabulary.build(desc, k=8, depth=3, seed=1)
        cfg = slam.SlamConfig(
            min_init_matches=30, keyframe_min_tracked_ratio=0.95,
            keyframe_min_interval=1, ba_window=4,
            loop_min_kf_gap=8, loop_min_score=0.10, loop_min_matches=15)
        sys_ = slam.MonocularSlam(K, cfg, vocabulary=vocab)
        loops = []
        for i in range(n_frames + 3):
            pose = gt[i % n_frames]
            xy, d, _ = _observe(pts, desc, pose, K, 0.3, rng)
            r = sys_.process_observations(xy, d)
            if r.loop_closed_with is not None:
                loops.append((r.frame_idx, r.loop_closed_with))
        assert sys_.state == slam.TrackingState.TRACKING
        assert loops, "loop closure never fired on a full circle revisit"
        # a loop edge with elevated weight must be in the pose graph
        assert any(w > 1.0 for *_xx, w in sys_.map.edges)


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        pts, desc = _make_scene(rng, 600)
        gt = _camera_poses_circle(8, full=0.15)
        sys_ = slam.MonocularSlam(K, slam.SlamConfig(
            min_init_matches=30, keyframe_min_interval=1,
            keyframe_min_tracked_ratio=0.95))
        for pose in gt:
            xy, d, _ = _observe(pts, desc, pose, K, 0.2, rng)
            sys_.process_observations(xy, d)

        p = str(tmp_path / "map.npz")
        slam.save_map(p, sys_.map)
        m2 = slam.load_map(p)
        assert len(m2.keyframes) == len(sys_.map.keyframes)
        assert m2.n_points == sys_.map.n_points
        np.testing.assert_array_equal(m2.point_xyz, sys_.map.point_xyz)
        np.testing.assert_array_equal(m2.point_desc, sys_.map.point_desc)
        for a, b in zip(m2.keyframes, sys_.map.keyframes):
            np.testing.assert_array_equal(a.pose, b.pose)
            np.testing.assert_array_equal(a.point_ids, b.point_ids)
        assert m2.point_obs == sys_.map.point_obs
        assert len(m2.edges) == len(sys_.map.edges)

    def test_resume_tracking(self, rng, tmp_path):
        """A new system over a loaded map can keep tracking."""
        pts, desc = _make_scene(rng, 600)
        gt = _camera_poses_circle(12, full=0.2)
        sys_ = slam.MonocularSlam(K, slam.SlamConfig(
            min_init_matches=30, keyframe_min_interval=1,
            keyframe_min_tracked_ratio=0.95))
        for pose in gt[:8]:
            xy, d, _ = _observe(pts, desc, pose, K, 0.2, rng)
            sys_.process_observations(xy, d)
        p = str(tmp_path / "map.npz")
        slam.save_map(p, sys_.map)

        sys2 = slam.MonocularSlam(K, sys_.config)
        sys2.map = slam.load_map(p)
        sys2.state = slam.TrackingState.TRACKING
        sys2._frame_idx = sys_._frame_idx
        ok = 0
        for pose in gt[8:]:
            xy, d, _ = _observe(pts, desc, pose, K, 0.2, rng)
            r = sys2.process_observations(xy, d)
            ok += r.pose is not None
        assert ok == 4
