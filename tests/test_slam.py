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


def _kf_ate(sys_, gt, n_frames):
    """ATE RMSE of keyframe camera centers vs ground truth."""
    kf_frames = [kf.frame_idx for kf in sys_.map.keyframes]
    est_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(kf.pose, jnp.float32)))[4:7]
        for kf in sys_.map.keyframes])
    gt_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(
            gt[i % n_frames], jnp.float32)))[4:7] for i in kf_frames])
    return slam.absolute_trajectory_error(est_c, gt_c).rmse


def _reproj_rms(sys_):
    """Map-wide reprojection RMS over every stored observation."""
    k = sys_.k
    errs = []
    for pid in range(sys_.map.n_points):
        if not sys_.map.point_valid[pid]:
            continue
        p = sys_.map.point_xyz[pid]
        for kf_id, fi in sys_.map.point_obs[pid]:
            kf = sys_.map.keyframes[kf_id]
            cam = np.asarray(lg.se3_apply(
                jnp.asarray(kf.pose, jnp.float32)[None],
                jnp.asarray(p[None], jnp.float32)), np.float64)[0]
            if cam[2] < 1e-6:
                continue
            uv = cam[:2] / cam[2] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
            errs.append(np.linalg.norm(uv - kf.xy[fi]))
    return float(np.sqrt(np.mean(np.square(errs))))


class TestGlobalBA:
    """VERDICT.md round-2 item 2: full-map BA after loop closure."""

    def _run_loop_scenario(self, seed, **cfg_over):
        rng = np.random.default_rng(seed)
        pts, desc = _make_scene(rng, 900)
        n_frames = 40
        gt = _camera_poses_circle(n_frames, full=1.0)
        vocab = Vocabulary.build(desc, k=8, depth=3, seed=1)
        cfg = slam.SlamConfig(
            min_init_matches=30, keyframe_min_tracked_ratio=0.95,
            keyframe_min_interval=1, ba_window=4,
            loop_min_kf_gap=8, loop_min_score=0.10, loop_min_matches=15,
            **cfg_over)
        sys_ = slam.MonocularSlam(K, cfg, vocabulary=vocab)
        for i in range(n_frames + 3):
            xy, d, _ = _observe(pts, desc, gt[i % n_frames], K, 0.3, rng)
            sys_.process_observations(xy, d)
        return sys_, gt, n_frames

    def test_global_ba_beats_pgo_only(self):
        """After a loop closure, map-wide BA must leave the map strictly
        more consistent than the PGO-only correction (reprojection RMS)
        and no worse in ATE."""
        sys_, gt, n_frames = self._run_loop_scenario(
            11, global_ba_on_loop=False)
        assert any(r.loop_closed_with is not None for r in sys_.results)
        ate_pgo = _kf_ate(sys_, gt, n_frames)
        rms_pgo = _reproj_rms(sys_)
        assert sys_.global_ba()
        ate_gba = _kf_ate(sys_, gt, n_frames)
        rms_gba = _reproj_rms(sys_)
        assert rms_gba < rms_pgo * 0.6, (rms_pgo, rms_gba)
        assert ate_gba < ate_pgo * 0.9, (ate_pgo, ate_gba)

    def test_loop_closure_runs_global_ba_by_default(self):
        sys_, gt, n_frames = self._run_loop_scenario(11)
        assert any(r.loop_closed_with is not None for r in sys_.results)
        # the post-closure map must already be BA-consistent
        assert _reproj_rms(sys_) < 1.0

    def test_global_ba_distributed_matches_single_host(self):
        """MonocularSlam's distributed global-BA mode (keyframe-sharded
        exchange → psum'd Schur, parallel.ba_dist) must match the
        single-host path to f32 tolerance (VERDICT.md item 1a)."""
        import jax
        from jax.sharding import Mesh

        sys_, gt, n_frames = self._run_loop_scenario(
            11, global_ba_on_loop=False)
        snap_poses = [kf.pose.copy() for kf in sys_.map.keyframes]
        snap_pts = sys_.map.point_xyz.copy()

        assert sys_.global_ba(distributed=False)
        single_poses = np.stack([kf.pose for kf in sys_.map.keyframes])
        single_pts = sys_.map.point_xyz.copy()

        for kf, p in zip(sys_.map.keyframes, snap_poses):
            kf.pose = p.copy()
        sys_.map.point_xyz = snap_pts.copy()
        sys_.mesh = Mesh(np.asarray(jax.devices()[:8]), ("obs",))
        assert sys_.global_ba(distributed=True)
        dist_poses = np.stack([kf.pose for kf in sys_.map.keyframes])

        np.testing.assert_allclose(dist_poses, single_poses, atol=5e-3)
        np.testing.assert_allclose(
            sys_.map.point_xyz, single_pts, atol=2e-2)


def _build_synthetic_map(rng, n_kf, n_points, obs_per_kf=40,
                         pose_noise=0.01, point_noise=0.05,
                         px_noise=0.3):
    """Construct a SlamMap directly (bypassing tracking) at a chosen
    scale; returns (map, gt_poses)."""
    gt = _camera_poses_circle(n_kf)
    pts, desc = _make_scene(rng, n_points)
    m = slam.SlamMap()
    obs_lists = [[] for _ in range(n_points)]
    for i in range(n_kf):
        xy, _, ids = _observe(pts, desc, gt[i], K, px_noise, rng)
        if len(ids) > obs_per_kf:
            sel = rng.choice(len(ids), obs_per_kf, replace=False)
            xy, ids = xy[sel], ids[sel]
        # perturbed initial pose
        tang = np.concatenate([rng.normal(0, pose_noise, 3),
                               rng.normal(0, pose_noise / 3, 3)])
        pose = np.asarray(lg.se3_retract(
            jnp.asarray(gt[i], jnp.float32)[None],
            jnp.asarray(tang, jnp.float32)[None]), np.float64)[0]
        if i < 2:
            pose = gt[i].copy()  # gauge anchors stay exact
        kf = m.add_keyframe(i, pose, xy, np.zeros((len(xy), 32), np.uint8))
        for row, pid in enumerate(ids):
            obs_lists[pid].append((i, row))
    keep = [p for p in range(n_points) if len(obs_lists[p]) >= 2]
    pid_of = {}
    for p in keep:
        pid_of[p] = None
    noisy = pts[keep] + rng.normal(0, point_noise, (len(keep), 3))
    pids = m.add_points(noisy, np.zeros((len(keep), 32), np.uint8),
                        [obs_lists[p] for p in keep])
    for new_id, p in zip(pids, keep):
        for kf_id, row in obs_lists[p]:
            m.keyframes[kf_id].point_ids[row] = new_id
    return m, gt


class TestGlobalBA600:
    @pytest.mark.slow
    def test_600_pose_class_pcg(self):
        """global_ba at the Ceres DENSE_SCHUR-class scale the PCG solver
        exists for (auto solver switches to PCG above 400 poses)."""
        rng = np.random.default_rng(7)
        n_kf = 600
        m, gt = _build_synthetic_map(rng, n_kf, 2500, obs_per_kf=30)
        sys_ = slam.MonocularSlam(K, slam.SlamConfig())
        sys_.map = m
        rms_before = _reproj_rms(sys_)
        ate_before = _kf_ate(sys_, gt, n_kf)
        assert sys_.global_ba(iterations=8)
        rms_after = _reproj_rms(sys_)
        ate_after = _kf_ate(sys_, gt, n_kf)
        assert rms_after < rms_before * 0.5, (rms_before, rms_after)
        assert ate_after < ate_before, (ate_before, ate_after)


class TestViz:
    def test_write_trajectory_html(self, tmp_path):
        """The rerun-bridge equivalent (SURVEY §5.5): a self-contained
        HTML view with the trajectory/points/loops embedded."""
        from kornia_tpu.utils.viz import write_trajectory_html

        rng = np.random.default_rng(0)
        est = rng.random((12, 3))
        out = tmp_path / "traj.html"
        write_trajectory_html(str(out), est, gt_centers=est + 0.01,
                              points=rng.random((500, 3)),
                              loop_edges=[(0, 10)])
        html = out.read_text()
        assert "<canvas" in html and '"loops": [[0, 10]]' in html
        assert html.count("[") > 500  # data really embedded


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


class TestRenderedSequence:
    """VERDICT r3 weak #8: drive process_frame (the IMAGE front-end:
    pyramid → ORB → match → PnP) over a rendered multi-frame sequence —
    the front-end/back-end integration no observation-level test
    exercises."""

    @pytest.mark.slow
    def test_textured_plane_sequence(self):
        import cv2

        rng = np.random.default_rng(5)
        # textured plane at z = 5: world X = (u−600)/100, Y = (v−450)/100
        tex_small = (rng.random((90, 120)) * 255).astype(np.uint8)
        tex = cv2.resize(tex_small, (1200, 900),
                         interpolation=cv2.INTER_CUBIC)
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        a = np.array([[0.01, 0, -6.0], [0, 0.01, -4.5], [0, 0, 5.0]])

        n_frames = 30
        gt = []        # (7,) world→camera
        frames = []
        for i in range(n_frames):
            yaw = 0.004 * i
            r = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                          [0, 1, 0],
                          [-np.sin(yaw), 0, np.cos(yaw)]])
            center = np.array([0.08 * i, 0.01 * i, 0.0])
            t = -r @ center
            q = np.asarray(lg.matrix_to_quat(jnp.asarray(r, jnp.float32)))
            gt.append(np.concatenate([q, t]).astype(np.float64))
            m = r @ a
            m[:, 2] += t
            h = k @ m
            frames.append(cv2.warpPerspective(
                tex, h, (640, 480), flags=cv2.INTER_LINEAR))
        gt = np.stack(gt)

        cfg = slam.SlamConfig(n_features=800, n_levels=4,
                              min_init_matches=40,
                              keyframe_min_interval=2)
        sys_ = slam.MonocularSlam(
            np.asarray(k, np.float64), cfg)
        for f in frames:
            sys_.process_frame(f)

        tracked = [r for r in sys_.results if r.pose is not None]
        # the front-end must keep lock on the textured scene
        assert len(tracked) >= 0.7 * n_frames, len(tracked)
        assert len(sys_.map.keyframes) >= 5

        # ATE (sim3-aligned camera centers) small vs the 2.4-unit path
        ate = _kf_ate(sys_, gt, n_frames)
        assert ate < 0.12, ate

    @pytest.mark.slow
    def test_image_loop_closure_improves_ate(self):
        """VERDICT r4 item 3: loop closure through the IMAGE path — an
        out-and-back rendered trajectory revisits its start view, the
        BoW database (vocabulary trained on the sequence's own ORB
        descriptors) detects the revisit from images alone, and the
        loop-triggered global BA measurably improves ATE vs the same
        run without a vocabulary (prototype: 3 loops, ATE
        0.0112 → 0.0057)."""
        import cv2

        rng = np.random.default_rng(11)
        tex_small = (rng.random((90, 120)) * 255).astype(np.uint8)
        tex = cv2.resize(tex_small, (1200, 900),
                         interpolation=cv2.INTER_CUBIC)
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        a = np.array([[0.01, 0, -6.0], [0, 0.01, -4.5], [0, 0, 5.0]])

        n_frames = 36
        half = n_frames // 2
        gt, frames = [], []
        for i in range(n_frames):
            s = i if i < half else (n_frames - 1 - i)  # out and back
            yaw = 0.004 * i                            # monotone sway
            r = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                          [0, 1, 0],
                          [-np.sin(yaw), 0, np.cos(yaw)]])
            center = np.array([0.10 * s, 0.012 * s, 0.0])
            t = -r @ center
            q = np.asarray(lg.matrix_to_quat(jnp.asarray(r, jnp.float32)))
            gt.append(np.concatenate([q, t]).astype(np.float64))
            m = r @ a
            m[:, 2] += t
            img = cv2.warpPerspective(tex, k @ m, (640, 480),
                                      flags=cv2.INTER_LINEAR)
            noise = rng.normal(0, 2.0, img.shape)
            frames.append(np.clip(img.astype(np.float64) + noise,
                                  0, 255).astype(np.uint8))
        gt = np.stack(gt)

        # vocabulary from the sequence's own descriptors
        from kornia_tpu.bow import Vocabulary
        from kornia_tpu.features import orb as O
        descs = []
        for f in frames[::6]:
            feats = O.orb_detect_and_describe(
                jnp.asarray(f), O.OrbConfig(n_features=500, n_levels=4))
            msk = np.asarray(feats.mask)
            descs.append(np.packbits(
                np.asarray(feats.descriptors)[msk].astype(np.uint8),
                axis=1))
        vocab = Vocabulary.build(np.concatenate(descs), k=8, depth=3,
                                 seed=1)

        def run(v):
            cfg = slam.SlamConfig(
                n_features=800, n_levels=4, min_init_matches=40,
                keyframe_min_interval=2, loop_min_kf_gap=8,
                loop_min_score=0.10, loop_min_matches=15)
            s_ = slam.MonocularSlam(np.asarray(k, np.float64), cfg,
                                    vocabulary=v)
            loops = []
            for f in frames:
                r_ = s_.process_frame(f)
                if r_.loop_closed_with is not None:
                    loops.append((r_.frame_idx, r_.loop_closed_with))
            return s_, loops

        sys_nl, _ = run(None)
        sys_l, loops = run(vocab)
        assert loops, "image-level loop closure never fired"
        # loops must point back to EARLY keyframes (a true revisit)
        assert min(l[1] for l in loops) < 8, loops
        ate_l = _kf_ate(sys_l, gt, n_frames)
        ate_nl = _kf_ate(sys_nl, gt, n_frames)
        assert ate_l < 0.05, ate_l
        assert ate_l <= ate_nl * 0.9, (ate_l, ate_nl)
