"""North-star SLAM metrics (BASELINE.json): two-view accuracy on the
EuRoC MH01 pair, front-end frames/s/chip, and ATE on a synthetic
trajectory through the full MonocularSlam loop.

Protocol mirrors the reference's bench_two_view_pose.py: same frames,
same K, same GT (rot 2.7021 deg, t-dir [0.2422, -0.2330, 0.9418],
derived from the EuRoC Vicon groundtruth by derive_mh01_gt.py), error =
|angle(R) - GT| and angle(t, t_gt), median over pose seeds. Device
timings use the slope instrument (PERF_NOTES.md methodology); the
wall-clock loop rate through the axon tunnel is reported separately
from the per-frame device cost (the tunnel adds ~5-15 ms dispatch
latency per stage that a locally-attached chip does not pay).

Usage: python bench_slam.py [--quick]
Writes one JSON line to stdout; human-readable rows to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

MH01_A = "/root/reference/tests/data/mh01_frame1.png"
MH01_B = "/root/reference/tests/data/mh01_frame2.png"
K_MH01 = np.array([[458.654, 0.0, 367.215],
                   [0.0, 457.296, 248.375],
                   [0.0, 0.0, 1.0]])
GT_ROT_DEG = 2.7021
GT_T_DIR = np.array([0.2422, -0.2330, 0.9418])
GT_T_DIR = GT_T_DIR / np.linalg.norm(GT_T_DIR)


def _slope(op, args, ks, reps=3):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(args, seed):
            a0 = args[0] + seed.astype(args[0].dtype)
            rest = args[1:]

            def body(carry, _):
                out = op(carry, *rest)
                leaves = jax.tree_util.tree_leaves(out)
                probe = sum(jnp.sum(l.astype(jnp.float32))
                            for l in leaves)
                bump = (probe * jnp.float32(1e-30)).astype(carry.dtype)
                return carry + bump, probe

            _, probes = jax.lax.scan(body, a0, None, length=n)
            return probes.sum()

        return run

    times = {}
    for n in ks:
        fn = make(n)
        float(fn(args, jnp.float32(1)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(fn(args, jnp.float32(i + 2)))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0]) * 1e3


def rotation_angle_deg(r):
    tr = float(np.trace(r))
    return float(np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1))))


def two_view_euroc(out, quick=False):
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from kornia_tpu.features import matching, orb
    from kornia_tpu.geometry import twoview

    g1 = np.asarray(PILImage.open(MH01_A).convert("L"))
    g2 = np.asarray(PILImage.open(MH01_B).convert("L"))
    kj = jnp.asarray(K_MH01, jnp.float32)
    cfg = orb.OrbConfig(n_features=800, n_levels=4)

    @jax.jit
    def detect(a):
        return orb.orb_detect_and_describe(a, cfg)

    @jax.jit
    def match(f1_desc, f1_mask, f2_desc, f2_mask):
        return matching.match_descriptors(
            f1_desc, f2_desc, a_mask=f1_mask, b_mask=f2_mask,
            max_distance=64, ratio=0.8)

    def pose_fn(key, x1, x2, valid, refine, solver="8pt"):
        return twoview.estimate_relative_pose(
            key, x1, x2, kj, kj, mask=valid,
            params=twoview.TwoViewParams(
                solver=solver,
                refine_iters=12 if refine else 0))

    f1 = detect(jnp.asarray(g1))
    f2 = detect(jnp.asarray(g2))
    m = match(f1.descriptors, f1.mask, f2.descriptors, f2.mask)
    idx = np.asarray(m.idx)
    ok = np.asarray(m.mask)
    x1 = np.asarray(f1.xy)[ok]
    x2 = np.asarray(f2.xy)[np.maximum(idx, 0)[ok]]
    n_matches = int(ok.sum())

    nb = 512
    valid = np.zeros(nb, bool)
    valid[:n_matches] = True
    x1p = np.zeros((nb, 2), np.float32)
    x2p = np.zeros((nb, 2), np.float32)
    x1p[:n_matches] = x1[:nb]
    x2p[:n_matches] = x2[:nb]
    x1j, x2j = jnp.asarray(x1p), jnp.asarray(x2p)
    vj = jnp.asarray(valid)

    pose_jit = jax.jit(
        lambda key, a, b, v, refine, solver="8pt":
        pose_fn(key, a, b, v, refine, solver),
        static_argnames=("refine", "solver"))

    seeds = 5 if quick else 20
    for refine in (False, True):
        rot_errs, t_errs, inl = [], [], []
        for s in range(seeds):
            res = pose_jit(jax.random.PRNGKey(s), x1j, x2j, vj, refine)
            r = np.asarray(res.rotation)
            t = np.asarray(res.translation)
            rot_errs.append(abs(rotation_angle_deg(r) - GT_ROT_DEG))
            t_errs.append(float(np.degrees(np.arccos(np.clip(
                abs(t @ GT_T_DIR), 0, 1)))))
            inl.append(int(res.n_inliers))
        tag = "refined" if refine else "unrefined"
        out[f"two_view_rot_err_deg_{tag}"] = round(
            float(np.median(rot_errs)), 4)
        out[f"two_view_t_err_deg_{tag}"] = round(
            float(np.median(t_errs)), 3)
        out[f"two_view_inliers_{tag}"] = int(np.median(inl))
    out["two_view_matches"] = n_matches

    # device timings (slope)
    out["detect_ms"] = round(_slope(
        lambda a: detect(a).descriptors, (jnp.asarray(g1),),
        ks=(2, 12)), 3)
    out["match_ms"] = round(_slope(
        lambda d: match(d, f1.mask, f2.descriptors, f2.mask).idx,
        (f1.descriptors,), ks=(4, 40)), 3)
    out["pose_ms"] = round(_slope(
        lambda a: pose_jit(jax.random.PRNGKey(0), a, x2j, vj,
                           True).rotation,
        (x1j,), ks=(2, 10)), 3)
    out["two_view_total_ms"] = round(
        2 * out["detect_ms"] + out["match_ms"] + out["pose_ms"], 3)
    print(f"# two-view: rot {out['two_view_rot_err_deg_refined']} deg "
          f"(unref {out['two_view_rot_err_deg_unrefined']}), "
          f"t {out['two_view_t_err_deg_refined']} deg, "
          f"{out['two_view_inliers_refined']}/{n_matches} inliers, "
          f"detect {out['detect_ms']} + match {out['match_ms']} + "
          f"pose {out['pose_ms']} ms", file=sys.stderr)


def synthetic_ate(out, quick=False):
    import jax.numpy as jnp
    from kornia_tpu import slam
    from kornia_tpu.geometry import liegroup as lg

    sys.path.insert(0, "tests")
    from test_slam import (_make_scene, _camera_poses_circle, _observe,
                           K)

    rng = np.random.default_rng(7)
    pts, desc = _make_scene(rng, n_points=1200)
    n_frames = 20 if quick else 40
    gt = _camera_poses_circle(n_frames, full=90.0 / 360.0)
    cfg = slam.SlamConfig(min_init_matches=30,
                          keyframe_min_tracked_ratio=0.95,
                          keyframe_min_interval=1, ba_window=4)
    sys_ = slam.MonocularSlam(K, cfg)
    frames = [_observe(pts, desc, p, K, 0.3, rng)[:2] for p in gt]
    t0 = time.perf_counter()
    for xy, d in frames:
        sys_.process_observations(xy, d)
    wall = time.perf_counter() - t0
    tracked = [r for r in sys_.results if r.pose is not None]

    kf_frames = [kf.frame_idx for kf in sys_.map.keyframes]
    est_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(kf.pose, jnp.float32)))[4:7]
        for kf in sys_.map.keyframes])
    gt_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(gt[i], jnp.float32)))[4:7]
        for i in kf_frames])
    res = slam.absolute_trajectory_error(est_c, gt_c)
    out["slam_ate_rmse"] = round(float(res.rmse), 4)
    out["slam_frames_tracked"] = len(tracked)
    out["slam_n_frames"] = n_frames
    out["slam_wall_fps_tunnel"] = round(n_frames / wall, 2)
    print(f"# synthetic ATE: rmse {out['slam_ate_rmse']} "
          f"(trajectory radius 3.0), {len(tracked)}/{n_frames} tracked, "
          f"wall {out['slam_wall_fps_tunnel']} fps through the tunnel",
          file=sys.stderr)


def frontend_device_rate(out):
    """Per-frame device cost of the tracking stages at SLAM shapes:
    ORB 752x480 + packed match 1024x2048 + PnP RANSAC+LM refine."""
    import jax
    import jax.numpy as jnp
    from kornia_tpu.features import matching, orb
    from kornia_tpu.geometry import pnp as pnp_mod

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.integers(0, 256, (480, 752), np.uint8))
    cfg = orb.OrbConfig(n_features=1000, n_levels=4)
    orb_ms = _slope(
        lambda a: orb.orb_detect_and_describe(a, cfg).descriptors,
        (g,), ks=(2, 12))

    da = jnp.asarray(rng.integers(0, 256, (1024, 32), np.uint8))
    db = jnp.asarray(rng.integers(0, 256, (2048, 32), np.uint8))
    match_ms = _slope(
        lambda a: matching.match_descriptors_packed(
            a, db, max_distance=64, ratio=0.8).idx, (da,), ks=(4, 40))

    world = jnp.asarray(rng.uniform(-3, 3, (512, 3)).astype(np.float32))
    pix = jnp.asarray(rng.uniform(0, 640, (512, 2)).astype(np.float32))
    kj = jnp.asarray(K_MH01, jnp.float32)
    pnp_ms = _slope(
        lambda w: pnp_mod.solve_pnp_ransac(
            jax.random.PRNGKey(0), w, pix, kj)[0].rotation,
        (world,), ks=(2, 8))

    per_frame = orb_ms + match_ms + pnp_ms
    out["frontend_orb_ms"] = round(orb_ms, 3)
    out["frontend_match_ms"] = round(match_ms, 3)
    out["frontend_pnp_ms"] = round(pnp_ms, 3)
    out["frontend_ms_per_frame"] = round(per_frame, 3)
    out["frontend_fps_per_chip"] = round(1000.0 / per_frame, 1)
    print(f"# front-end device: orb {orb_ms:.2f} + match {match_ms:.2f}"
          f" + pnp {pnp_ms:.2f} = {per_frame:.2f} ms/frame -> "
          f"{out['frontend_fps_per_chip']} frames/s/chip",
          file=sys.stderr)


def main():
    quick = "--quick" in sys.argv
    out = {}
    two_view_euroc(out, quick)
    frontend_device_rate(out)
    synthetic_ate(out, quick)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
