"""Baseline config 5: full SLAM loop with ATE evaluation.

Reference capability: the assembled pipeline kornia-rs only hints at
(examples/colmap_rerun); SURVEY.md §7.7. Runs on a TUM RGB-D directory
when given one, else on a synthetic circular trajectory with loop
closure (no dataset download in this environment).

    python examples/slam_demo.py [--tum DIR | --synthetic]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend, make_mesh


def run_tum(args):
    import numpy as np
    import jax.numpy as jnp

    from kornia_tpu import io as kio, slam
    from kornia_tpu.geometry import liegroup as lg

    ds = kio.TumRgbdDataset(args.tum)
    k = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]])
    sys_ = slam.MonocularSlam(k, slam.SlamConfig(), mesh=make_mesh(args))
    n = min(len(ds), args.max_frames)
    for i in range(n):
        fr = ds[i]
        gray = np.asarray(fr.rgb).mean(-1).astype(np.uint8)
        r = sys_.process_frame(gray)
        if i % 20 == 0:
            print(f"frame {i}: {r.state.value}, tracked {r.n_tracked}")
    print(f"keyframes: {len(sys_.map.keyframes)}, "
          f"map points: {sys_.map.n_points}")
    if ds.groundtruth is not None and len(sys_.map.keyframes) > 3:
        kf_t = np.asarray([ds.timestamps[kf.frame_idx]
                           for kf in sys_.map.keyframes])
        gt_t = ds.groundtruth["timestamps"]
        idx = np.searchsorted(gt_t, kf_t).clip(0, len(gt_t) - 1)
        gt_c = ds.groundtruth["poses"][idx][:, 4:7]
        est_c = np.stack([
            np.asarray(lg.se3_inverse(jnp.asarray(kf.pose,
                                                  jnp.float32)))[4:7]
            for kf in sys_.map.keyframes])
        ate = slam.absolute_trajectory_error(est_c, gt_c)
        print(f"ATE RMSE: {ate.rmse:.4f} m (scale {ate.scale:.3f})")
    if args.viz:
        from kornia_tpu.utils.viz import slam_viz

        slam_viz(args.viz, sys_, title="slam_demo TUM")
        print(f"wrote {args.viz}")


def run_synthetic(args):
    import numpy as np

    from kornia_tpu import slam
    from kornia_tpu.bow import Vocabulary
    from tests.test_slam import (K, _camera_poses_circle, _make_scene,
                                 _observe)
    import jax.numpy as jnp
    from kornia_tpu.geometry import liegroup as lg

    rng = np.random.default_rng(0)
    pts, desc = _make_scene(rng, 900)
    n_frames = 40
    gt = _camera_poses_circle(n_frames, full=1.0)
    vocab = Vocabulary.build(desc, k=8, depth=3, seed=1)
    cfg = slam.SlamConfig(
        min_init_matches=30, keyframe_min_tracked_ratio=0.95,
        keyframe_min_interval=1, ba_window=4,
        loop_min_kf_gap=8, loop_min_score=0.10, loop_min_matches=15)
    mesh = make_mesh(args)
    if mesh is not None:
        print(f"distributed mode: {mesh.devices.size}-device mesh "
              f"(global BA = keyframe-sharded exchange -> psum'd Schur; "
              f"PGO = edge-sharded Gauss-Newton)")
    sys_ = slam.MonocularSlam(K, cfg, vocabulary=vocab, mesh=mesh)
    for i in range(n_frames + 3):
        pose = gt[i % n_frames]
        xy, d, _ = _observe(pts, desc, pose, K, 0.3, rng)
        r = sys_.process_observations(xy, d)
        tag = " KF" if r.is_keyframe else ""
        loop = (f" LOOP->kf{r.loop_closed_with}"
                if r.loop_closed_with is not None else "")
        if r.is_keyframe or loop:
            print(f"frame {r.frame_idx}: tracked {r.n_tracked}{tag}{loop}")
    kf_frames = [kf.frame_idx for kf in sys_.map.keyframes]
    est_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(kf.pose, jnp.float32)))[4:7]
        for kf in sys_.map.keyframes])
    gt_c = np.stack([
        np.asarray(lg.se3_inverse(jnp.asarray(
            gt[i % n_frames], jnp.float32)))[4:7] for i in kf_frames])
    ate = slam.absolute_trajectory_error(est_c, gt_c)
    print(f"keyframes {len(kf_frames)}, map points {sys_.map.n_points}, "
          f"ATE RMSE {ate.rmse:.4f} (radius 3.0)")
    if args.viz:
        from kornia_tpu.utils.viz import slam_viz

        slam_viz(args.viz, sys_, gt_centers=gt_c,
                 title="slam_demo synthetic circle")
        print(f"wrote {args.viz}")


def main():
    p = base_parser(__doc__)
    p.add_argument("--tum", default=None, help="TUM RGB-D directory")
    p.add_argument("--max-frames", type=int, default=200)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="run map-wide refinement distributed over an "
                        "N-device mesh (with --cpu: N virtual host "
                        "devices)")
    p.add_argument("--viz", default=None, metavar="OUT.html",
                   help="write a self-contained interactive 3-D view "
                        "of the trajectory/map/loop edges (the rerun "
                        "bridge equivalent, SURVEY §5.5)")
    args = p.parse_args()
    configure_backend(args)
    if args.tum:
        run_tum(args)
    else:
        run_synthetic(args)


if __name__ == "__main__":
    main()
