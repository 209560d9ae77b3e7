"""Monocular visual SLAM: tracking, keyframing, local BA, loop closure.

The end-to-end loop of SURVEY.md §7.7 — the integration target the
reference provides pieces for but never assembles (kornia-rs ships the
front-end, two-view, BA, PGO as separate crates). Composition:

  frame → ORB (features.orb, jitted)           [TPU]
        → map-point association (popcount matmul against local map) [TPU]
        → PnP RANSAC tracking (geometry.pnp, batched)               [TPU]
        → keyframe policy → triangulate new points + local Schur BA [TPU]
        → BoW loop detection (bow.*) → PGO over the keyframe graph  [TPU]

All device stages are fixed-shape batched programs; the map itself
(irregular, growing) lives on host as numpy — the same host/device
split the reference uses between its dense kernels and its bookkeeping.

Frames can also be fed as pre-extracted observations
(:meth:`MonocularSlam.process_observations`) so the geometric loop is
testable without image rendering — the "fake backend" testing analogue
from SURVEY.md §4.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from kornia_tpu.features import matching, orb
from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.geometry import pnp as pnp_mod
from kornia_tpu.geometry import twoview as tv
from kornia_tpu.geometry import triangulation as tri
from kornia_tpu.optim import ba as ba_mod
from kornia_tpu.optim import pgo as pgo_mod
from kornia_tpu.bow import BowDatabase, Vocabulary
from kornia_tpu.slam.map import SlamMap

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from jax.sharding import Mesh


class TrackingState(Enum):
    INITIALIZING = "initializing"
    TRACKING = "tracking"
    LOST = "lost"


@dataclass
class SlamConfig:
    n_features: int = 1000
    n_levels: int = 4
    match_max_distance: int = 64
    match_ratio: float = 0.8
    min_init_matches: int = 40
    min_init_inliers: int = 25
    min_track_points: int = 12
    pnp_threshold_px: float = 3.0
    keyframe_min_tracked_ratio: float = 0.6
    keyframe_min_interval: int = 3
    ba_window: int = 5
    ba_iterations: int = 10
    global_ba_iterations: int = 12
    global_ba_on_loop: bool = True
    loop_min_score: float = 0.25
    loop_min_kf_gap: int = 10
    loop_min_matches: int = 20
    seed: int = 0


@dataclass
class FrameResult:
    frame_idx: int
    state: TrackingState
    pose: Optional[np.ndarray]          # (7,) world→camera (None if lost)
    n_tracked: int
    is_keyframe: bool
    loop_closed_with: Optional[int] = None


def _pack(desc_bits: np.ndarray) -> np.ndarray:
    return np.packbits(desc_bits.astype(np.uint8), axis=1)


def _bucket(n: int, step: int) -> int:
    """Round n up to the bucket grid (powers-of-two multiples of step) so
    jitted stages compile once per bucket instead of once per frame —
    the fixed-shape discipline of SURVEY.md §7 applied to the SLAM loop."""
    b = step
    while b < n:
        b *= 2
    return b


def _pad_rows(arr: np.ndarray, n_to: int, fill=0.0) -> np.ndarray:
    if len(arr) >= n_to:
        return arr[:n_to]
    pad = np.full((n_to - len(arr),) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad])


import functools


@functools.partial(jax.jit, static_argnames=("max_distance", "ratio"))
def _match_packed_jit(a, b, am, bm, max_distance, ratio):
    return matching.match_descriptors_packed(
        a, b, a_mask=am, b_mask=bm,
        max_distance=float(max_distance), ratio=float(ratio))


@functools.partial(
    jax.jit,
    static_argnames=("max_distance", "ratio", "threshold_px"))
def _track_step_jit(key, frame_desc, frame_mask, frame_xy,
                    map_desc, map_mask, map_xyz, k,
                    max_distance, ratio, threshold_px):
    """The whole per-frame tracking step as ONE compiled program
    (VERDICT.md #4): packed Hamming match (MXU popcount matmul) ->
    matched-pair assembly -> PnP RANSAC -> analytic-Jacobian LM polish.
    Host code only reads back the pose, the inlier mask and the match
    assignment — one device round trip per frame instead of four.
    """
    m = matching.match_descriptors_packed(
        frame_desc, map_desc, a_mask=frame_mask, b_mask=map_mask,
        max_distance=float(max_distance), ratio=float(ratio))
    midx = jnp.maximum(m.idx, 0)
    world = map_xyz[midx]
    pix = frame_xy
    pose, inliers, n_inl = pnp_mod.solve_pnp_ransac(
        key, world, pix, k, threshold_px=float(threshold_px),
        mask=m.mask)
    return pose, inliers & m.mask, n_inl, m.idx, m.mask


def _hamming_match(desc_a: np.ndarray, desc_b: np.ndarray,
                   max_distance: int, ratio: float) -> np.ndarray:
    """(M, 2) mutual Lowe-ratio matches over packed u8 descriptors.

    Runs on the TPU matcher (features.matching popcount matmul,
    match.rs:98 semantics) with bucketed shapes; the round-1 host
    np.bitwise_count version cost ~100 ms/frame and dominated the
    tracking loop (VERDICT.md weak #5).
    """
    if len(desc_a) == 0 or len(desc_b) == 0:
        return np.empty((0, 2), np.int64)
    na = _bucket(len(desc_a), 256)
    nb = _bucket(len(desc_b), 256)
    am = np.zeros(na, bool)
    am[: len(desc_a)] = True
    bm = np.zeros(nb, bool)
    bm[: len(desc_b)] = True
    res = _match_packed_jit(
        jnp.asarray(_pad_rows(desc_a, na)),
        jnp.asarray(_pad_rows(desc_b, nb)),
        jnp.asarray(am), jnp.asarray(bm),
        int(max_distance), float(ratio))
    ok = np.asarray(res.mask)[: len(desc_a)]
    idx = np.asarray(res.idx)[: len(desc_a)]
    return np.stack([np.nonzero(ok)[0], idx[ok]], 1).astype(np.int64)


class MonocularSlam:
    """Monocular SLAM/VO pipeline over a pinhole camera."""

    def __init__(self, k: np.ndarray, config: SlamConfig = SlamConfig(),
                 vocabulary: Optional[Vocabulary] = None,
                 mesh: Optional["Mesh"] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` — when given (and it
        spans >1 device), map-wide refinement runs the *distributed*
        path: keyframe-sharded observations all_to_all'd to point-owner
        shards feeding the psum'd Schur BA (parallel.ba_dist), and PGO
        over edge shards (parallel.pgo_dist). The north-star config-5
        composition (BASELINE.json; SURVEY.md §7 phase 6-7)."""
        self.k = np.asarray(k, np.float64)
        self.config = config
        self.mesh = mesh
        self.map = SlamMap()
        self.state = TrackingState.INITIALIZING
        self.results: List[FrameResult] = []
        self._orb_cfg = orb.OrbConfig(
            n_features=config.n_features, n_levels=config.n_levels)
        self._key = jax.random.PRNGKey(config.seed)
        self._init_frame: Optional[Tuple[int, np.ndarray, np.ndarray]] = None
        self._last_pose = np.asarray(
            lg.se3_identity(), np.float64).reshape(7)
        self._frame_idx = -1
        self._bow_db: Optional[BowDatabase] = (
            BowDatabase(vocabulary) if vocabulary is not None else None)
        self._last_kf_frame = -(10 ** 9)

    # ----------------------------------------------------------- frontend
    def _extract(self, gray: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        feats = orb.orb_detect_and_describe(
            jnp.asarray(gray), self._orb_cfg)
        mask = np.asarray(feats.mask)
        xy = np.asarray(feats.xy, np.float64)[mask]
        desc = _pack(np.asarray(feats.descriptors)[mask])
        return xy, desc

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------- public
    def process_frame(self, gray: np.ndarray) -> FrameResult:
        """Full pipeline entry: image in, pose out."""
        xy, desc = self._extract(gray)
        return self.process_observations(xy, desc)

    def process_observations(self, xy: np.ndarray,
                             desc: np.ndarray) -> FrameResult:
        """Frontend-bypass entry: keypoints + packed descriptors in."""
        self._frame_idx += 1
        xy = np.asarray(xy, np.float64)
        desc = np.asarray(desc, np.uint8)

        if self.state == TrackingState.INITIALIZING:
            res = self._initialize(xy, desc)
        else:
            res = self._track(xy, desc)
        self.results.append(res)
        return res

    def trajectory(self) -> np.ndarray:
        """(N_kf, 7) keyframe poses (world→camera)."""
        return np.stack([kf.pose for kf in self.map.keyframes])

    # -------------------------------------------------------------- init
    def _initialize(self, xy, desc) -> FrameResult:
        cfg = self.config
        if self._init_frame is None:
            self._init_frame = (self._frame_idx, xy, desc)
            return FrameResult(self._frame_idx, self.state,
                               None, 0, False)
        f0_idx, xy0, desc0 = self._init_frame
        m = _hamming_match(desc0, desc, cfg.match_max_distance,
                           cfg.match_ratio)
        if len(m) < cfg.min_init_matches:
            self._init_frame = (self._frame_idx, xy, desc)
            return FrameResult(self._frame_idx, self.state, None,
                               len(m), False)

        nb = _bucket(len(m), 128)
        valid = np.zeros(nb, bool)
        valid[: len(m)] = True
        x1 = jnp.asarray(_pad_rows(xy0[m[:, 0]], nb), jnp.float32)
        x2 = jnp.asarray(_pad_rows(xy[m[:, 1]], nb), jnp.float32)
        kj = jnp.asarray(self.k, jnp.float32)
        res = tv.estimate_relative_pose(self._next_key(), x1, x2, kj, kj,
                                        mask=jnp.asarray(valid))
        inl = np.asarray(res.inliers)[: len(m)] & valid[: len(m)]
        n_inl = int(res.n_inliers)
        if n_inl < cfg.min_init_inliers:
            self._init_frame = (self._frame_idx, xy, desc)
            return FrameResult(self._frame_idx, self.state, None,
                               n_inl, False)

        pts3d = np.asarray(res.points3d, np.float64)[: len(m)][inl]
        depths = pts3d[:, 2]
        pos = depths > 1e-6
        pts3d = pts3d[pos]
        mi = m[inl][pos]
        # gauge: median depth = 1
        scale = 1.0 / max(np.median(pts3d[:, 2]), 1e-9)
        pts3d = pts3d * scale

        r = np.asarray(res.rotation, np.float64)
        t = np.asarray(res.translation, np.float64) * scale
        pose0 = np.asarray(lg.se3_identity(), np.float64).reshape(7)
        q1 = np.asarray(lg.matrix_to_quat(jnp.asarray(r)), np.float64)
        pose1 = np.concatenate([q1, t])

        kf0 = self.map.add_keyframe(f0_idx, pose0, xy0, desc0)
        kf1 = self.map.add_keyframe(self._frame_idx, pose1, xy, desc)
        obs = [[(kf0.kf_id, int(i0)), (kf1.kf_id, int(i1))]
               for i0, i1 in mi]
        pids = self.map.add_points(pts3d, desc[mi[:, 1]], obs)
        for pid, (i0, i1) in zip(pids, mi):
            kf0.point_ids[i0] = pid
            kf1.point_ids[i1] = pid
        self.map.add_edge(kf0.kf_id, kf1.kf_id,
                          self._relative_pose(pose0, pose1))
        self._register_bow(kf0)
        self._register_bow(kf1)

        self._local_ba()
        self._last_pose = self.map.keyframes[-1].pose.copy()
        self._last_kf_frame = self._frame_idx
        self.state = TrackingState.TRACKING
        return FrameResult(self._frame_idx, self.state,
                           self._last_pose.copy(), len(pts3d), True)

    # ------------------------------------------------------------- track
    def _track(self, xy, desc) -> FrameResult:
        cfg = self.config
        local_ids = self.map.local_point_ids(cfg.ba_window)
        if len(local_ids) < cfg.min_track_points:
            self.state = TrackingState.LOST
            return FrameResult(self._frame_idx, self.state, None, 0, False)

        map_desc = self.map.point_desc[local_ids]
        # one fused device step: match + PnP + refine (bucketed shapes)
        na = _bucket(len(desc), 256)
        nbm = _bucket(len(map_desc), 256)
        am = np.zeros(na, bool)
        am[: len(desc)] = True
        bm = np.zeros(nbm, bool)
        bm[: len(map_desc)] = True
        pose_res, inliers_d, n_inl_d, midx_d, mmask_d = _track_step_jit(
            self._next_key(),
            jnp.asarray(_pad_rows(desc, na)), jnp.asarray(am),
            jnp.asarray(_pad_rows(xy.astype(np.float32), na)),
            jnp.asarray(_pad_rows(map_desc, nbm)), jnp.asarray(bm),
            jnp.asarray(_pad_rows(
                self.map.point_xyz[local_ids].astype(np.float32), nbm)),
            jnp.asarray(self.k, jnp.float32),
            int(cfg.match_max_distance), float(cfg.match_ratio),
            float(cfg.pnp_threshold_px))
        mmask = np.asarray(mmask_d)[: len(desc)]
        midx = np.asarray(midx_d)[: len(desc)]
        m = np.stack([np.nonzero(mmask)[0], midx[mmask]], 1).astype(
            np.int64)
        if len(m) < cfg.min_track_points:
            self.state = TrackingState.LOST
            return FrameResult(self._frame_idx, self.state, None,
                               len(m), False)
        n_inl = int(n_inl_d)
        if n_inl < cfg.min_track_points:
            self.state = TrackingState.LOST
            return FrameResult(self._frame_idx, self.state, None,
                               n_inl, False)
        r = np.asarray(pose_res.rotation, np.float64)
        t = np.asarray(pose_res.translation, np.float64)
        q = np.asarray(lg.matrix_to_quat(jnp.asarray(r)), np.float64)
        pose = np.concatenate([q, t])
        self._last_pose = pose

        inl = np.asarray(inliers_d)[: len(desc)][mmask]
        tracked_ratio = n_inl / max(len(local_ids), 1)
        is_kf = (tracked_ratio < cfg.keyframe_min_tracked_ratio
                 and self._frame_idx - self._last_kf_frame
                 >= cfg.keyframe_min_interval)
        loop_with = None
        if is_kf:
            loop_with = self._insert_keyframe(
                xy, desc, pose, m[inl], local_ids)
        return FrameResult(self._frame_idx, self.state, pose.copy(),
                           n_inl, is_kf, loop_with)

    # ---------------------------------------------------------- keyframes
    def _insert_keyframe(self, xy, desc, pose, matches,
                         local_ids) -> Optional[int]:
        cfg = self.config
        kf = self.map.add_keyframe(self._frame_idx, pose, xy, desc)
        for fi, mi_local in matches:
            pid = int(local_ids[mi_local])
            self.map.add_observation(pid, kf.kf_id, int(fi))

        prev = self.map.keyframes[kf.kf_id - 1]
        self.map.add_edge(prev.kf_id, kf.kf_id,
                          self._relative_pose(prev.pose, pose))
        self._triangulate_new(kf, prev)
        self._local_ba()
        self._last_kf_frame = self._frame_idx
        loop_with = self._try_loop_closure(kf)
        self._register_bow(kf)
        return loop_with

    def _triangulate_new(self, kf, prev) -> None:
        cfg = self.config
        un_a = np.nonzero(prev.point_ids < 0)[0]
        un_b = np.nonzero(kf.point_ids < 0)[0]
        if len(un_a) < 8 or len(un_b) < 8:
            return
        m = _hamming_match(prev.descriptors[un_a], kf.descriptors[un_b],
                           cfg.match_max_distance, cfg.match_ratio)
        if len(m) == 0:
            return
        ia = un_a[m[:, 0]]
        ib = un_b[m[:, 1]]
        pa = jnp.asarray(lg.se3_to_matrix(
            jnp.asarray(prev.pose, jnp.float32)))[:3]
        pb = jnp.asarray(lg.se3_to_matrix(
            jnp.asarray(kf.pose, jnp.float32)))[:3]
        kj = jnp.asarray(self.k, jnp.float32)
        p1 = kj @ pa
        p2 = kj @ pb
        pts = np.asarray(tri.triangulate_dlt(
            p1, p2, jnp.asarray(prev.xy[ia], jnp.float32),
            jnp.asarray(kf.xy[ib], jnp.float32)), np.float64)
        # cheirality in both views + reprojection gate
        ok = np.ones(len(pts), bool)
        for pose_, px_ in ((prev.pose, prev.xy[ia]), (kf.pose, kf.xy[ib])):
            cam = np.asarray(lg.se3_apply(
                jnp.asarray(pose_, jnp.float32)[None],
                jnp.asarray(pts, jnp.float32)), np.float64)
            ok &= cam[:, 2] > 1e-3
            uv = cam[:, :2] / np.maximum(cam[:, 2:], 1e-9)
            uv = uv * [self.k[0, 0], self.k[1, 1]] + [self.k[0, 2],
                                                      self.k[1, 2]]
            ok &= np.linalg.norm(uv - px_, axis=1) < 2 * cfg.pnp_threshold_px
        if not ok.any():
            return
        obs = [[(prev.kf_id, int(a)), (kf.kf_id, int(b))]
               for a, b in zip(ia[ok], ib[ok])]
        pids = self.map.add_points(pts[ok], kf.descriptors[ib[ok]], obs)
        for pid, a, b in zip(pids, ia[ok], ib[ok]):
            prev.point_ids[a] = pid
            kf.point_ids[b] = pid

    # ---------------------------------------------------------------- BA
    def _local_ba(self) -> None:
        cfg = self.config
        kf_ids = [kf.kf_id for kf in self.map.keyframes[-cfg.ba_window:]]
        self._bundle_adjust(kf_ids, cfg.ba_iterations, distributed=False)

    def global_ba(self, iterations: Optional[int] = None,
                  distributed: Optional[bool] = None) -> bool:
        """Full-map BA over the ENTIRE keyframe graph (reference
        capability ba.rs:646 bundle_adjust; VERDICT.md round-2 item 2).
        Beyond ~400 poses the auto solver switches from dense Cholesky
        to the block-Jacobi PCG reduced-system solve — the regime this
        method exists for. With a mesh (and ``distributed`` not False)
        it runs the keyframe-sharded exchange → psum'd-Schur program
        (parallel.ba_dist.bundle_adjust_schur_dist_kf).

        Returns True if an update was applied."""
        if iterations is None:
            iterations = self.config.global_ba_iterations
        if distributed is None:
            distributed = (self.mesh is not None
                           and self.mesh.devices.size > 1)
        kf_ids = [kf.kf_id for kf in self.map.keyframes]
        return self._bundle_adjust(kf_ids, iterations,
                                   distributed=distributed)

    def _bundle_adjust(self, kf_ids, iterations: int,
                       distributed: bool) -> bool:
        cams, pts_local, uvs, used = self.map.observations_for_ba(kf_ids)
        if len(used) < 8 or len(uvs) < 16:
            return False
        poses = np.stack([self.map.keyframes[i].pose for i in kf_ids])
        fixed = np.zeros(len(kf_ids), bool)
        fixed[0] = True
        if len(kf_ids) > 1 and kf_ids[0] == 0:
            fixed[min(1, len(kf_ids) - 1)] = True  # lock monocular scale

        # bucket shapes: dummy point absorbs padded zero-weight obs
        n_used = len(used)
        np_b = _bucket(n_used + 1, 64)
        m_b = _bucket(len(uvs), 256)
        pts_arr = _pad_rows(
            self.map.point_xyz[used].astype(np.float32), np_b, 1.0)
        fixed_pts = np.zeros(np_b, bool)
        fixed_pts[n_used:] = True
        obs_w = np.zeros(m_b, np.float32)
        obs_w[: len(uvs)] = 1.0
        cams_b = _pad_rows(cams, m_b)
        pts_local_b = _pad_rows(pts_local, m_b, n_used)  # → dummy point
        uvs_b = _pad_rows(uvs.astype(np.float32), m_b)
        counts = np.bincount(pts_local, minlength=np_b)
        k_b = _bucket(max(int(counts.max()), 1), 4)

        problem = ba_mod.build_problem(
            poses.astype(np.float32), pts_arr,
            self.k.astype(np.float32), cams_b, pts_local_b, uvs_b,
            obs_w=obs_w, fixed_poses=fixed, fixed_points=fixed_pts,
            max_obs_per_point=k_b)
        params = ba_mod.BAParams(max_iterations=iterations,
                                 loss="huber", loss_scale=2.0)
        if distributed and self.mesh is not None:
            from kornia_tpu.parallel import ba_dist

            sharded = ba_dist.shard_problem_by_keyframe(
                problem, self.mesh.devices.size)
            result = ba_dist.bundle_adjust_schur_dist_kf(
                sharded, self.mesh, params)
        else:
            result = ba_mod.bundle_adjust_schur(problem, params)
        new_poses = np.asarray(result.poses, np.float64)
        new_points = np.asarray(result.points, np.float64)[:n_used]
        if not (np.isfinite(new_poses).all()
                and np.isfinite(new_points).all()):
            return False
        for i, kf_id in enumerate(kf_ids):
            self.map.keyframes[kf_id].pose = new_poses[i]
        self.map.point_xyz[used] = new_points
        if self.map.keyframes:
            self._last_pose = self.map.keyframes[-1].pose.copy()
        return True

    # -------------------------------------------------------- loop closure
    def _register_bow(self, kf) -> None:
        if self._bow_db is not None:
            self._bow_db.add(kf.descriptors)

    def _try_loop_closure(self, kf) -> Optional[int]:
        cfg = self.config
        if self._bow_db is None or len(self._bow_db) < cfg.loop_min_kf_gap:
            return None
        res = self._bow_db.query(kf.descriptors, top_k=3)
        for r in res:
            if kf.kf_id - r.entry_id < cfg.loop_min_kf_gap:
                continue
            if r.score < cfg.loop_min_score:
                continue
            old = self.map.keyframes[r.entry_id]
            m = _hamming_match(old.descriptors, kf.descriptors,
                               cfg.match_max_distance, cfg.match_ratio)
            if len(m) < cfg.loop_min_matches:
                continue
            # geometric verification: PnP of old KF's 3D points into the
            # new frame
            has_pt = old.point_ids[m[:, 0]] >= 0
            if has_pt.sum() < cfg.loop_min_matches // 2:
                continue
            mm = m[has_pt]
            world = self.map.point_xyz[old.point_ids[mm[:, 0]]]
            pix = kf.xy[mm[:, 1]]
            nb = _bucket(len(mm), 128)
            valid = np.zeros(nb, bool)
            valid[: len(mm)] = True
            pose_res, inliers, n_inl = pnp_mod.solve_pnp_ransac(
                self._next_key(),
                jnp.asarray(_pad_rows(world, nb), jnp.float32),
                jnp.asarray(_pad_rows(pix, nb), jnp.float32),
                jnp.asarray(self.k, jnp.float32),
                threshold_px=cfg.pnp_threshold_px,
                mask=jnp.asarray(valid))
            if int(n_inl) < cfg.loop_min_matches // 2:
                continue
            r_ = np.asarray(pose_res.rotation, np.float64)
            t_ = np.asarray(pose_res.translation, np.float64)
            q_ = np.asarray(lg.matrix_to_quat(jnp.asarray(r_)), np.float64)
            corrected = np.concatenate([q_, t_])
            rel = self._relative_pose(old.pose, corrected)
            self.map.add_edge(old.kf_id, kf.kf_id, rel, weight=5.0)
            # fuse the loop into the OBSERVATION graph too: each PnP
            # inlier says "this new-frame feature observes that old map
            # point" — without these, global BA would see no loop
            # constraint at all (only the pose-graph edge PGO uses) and
            # could flex the trajectory back toward its drifted shape.
            inl_m = np.asarray(inliers)[: len(mm)]
            for (fi_old, fi_new), ok in zip(mm, inl_m):
                old_pid = int(old.point_ids[fi_old])
                if not ok or old_pid < 0:
                    continue
                cur = int(kf.point_ids[fi_new])
                if cur < 0:
                    self.map.add_observation(old_pid, kf.kf_id,
                                             int(fi_new))
                elif cur != old_pid:
                    # duplicate map point created during the drifted
                    # revisit — merge it into the older point
                    self._merge_points(old_pid, cur)
            self._run_pgo()
            # PGO + the rigid point-drag only re-hang the map on the
            # corrected skeleton; full-map BA then jointly refines every
            # pose AND point over the whole keyframe graph (reference
            # ba.rs:646 capability; VERDICT.md round-2 item 2).
            if cfg.global_ba_on_loop:
                self.global_ba()
            return old.kf_id
        return None

    def _run_pgo(self) -> None:
        kfs = self.map.keyframes
        old_poses = np.stack([kf.pose for kf in kfs])
        # bucketed shapes: identity-padded fixed poses, weight-0 edges
        p_b = _bucket(len(kfs), 8)
        e_b = _bucket(len(self.map.edges), 32)
        poses_pad = np.tile(
            np.array([1.0, 0, 0, 0, 0, 0, 0]), (p_b, 1))
        poses_pad[: len(kfs)] = old_poses
        fixed = np.ones(p_b, bool)
        fixed[1: len(kfs)] = False
        ei = _pad_rows(np.asarray([e[0] for e in self.map.edges],
                                  np.int32), e_b)
        ej = _pad_rows(np.asarray([e[1] for e in self.map.edges],
                                  np.int32), e_b)
        meas = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (e_b, 1))
        meas[: len(self.map.edges)] = np.stack(
            [e[2] for e in self.map.edges])
        w = np.zeros(e_b, np.float32)
        w[: len(self.map.edges)] = [e[3] for e in self.map.edges]
        params = pgo_mod.PGOParams(max_iterations=15)
        if self.mesh is not None and self.mesh.devices.size > 1:
            from kornia_tpu.parallel import pgo_dist

            sharded = pgo_dist.shard_pgo(
                poses_pad.astype(np.float32), ei, ej, meas, w,
                fixed=fixed, n_devices=self.mesh.devices.size)
            result = pgo_dist.pose_graph_optimize_dist(
                sharded, self.mesh, params)
        else:
            result = pgo_mod.pose_graph_optimize(
                jnp.asarray(poses_pad, jnp.float32), ei, ej,
                jnp.asarray(meas, jnp.float32), jnp.asarray(w),
                fixed=jnp.asarray(fixed), params=params)
        new_poses = np.asarray(result.poses, np.float64)[: len(kfs)]
        if not np.isfinite(new_poses).all():
            return
        for i, kf in enumerate(kfs):
            kf.pose = new_poses[i]
        self._last_pose = kfs[-1].pose.copy()
        # drag map points along with their reference keyframe correction
        ref_kf = np.full(self.map.n_points, -1, np.int64)
        for pid in range(self.map.n_points):
            if self.map.point_obs[pid]:
                ref_kf[pid] = self.map.point_obs[pid][0][0]
        for kf_id in np.unique(ref_kf[ref_kf >= 0]):
            sel = ref_kf == kf_id
            t_old = jnp.asarray(old_poses[kf_id], jnp.float32)
            t_new = jnp.asarray(new_poses[kf_id], jnp.float32)
            corr = lg.se3_compose(lg.se3_inverse(t_new), t_old)
            moved = lg.se3_apply(
                corr[None], jnp.asarray(self.map.point_xyz[sel],
                                        jnp.float32))
            self.map.point_xyz[sel] = np.asarray(moved, np.float64)

    # ------------------------------------------------------------ helpers
    def _merge_points(self, keep: int, dup: int) -> None:
        """Fuse map point ``dup`` into ``keep`` (loop-closure duplicate):
        re-point every observation and keyframe slot, invalidate dup."""
        for kf_id, fi in self.map.point_obs[dup]:
            self.map.keyframes[kf_id].point_ids[fi] = keep
            self.map.point_obs[keep].append((kf_id, fi))
        self.map.point_obs[dup] = []
        self.map.point_valid[dup] = False

    @staticmethod
    def _relative_pose(pose_i: np.ndarray, pose_j: np.ndarray) -> np.ndarray:
        """rel with pose_j = rel ∘ pose_i (both world→camera)."""
        a = jnp.asarray(pose_i, jnp.float32)
        b = jnp.asarray(pose_j, jnp.float32)
        return np.asarray(lg.se3_compose(b, lg.se3_inverse(a)), np.float64)
