"""Distributed Schur-complement bundle adjustment
(the north-star component — BASELINE.json: "BA solved by Schur-complement
reduction of the camera system over jax.lax collectives (psum of reduced
camera blocks ...)"; no reference code exists, only the single-host math
in kornia-3d/src/ba_schur.rs — see SURVEY.md §3.4 / §5.7).

Design:
  * **Sharding**: points are partitioned contiguously across the mesh's
    "obs" axis. Observations can enter in either layout:
      - *point-co-located* (`shard_problem`): each observation already
        lives on the shard owning its point — zero exchange;
      - *keyframe-sharded* (`shard_problem_by_keyframe`): each
        observation starts on the shard that produced it (its keyframe's
        owner — the natural front-end layout), and the BA program itself
        runs the ragged exchange (parallel.exchange: one packed
        all_to_all, or skew-proof ppermute rounds) to move every
        observation to its point's owner before reduction. This is the
        north-star dataflow: sharded front-end → observation exchange →
        psum'd Schur.
    Poses and intrinsics are replicated (6P is small).
  * **Tiled segment engine on BOTH layouts**: the exchange's receive
    order is deterministic (static plan), so `shard_problem_by_keyframe`
    pre-computes a per-shard sort-by-point permutation and builds the
    one-hot MXU segment engine (optim/ba.py round-2c) on the
    post-exchange ordering. In-program the permutation is ONE static-
    shape row gather per solve (amortized over all LM iterations); every
    per-CG-step segmented reduction then runs at MXU rate instead of the
    scalar-rate scatter wall.
  * **Per LM iteration** (collective budget, recorded in PERF_NOTES):
    each device accumulates its partial pose blocks U, g_p, the Schur
    rhs, and — when it fits (`_S_MAT_BYTES`/`_BC_MAT_BYTES`) — its
    partial *materialized* reduced camera system S_local, all packed
    into ONE flat `psum`; the solve (dense Cholesky for small P,
    replicated block-PCG on the materialized S otherwise) is then
    entirely collective-free; a second scalar `psum` evaluates the
    accept/reject cost. **2 collectives per LM iteration.** Only at true
    pod scale, where S cannot materialize, does the matrix-free PCG path
    pay one psum per CG step.
  * **RGB-D depth** (reference BaObservation depth, ba.rs:41,83) and
    **pose priors** (BaPosePrior, ba.rs:107 / ba_schur.rs:385) ride both
    layouts: depth rows travel inside the packed exchange payload;
    priors touch only replicated pose state, so every shard adds the
    identical prior blocks AFTER the psum (zero extra collectives).
  * The LM loop (`lax.scan`) lives *inside* `shard_map`, so the whole
    optimization is one compiled SPMD program.

Host-side `shard_problem*` does the static partitioning/padding
(topology is static, as in optim/ba.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import inv3x3, solve_unrolled
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim import ba as ba_mod
from kornia_tpu.optim.ba import BAParams, BAResult
from kornia_tpu.optim.losses import LOSSES
from kornia_tpu.parallel.mesh import OBS_AXIS
from kornia_tpu.parallel import exchange as ex_mod

_HI = jax.lax.Precision.HIGHEST

# materialization budgets (bytes, f32): the reduced camera system
# S (P, P, 6, 6) and the per-(point, cam) coupling aggregate
# Bc (Nl, P, 6, 3). Below these, every CG iteration is collective-free
# (replicated solve on the psum'd dense S); above, fall back to the
# matrix-free PCG whose matvec psums a (P, 6) block per step.
_S_MAT_BYTES = 1 << 30
_BC_MAT_BYTES = 1 << 30


class ShardedBAProblem(NamedTuple):
    """Point-co-located sharded BA problem (leading axis = shards)."""

    poses: jax.Array          # (P, 7) replicated
    points: jax.Array         # (D, Nl, 3) sharded
    k: jax.Array              # (3, 3) replicated
    obs_cam: jax.Array        # (D, Ml) int32 global pose ids
    obs_pt: jax.Array         # (D, Ml) int32 LOCAL point ids
    obs_uv: jax.Array         # (D, Ml, 2)
    obs_w: jax.Array          # (D, Ml) 0 = padding
    fixed_poses: jax.Array    # (P,) replicated
    fixed_points: jax.Array   # (D, Nl)
    n_points: int             # true (unpadded) point count
    # per-shard tiled segment engine (optim/ba.py engine, sharded):
    # on real chips the per-device segmented reductions hit the same
    # scalar-rate scatter wall as single-host BA; each shard's
    # observations stay point-sorted, so the same one-hot MXU
    # formulation applies locally.
    seg_oh: Optional[jax.Array] = None    # (D, tiles, T, S) f32
    seg_ids: Optional[jax.Array] = None   # (D, tiles * S) int32
    cam_oh: Optional[jax.Array] = None    # (D, P, Ml) f32
    # RGB-D depth channel (reference BaObservation depth, ba.rs:41,83)
    obs_depth: Optional[jax.Array] = None    # (D, Ml)
    obs_depth_w: Optional[jax.Array] = None  # (D, Ml)
    # pose priors (replicated; reference BaPosePrior ba.rs:107)
    prior_center: Optional[jax.Array] = None  # (P, 3)
    prior_invs: Optional[jax.Array] = None    # (P,)


class KeyframeShardedBA(NamedTuple):
    """Keyframe-sharded BA problem: observations live on their
    *producer* shard (keyframe owner), packed into the exchange payload
    for the in-program routing to their point's owner shard. Carries the
    static post-exchange sort permutation + the tiled segment engine
    built on that ordering (see module docstring)."""

    poses: jax.Array          # (P, 7) replicated
    points: jax.Array         # (D, Nl, 3) sharded (contiguous ranges)
    k: jax.Array              # (3, 3) replicated
    # packed send payload: (D, D, B, C) [a2a] or tuple of (D, B_r, C)
    # [ppermute rounds]; columns per parallel.exchange
    payload: Union[jax.Array, Tuple[jax.Array, ...]]
    mode: str                 # "a2a" | "rounds"  (static)
    rounds: Tuple[int, ...]   # active offsets (rounds mode)
    perm: jax.Array           # (D, Lp) int32 — sort-by-point permutation
    fixed_poses: jax.Array    # (P,)
    fixed_points: jax.Array   # (D, Nl)
    n_points: int
    recv_len: int             # L rows received per shard (pre-pad)
    pad: int                  # rows appended in-program to reach Lp
    has_depth: bool = False
    seg_oh: Optional[jax.Array] = None    # (D, tiles, T, S) f32
    seg_ids: Optional[jax.Array] = None   # (D, tiles * S) int32
    cam_oh: Optional[jax.Array] = None    # (D, P, Lp) f32
    prior_center: Optional[jax.Array] = None  # (P, 3)
    prior_invs: Optional[jax.Array] = None    # (P,)


def _build_shard_engine(o_pt: np.ndarray, o_cam: np.ndarray, nl: int,
                        n_poses: int):
    """Per-shard tiled segment engine + camera one-hot from host-known
    (point-sorted, tile-padded) per-shard observation ids.

    o_pt/o_cam: (D, Ml) with Ml a _SEG_T multiple. Returns jnp arrays
    (seg_oh (D, tiles, T, S), seg_ids (D, tiles·S), cam_oh (D, P, Ml))
    with None where disabled / over budget."""
    seg_t, seg_s = ba_mod._SEG_T, ba_mod._SEG_S
    n_devices, ml = o_pt.shape
    seg_oh = seg_ids = cam_oh = None
    if not ba_mod._engine_enabled():
        return None, None, None
    tiles = o_pt.reshape(n_devices, -1, seg_t)
    base = tiles.min(axis=2)
    span = tiles.max(axis=2) - base + 1
    if span.max() <= seg_s:
        n_tiles = tiles.shape[1]
        local = tiles - base[..., None]
        oh = np.zeros((n_devices, n_tiles, seg_t, seg_s), np.float32)
        di = np.repeat(np.arange(n_devices), n_tiles * seg_t)
        ti = np.tile(np.repeat(np.arange(n_tiles), seg_t), n_devices)
        oi = np.tile(np.arange(seg_t), n_devices * n_tiles)
        oh[di, ti, oi, local.reshape(-1)] = 1.0
        ids = base[..., None] + np.arange(seg_s)[None, None, :]
        seg_oh = jnp.asarray(oh)
        seg_ids = jnp.asarray(
            np.clip(ids, 0, nl - 1).reshape(n_devices, -1).astype(np.int32))
    if n_poses * ml * 4 <= ba_mod._CAM_OH_BYTES:
        coh = np.zeros((n_devices, n_poses, ml), np.float32)
        coh[np.repeat(np.arange(n_devices), ml).reshape(n_devices, ml),
            o_cam, np.tile(np.arange(ml), n_devices).reshape(n_devices, ml)
            ] = 1.0
        cam_oh = jnp.asarray(coh)
    return seg_oh, seg_ids, cam_oh


def shard_problem(problem: ba_mod.BAProblem, n_devices: int) -> ShardedBAProblem:
    """Partition a BAProblem: contiguous point ranges per device, each
    observation co-located with its point, everything padded to equal
    per-shard sizes."""
    obs_pt = np.asarray(problem.obs_pt)
    obs_cam = np.asarray(problem.obs_cam)
    obs_uv = np.asarray(problem.obs_uv)
    obs_w = np.asarray(problem.obs_w)
    points = np.asarray(problem.points)
    fixed_points = np.asarray(problem.fixed_points)
    n = points.shape[0]
    has_depth = problem.obs_depth is not None
    obs_depth = (np.asarray(problem.obs_depth) if has_depth else None)
    obs_depth_w = (np.asarray(problem.obs_depth_w) if has_depth else None)

    nl = -(-n // n_devices)  # points per shard (padded)
    n_pad = nl * n_devices
    pts_pad = np.zeros((n_pad, 3), np.float32)
    pts_pad[:n] = points
    fixed_pad = np.ones(n_pad, bool)  # padding points are "fixed"
    fixed_pad[:n] = fixed_points

    # assign each observation to the shard owning its point
    shard_of_obs = obs_pt // nl
    ml = max(int(np.bincount(shard_of_obs, minlength=n_devices).max()), 1)
    ml += -ml % ba_mod._SEG_T   # tile multiple for the segment engine

    o_cam = np.zeros((n_devices, ml), np.int32)
    # padding slots carry the shard's LAST local point id (not 0) so
    # per-shard observations stay sorted by point — the tiled segment
    # engine requires tile-local point windows; padding weight is 0 so
    # the entries contribute exactly nothing
    o_pt = np.full((n_devices, ml), nl - 1, np.int32)
    o_uv = np.zeros((n_devices, ml, 2), np.float32)
    o_w = np.zeros((n_devices, ml), np.float32)
    o_depth = np.zeros((n_devices, ml), np.float32) if has_depth else None
    o_depth_w = np.zeros((n_devices, ml), np.float32) if has_depth else None
    fill = np.zeros(n_devices, np.int32)
    for i in range(obs_pt.shape[0]):
        d = shard_of_obs[i]
        s = fill[d]
        o_cam[d, s] = obs_cam[i]
        o_pt[d, s] = obs_pt[i] - d * nl  # local id
        o_uv[d, s] = obs_uv[i]
        o_w[d, s] = obs_w[i]
        if has_depth:
            o_depth[d, s] = obs_depth[i]
            o_depth_w[d, s] = obs_depth_w[i]
        fill[d] += 1

    n_poses = np.asarray(problem.poses).shape[0]
    seg_oh, seg_ids, cam_oh = _build_shard_engine(o_pt, o_cam, nl, n_poses)

    return ShardedBAProblem(
        poses=problem.poses,
        points=jnp.asarray(pts_pad.reshape(n_devices, nl, 3)),
        k=problem.k,
        obs_cam=jnp.asarray(o_cam),
        obs_pt=jnp.asarray(o_pt),
        obs_uv=jnp.asarray(o_uv),
        obs_w=jnp.asarray(o_w),
        fixed_poses=problem.fixed_poses,
        fixed_points=jnp.asarray(fixed_pad.reshape(n_devices, nl)),
        n_points=n,
        seg_oh=seg_oh,
        seg_ids=seg_ids,
        cam_oh=cam_oh,
        obs_depth=None if not has_depth else jnp.asarray(o_depth),
        obs_depth_w=None if not has_depth else jnp.asarray(o_depth_w),
        prior_center=problem.prior_center,
        prior_invs=problem.prior_invs,
    )


def shard_problem_by_keyframe(
    problem: ba_mod.BAProblem, n_devices: int,
    cam_shard: Optional[np.ndarray] = None,
) -> KeyframeShardedBA:
    """Partition a BAProblem the way a sharded *front-end* produces it:
    each observation sits on the shard owning its keyframe (camera); the
    BA program exchanges them to their point-owner shards in-flight,
    then applies the pre-computed sort-by-point permutation so the tiled
    segment engine (built host-side on the deterministic post-exchange
    ordering) applies.

    ``cam_shard``: (P,) shard owner per camera; default = contiguous
    blocks of ceil(P / D) cameras. Point ownership is contiguous ranges
    of ceil(N / D), matching :func:`shard_problem`.
    """
    obs_pt = np.asarray(problem.obs_pt)
    obs_cam = np.asarray(problem.obs_cam)
    obs_uv = np.asarray(problem.obs_uv)
    obs_w = np.asarray(problem.obs_w)
    points = np.asarray(problem.points)
    fixed_points = np.asarray(problem.fixed_points)
    n = points.shape[0]
    p = np.asarray(problem.poses).shape[0]
    has_depth = problem.obs_depth is not None
    obs_depth = np.asarray(problem.obs_depth) if has_depth else None
    obs_depth_w = np.asarray(problem.obs_depth_w) if has_depth else None

    # drop build_problem's zero-weight padding rows — no point shipping
    # them through the interconnect
    real = obs_w != 0.0
    obs_pt, obs_cam = obs_pt[real], obs_cam[real]
    obs_uv, obs_w = obs_uv[real], obs_w[real]
    if has_depth:
        obs_depth, obs_depth_w = obs_depth[real], obs_depth_w[real]

    if cam_shard is None:
        per = -(-p // n_devices)
        cam_shard = np.minimum(np.arange(p) // per, n_devices - 1)
    cam_shard = np.asarray(cam_shard, np.int64)

    nl = -(-n // n_devices)
    n_pad = nl * n_devices
    pts_pad = np.zeros((n_pad, 3), np.float32)
    pts_pad[:n] = points
    fixed_pad = np.ones(n_pad, bool)
    fixed_pad[:n] = fixed_points

    plan = ex_mod.build_exchange_plan(
        obs_src_shard=cam_shard[obs_cam], obs_cam=obs_cam, obs_pt=obs_pt,
        obs_uv=obs_uv, n_devices=n_devices, points_per_shard=nl,
        obs_w=obs_w,
        obs_depth=obs_depth if has_depth else None,
        obs_depth_w=obs_depth_w if has_depth else None)

    # the receive order is deterministic → pre-compute, per dest shard,
    # the stable sort-by-point permutation (padding rows carry point id
    # nl−1, so they sort to the tail of that point's run) over the
    # tile-padded length, and build the segment engine on that ordering
    lp = plan.recv_len + (-plan.recv_len % ba_mod._SEG_T)
    pad = lp - plan.recv_len
    perm = np.zeros((n_devices, lp), np.int64)
    sorted_pt = np.zeros((n_devices, lp), np.int32)
    sorted_cam = np.zeros((n_devices, lp), np.int32)
    for dd in range(n_devices):
        recv = ex_mod.host_receive_order(plan, dd, n_devices)
        pt_col = np.full(lp, nl - 1, np.int32)
        cam_col = np.zeros(lp, np.int32)
        pt_col[:plan.recv_len] = recv[:, 1].astype(np.int32)
        cam_col[:plan.recv_len] = recv[:, 0].astype(np.int32)
        order = np.argsort(pt_col, kind="stable")
        perm[dd] = order
        sorted_pt[dd] = pt_col[order]
        sorted_cam[dd] = cam_col[order]
    seg_oh, seg_ids, cam_oh = _build_shard_engine(sorted_pt, sorted_cam,
                                                  nl, p)

    return KeyframeShardedBA(
        poses=problem.poses,
        points=jnp.asarray(pts_pad.reshape(n_devices, nl, 3)),
        k=problem.k,
        payload=plan.payload,
        mode=plan.mode,
        rounds=plan.rounds,
        perm=jnp.asarray(perm.astype(np.int32)),
        fixed_poses=problem.fixed_poses,
        fixed_points=jnp.asarray(fixed_pad.reshape(n_devices, nl)),
        n_points=n,
        recv_len=plan.recv_len,
        pad=pad,
        has_depth=has_depth,
        seg_oh=seg_oh,
        seg_ids=seg_ids,
        cam_oh=cam_oh,
        prior_center=problem.prior_center,
        prior_invs=problem.prior_invs,
    )


def _psum_packed(arrs, axis):
    """ONE collective for a list of arrays: flatten, concat, psum,
    unpack. (XLA can combine adjacent all-reduces, but packing makes the
    1-collective contract explicit and shape-independent.)"""
    flat = jnp.concatenate([a.reshape(-1) for a in arrs])
    out = jax.lax.psum(flat, axis)
    res = []
    off = 0
    for a in arrs:
        res.append(out[off:off + a.size].reshape(a.shape))
        off += a.size
    return res


def _local_cost(poses, points_l, k, obs_cam, obs_pt, obs_uv, obs_w, params,
                seg_oh=None, seg_ids=None, cam_oh=None,
                obs_depth=None, obs_depth_w=None):
    r, _, _ = ba_mod._project_with_jacobians(
        poses, points_l, k, obs_cam, obs_pt, obs_uv,
        obs_depth, obs_depth_w,
        seg_oh=seg_oh, seg_ids=seg_ids, cam_oh=cam_oh)
    sq = jnp.sum(r * r, axis=-1)
    w = LOSSES[params.loss](sq, params.loss_scale)
    return 0.5 * jnp.sum(obs_w * w * sq)


def _cg_on_dense_blocks(s_blocks, u_damped, rhs, free, iters):
    """Replicated PCG on the materialized reduced camera system
    (s_blocks (P, P, 6, 6), gauge-fixed) — zero collectives per step;
    block-Jacobi preconditioner from the damped U diagonal."""
    p = rhs.shape[0]
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (p, 6, 6))
    m_blocks = jnp.where(free[:, None, None] > 0, u_damped, eye6)
    minv = solve_unrolled(m_blocks, eye6)

    def matvec(v):
        return jnp.einsum("pqij,qj->pi", s_blocks, v, precision=_HI)

    def apply_minv(r_):
        return jnp.einsum("pij,pj->pi", minv, r_, precision=_HI)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = apply_minv(r0)
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r_, pk, rz = carry
        ap = matvec(pk)
        denom = jnp.sum(pk * ap)
        alive = (rz > 1e-20) & (denom > 1e-20)
        alpha = jnp.where(alive, rz / jnp.maximum(denom, 1e-20), 0.0)
        x = x + alpha * pk
        r_ = r_ - alpha * ap
        z = apply_minv(r_)
        rz_new = jnp.sum(r_ * z)
        beta = jnp.where(alive, rz_new / jnp.maximum(rz, 1e-20), 0.0)
        return (x, r_, z + beta * pk, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, rz0), None,
                                   length=iters)
    return x


def _lm_schur_loop(poses, points_l, k, obs_cam, obs_pt, obs_uv, obs_w,
                   fixed_poses, fixed_points_l, params: BAParams,
                   axis: str, seg_oh_l=None, seg_ids_l=None, cam_oh_l=None,
                   obs_depth=None, obs_depth_w=None,
                   prior_center=None, prior_invs=None):
    """The shared per-shard LM-Schur loop. Runs INSIDE ``shard_map``:
    ``points_l``/``obs_*``/``fixed_points_l`` are this shard's blocks,
    poses/k/fixed_poses/priors are replicated. Returns
    (poses_f, points_f, c0, cost_f)."""
    p = poses.shape[0]
    nl = points_l.shape[0]
    free = (~fixed_poses).astype(jnp.float32)
    # a point participates iff it receives weighted observations
    has_obs = ba_mod._seg_sum_pt(
        obs_w[:, None], obs_pt, nl, seg_oh_l, seg_ids_l)[:, 0] > 0.0
    active = (~fixed_points_l) & has_obs
    has_prior = prior_center is not None

    # static solver pick (shapes are static at trace time)
    s_fits = p * p * 36 * 4 <= _S_MAT_BYTES
    bc_fits = nl * p * 18 * 4 <= _BC_MAT_BYTES
    if params.solver == "dense" or (params.solver == "auto" and p <= 400):
        mode = "chol"
    elif s_fits and bc_fits:
        mode = "cg_dense"        # materialized S, collective-free CG
    else:
        mode = "cg_matfree"      # pod scale: one psum per CG step

    def total_cost(ps, pts_l):
        local = _local_cost(ps, pts_l, k, obs_cam, obs_pt, obs_uv,
                            obs_w, params, seg_oh_l, seg_ids_l, cam_oh_l,
                            obs_depth, obs_depth_w)
        cost = jax.lax.psum(local, axis)
        if has_prior:
            # priors depend only on replicated pose state: every shard
            # adds the identical term AFTER the psum (no collective)
            _, _, pc = ba_mod.prior_terms(
                ps, prior_center, prior_invs, fixed_poses,
                params.loss, params.loss_scale)
            cost = cost + pc
        return cost

    eye3 = jnp.eye(3, dtype=jnp.float32)
    eye6 = jnp.eye(6, dtype=jnp.float32)

    def step(carry, _):
        poses_c, points_c, lam, cost = carry
        r, j_pose, j_pt = ba_mod._project_with_jacobians(
            poses_c, points_c, k, obs_cam, obs_pt, obs_uv,
            obs_depth, obs_depth_w,
            seg_oh=seg_oh_l, seg_ids=seg_ids_l, cam_oh=cam_oh_l,
        )
        sq = jnp.sum(r * r, axis=-1)
        w = obs_w * LOSSES[params.loss](sq, params.loss_scale)
        wj_pose = j_pose * w[:, None, None]
        wj_pt = j_pt * w[:, None, None]

        u_b = jnp.einsum("mki,mkj->mij", wj_pose, j_pose, precision=_HI)
        v_b = jnp.einsum("mki,mkj->mij", wj_pt, j_pt, precision=_HI)
        b_b = jnp.einsum("mki,mkj->mij", wj_pose, j_pt, precision=_HI)
        gp_t = -jnp.einsum("mki,mk->mi", wj_pose, r, precision=_HI)
        gx_t = -jnp.einsum("mki,mk->mi", wj_pt, r, precision=_HI)

        u_partial = ba_mod._seg_sum_cam(u_b, obs_cam, p, cam_oh_l)
        gp_partial = ba_mod._seg_sum_cam(gp_t, obs_cam, p, cam_oh_l)
        # point blocks are fully local (obs arrive co-located w/ points)
        V = ba_mod._seg_sum_pt(v_b, obs_pt, nl, seg_oh_l, seg_ids_l)
        g_x = ba_mod._seg_sum_pt(gx_t, obs_pt, nl, seg_oh_l, seg_ids_l)

        v_damped = V + (lam * jnp.maximum(
            jnp.diagonal(V, axis1=-2, axis2=-1), 1e-9))[..., None, :] * eye3
        v_inv = jnp.where(
            active[:, None, None],
            inv3x3(v_damped + (~active)[:, None, None] * eye3),
            0.0,
        )
        y_b = jnp.einsum(
            "mij,mjk->mik", b_b,
            ba_mod._expand_pt(v_inv, obs_pt, seg_oh_l, seg_ids_l),
            precision=_HI)
        rhs_terms = jnp.einsum(
            "mij,mj->mi", y_b,
            ba_mod._expand_pt(g_x, obs_pt, seg_oh_l, seg_ids_l),
            precision=_HI)
        rhs_partial = ba_mod._seg_sum_cam(rhs_terms, obs_cam, p, cam_oh_l)

        # ---- the ONE packed collective of the iteration -------------
        if mode in ("chol", "cg_dense"):
            m = b_b.shape[0]
            pair_key = obs_pt.astype(jnp.int32) * p + obs_cam
            bc = jax.ops.segment_sum(
                b_b.reshape(m, 18), pair_key, num_segments=nl * p
            ).reshape(nl, p, 6, 3)
            yc = jnp.einsum("npis,nst->npit", bc, v_inv, precision=_HI)
            s_local = jnp.einsum("npis,nqjs->pqij", yc, bc, precision=_HI)
            U, g_p, rhs_part, s_sum = _psum_packed(
                [u_partial, gp_partial, rhs_partial, s_local], axis)
        else:
            U, g_p, rhs_part = _psum_packed(
                [u_partial, gp_partial, rhs_partial], axis)
            s_sum = None
        if has_prior:
            du, dg, _ = ba_mod.prior_terms(
                poses_c, prior_center, prior_invs, fixed_poses,
                params.loss, params.loss_scale)
            U = U + du
            g_p = g_p + dg
        rhs_p = g_p - rhs_part

        u_damped = U + (lam * jnp.maximum(
            jnp.diagonal(U, axis1=-2, axis2=-1),
            1e-9))[..., None, :] * eye6

        if mode in ("chol", "cg_dense"):
            s = -s_sum
            s = s.at[jnp.arange(p), jnp.arange(p)].add(u_damped)
            # gauge fixing: fixed poses → identity rows/cols, zero rhs
            s = s * free[:, None, None, None] * free[None, :, None, None]
            s = s.at[jnp.arange(p), jnp.arange(p)].add(
                (1.0 - free)[:, None, None] * eye6)
            rhs = rhs_p * free[:, None]
            if mode == "chol":
                s_dense = s.transpose(0, 2, 1, 3).reshape(p * 6, p * 6)
                l = jnp.linalg.cholesky(s_dense)
                yv = jax.scipy.linalg.solve_triangular(
                    l, rhs.reshape(-1), lower=True)
                dp = jax.scipy.linalg.solve_triangular(
                    l.T, yv, lower=False).reshape(p, 6)
            else:
                dp = _cg_on_dense_blocks(
                    s, u_damped, rhs, free, params.cg_iters)
            dp = dp * free[:, None]
        else:
            # matrix-free distributed PCG: each CG step is local O(M/D)
            # observation work + ONE psum of the (P, 6) product
            rhs_p2 = rhs_p * free[:, None]

            def matvec(v):
                vf = v * free[:, None]
                t1 = jnp.einsum(
                    "mij,mi->mj", b_b,
                    ba_mod._expand_cam(vf, obs_cam, cam_oh_l),
                    precision=_HI)
                t2 = ba_mod._seg_sum_pt(t1, obs_pt, nl,
                                        seg_oh_l, seg_ids_l)
                t3 = jnp.einsum("nij,nj->ni", v_inv, t2, precision=_HI)
                t4 = jnp.einsum(
                    "mij,mj->mi", b_b,
                    ba_mod._expand_pt(t3, obs_pt, seg_oh_l, seg_ids_l),
                    precision=_HI)
                sv_part = ba_mod._seg_sum_cam(t4, obs_cam, p, cam_oh_l)
                sv = (jnp.einsum("pij,pj->pi", u_damped, vf,
                                 precision=_HI)
                      - jax.lax.psum(sv_part, axis))
                return sv * free[:, None] + v * (1.0 - free[:, None])

            eye6b = jnp.broadcast_to(eye6, (p, 6, 6))
            m_blocks = jnp.where(free[:, None, None] > 0,
                                 u_damped, eye6b)
            minv = solve_unrolled(m_blocks, eye6b)

            def apply_minv(r_):
                return jnp.einsum("pij,pj->pi", minv, r_, precision=_HI)

            x0 = jnp.zeros_like(rhs_p2)
            r0 = rhs_p2
            z0 = apply_minv(r0)
            rz0 = jnp.sum(r0 * z0)

            def cg_body(carry, _):
                x, r_, pk, rz = carry
                ap = matvec(pk)
                denom = jnp.sum(pk * ap)
                alive = (rz > 1e-20) & (denom > 1e-20)
                alpha = jnp.where(
                    alive, rz / jnp.maximum(denom, 1e-20), 0.0)
                x = x + alpha * pk
                r_ = r_ - alpha * ap
                z = apply_minv(r_)
                rz_new = jnp.sum(r_ * z)
                beta = jnp.where(
                    alive, rz_new / jnp.maximum(rz, 1e-20), 0.0)
                return (x, r_, z + beta * pk, rz_new), None

            (dp, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, r0, z0, rz0), None,
                length=params.cg_iters)
            dp = dp * free[:, None]

        # local point back-substitution
        bt_dp = jnp.einsum(
            "mij,mi->mj", b_b,
            ba_mod._expand_cam(dp, obs_cam, cam_oh_l), precision=_HI)
        acc = ba_mod._seg_sum_pt(bt_dp, obs_pt, nl, seg_oh_l, seg_ids_l)
        dx = jnp.einsum("nij,nj->ni", v_inv, g_x - acc, precision=_HI)
        dx = dx * active[:, None]

        new_poses = lg.se3_retract(poses_c, dp)
        new_points = points_c + dx
        new_cost = total_cost(new_poses, new_points)
        accept = new_cost < cost
        poses_o = jnp.where(accept, new_poses, poses_c)
        points_o = jnp.where(accept, new_points, points_c)
        lam_o = jnp.clip(
            jnp.where(accept, lam / params.lambda_factor,
                      lam * params.lambda_factor),
            1e-10, 1e8,
        )
        return (poses_o, points_o, lam_o,
                jnp.where(accept, new_cost, cost)), None

    c0 = total_cost(poses, points_l)
    (poses_f, points_f, lam_f, cost_f), _ = jax.lax.scan(
        step,
        (poses, points_l, jnp.asarray(params.lambda_init, jnp.float32), c0),
        None, length=params.max_iterations,
    )
    return poses_f, points_f, c0, cost_f


def bundle_adjust_schur_dist(
    sharded: ShardedBAProblem, mesh: Mesh, params: BAParams = BAParams()
) -> BAResult:
    """Run the distributed LM-Schur loop (point-co-located layout) as
    one SPMD program over ``mesh``."""
    axis = mesh.axis_names[0]
    has_seg = sharded.seg_oh is not None
    has_cam = sharded.cam_oh is not None
    has_depth = sharded.obs_depth is not None
    has_prior = sharded.prior_center is not None

    def spmd(poses, points_s, k, obs_cam_s, obs_pt_s, obs_uv_s, obs_w_s,
             fixed_poses, fixed_points_s, *opt):
        oi = 0
        seg_oh_l = seg_ids_l = cam_oh_l = None
        depth_l = depth_w_l = prior_c = prior_i = None
        if has_seg:
            seg_oh_l, seg_ids_l = opt[oi][0], opt[oi + 1][0]
            oi += 2
        if has_cam:
            cam_oh_l = opt[oi][0]
            oi += 1
        if has_depth:
            depth_l, depth_w_l = opt[oi][0], opt[oi + 1][0]
            oi += 2
        if has_prior:
            prior_c, prior_i = opt[oi], opt[oi + 1]
        poses_f, points_f, c0, cost_f = _lm_schur_loop(
            poses, points_s[0], k, obs_cam_s[0], obs_pt_s[0],
            obs_uv_s[0], obs_w_s[0], fixed_poses, fixed_points_s[0],
            params, axis, seg_oh_l, seg_ids_l, cam_oh_l,
            depth_l, depth_w_l, prior_c, prior_i)
        return poses_f, points_f[None], c0, cost_f

    opt_args = []
    opt_specs = []
    if has_seg:
        opt_args += [sharded.seg_oh, sharded.seg_ids]
        opt_specs += [P(axis), P(axis)]
    if has_cam:
        opt_args += [sharded.cam_oh]
        opt_specs += [P(axis)]
    if has_depth:
        opt_args += [sharded.obs_depth, sharded.obs_depth_w]
        opt_specs += [P(axis), P(axis)]
    if has_prior:
        opt_args += [sharded.prior_center, sharded.prior_invs]
        opt_specs += [P(), P()]

    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(
            P(), P(axis), P(), P(axis), P(axis), P(axis), P(axis),
            P(), P(axis), *opt_specs,
        ),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )
    poses_f, points_sharded, c0, cost_f = fn(
        sharded.poses, sharded.points, sharded.k,
        sharded.obs_cam, sharded.obs_pt, sharded.obs_uv, sharded.obs_w,
        sharded.fixed_poses, sharded.fixed_points, *opt_args,
    )
    points_full = points_sharded.reshape(-1, 3)[: sharded.n_points]
    return BAResult(
        poses=poses_f, points=points_full, initial_cost=c0, final_cost=cost_f,
        iterations=jnp.asarray(params.max_iterations, jnp.int32),
    )


def bundle_adjust_schur_dist_kf(
    sharded: KeyframeShardedBA, mesh: Mesh, params: BAParams = BAParams()
) -> BAResult:
    """Distributed BA from the *keyframe-sharded* layout: the program
    first routes every observation from its producer (keyframe owner) to
    its point's owner shard (parallel.exchange — one packed all_to_all
    or skew-proof ppermute rounds), sorts arrivals by point with the
    static pre-computed permutation, and runs the same LM-Schur loop
    with the tiled segment engine — exchange → sort → reduction fused
    into ONE SPMD program (the north-star dataflow, SURVEY.md §5.7)."""
    axis = mesh.axis_names[0]
    nl = sharded.points.shape[1]  # (D, Nl, 3) → Nl
    has_seg = sharded.seg_oh is not None
    has_cam = sharded.cam_oh is not None
    has_prior = sharded.prior_center is not None
    n_payload = 1 if sharded.mode == "a2a" else len(sharded.payload)

    def spmd(poses, points_s, k, fixed_poses, fixed_points_s, perm_s,
             *rest):
        payload = rest[:n_payload]
        opt = rest[n_payload:]
        oi = 0
        seg_oh_l = seg_ids_l = cam_oh_l = prior_c = prior_i = None
        if has_seg:
            seg_oh_l, seg_ids_l = opt[oi][0], opt[oi + 1][0]
            oi += 2
        if has_cam:
            cam_oh_l = opt[oi][0]
            oi += 1
        if has_prior:
            prior_c, prior_i = opt[oi], opt[oi + 1]

        p_arg = payload[0] if sharded.mode == "a2a" else payload
        recv = ex_mod.exchange_payload_in_spmd(
            p_arg, sharded.mode, sharded.rounds, axis)[0]  # (L, C)
        if sharded.pad:
            pad_rows = jnp.zeros((sharded.pad, recv.shape[-1]),
                                 recv.dtype).at[:, 1].set(nl - 1)
            recv = jnp.concatenate([recv, pad_rows], axis=0)
        # ONE static-shape row gather per solve: sort by point so the
        # tiled segment engine's tile-local windows hold
        recv = jnp.take(recv, perm_s[0], axis=0)
        cam, pt, uv, w, depth, depth_w = ex_mod.unpack_payload(recv)

        poses_f, points_f, c0, cost_f = _lm_schur_loop(
            poses, points_s[0], k, cam, pt, uv, w,
            fixed_poses, fixed_points_s[0], params, axis,
            seg_oh_l, seg_ids_l, cam_oh_l, depth, depth_w,
            prior_c, prior_i)
        return poses_f, points_f[None], c0, cost_f

    payload_args = ((sharded.payload,) if sharded.mode == "a2a"
                    else tuple(sharded.payload))
    opt_args = []
    opt_specs = []
    if has_seg:
        opt_args += [sharded.seg_oh, sharded.seg_ids]
        opt_specs += [P(axis), P(axis)]
    if has_cam:
        opt_args += [sharded.cam_oh]
        opt_specs += [P(axis)]
    if has_prior:
        opt_args += [sharded.prior_center, sharded.prior_invs]
        opt_specs += [P(), P()]

    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(axis), P(axis),
                  *(P(axis) for _ in payload_args), *opt_specs),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )
    poses_f, points_sharded, c0, cost_f = fn(
        sharded.poses, sharded.points, sharded.k,
        sharded.fixed_poses, sharded.fixed_points, sharded.perm,
        *payload_args, *opt_args,
    )
    points_full = points_sharded.reshape(-1, 3)[: sharded.n_points]
    return BAResult(
        poses=poses_f, points=points_full, initial_cost=c0, final_cost=cost_f,
        iterations=jnp.asarray(params.max_iterations, jnp.int32),
    )
