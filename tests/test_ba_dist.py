"""Distributed Schur BA on the 8-virtual-CPU-device mesh (SURVEY.md §4:
multi-host paths are unit-testable via mocked meshes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kornia_tpu.optim import ba as ba_mod
from kornia_tpu.parallel import ba_dist, mesh as mesh_mod
from test_optim import make_ba_scene


@pytest.fixture(scope="module")
def scene():
    return make_ba_scene(seed=3, n_poses=6, n_points=96, noise_px=0.5)


def test_dist_matches_single_host(scene):
    (poses_gt, poses_init, pts_gt, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
    )
    params = ba_mod.BAParams(max_iterations=10, loss="identity")
    single = ba_mod.bundle_adjust_schur(problem, params)

    m = mesh_mod.make_mesh()
    assert m.size == 8
    sharded = ba_dist.shard_problem(problem, m.size)
    dist = ba_dist.bundle_adjust_schur_dist(sharded, m, params)

    # identical math (same damping path) → near-identical results
    np.testing.assert_allclose(
        float(dist.final_cost), float(single.final_cost), rtol=1e-3
    )
    # f32 reduction order differs across shards → ~1e-4 noise
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=5e-3
    )


def test_dist_reduces_cost(scene):
    (poses_gt, poses_init, pts_gt, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
    )
    m = mesh_mod.make_mesh()
    sharded = ba_dist.shard_problem(problem, m.size)
    params = ba_mod.BAParams(max_iterations=12, loss="huber", loss_scale=2.0)
    res = ba_dist.bundle_adjust_schur_dist(sharded, m, params)
    assert float(res.final_cost) < 0.2 * float(res.initial_cost)


def test_shard_problem_roundtrip(scene):
    (poses_gt, poses_init, pts_gt, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
    )
    sharded = ba_dist.shard_problem(problem, 8)
    # every original observation appears exactly once (weights preserved)
    assert float(sharded.obs_w.sum()) == float(problem.obs_w.sum())
    # local point ids in range
    assert int(sharded.obs_pt.max()) < sharded.points.shape[1]
    # points roundtrip
    np.testing.assert_allclose(
        np.asarray(sharded.points).reshape(-1, 3)[: sharded.n_points],
        np.asarray(problem.points),
    )


def test_kf_sharded_exchange_matches_colocated(scene):
    """North-star dataflow (VERDICT r2 missing #1/#2): observations
    sharded by *keyframe owner*, all_to_all'd to their point-owner shard
    inside the BA program, must match the co-located layout and the
    single-host solver to f32 tolerance."""
    (poses_gt, poses_init, pts_gt, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed
    )
    params = ba_mod.BAParams(max_iterations=10, loss="identity")
    single = ba_mod.bundle_adjust_schur(problem, params)

    m = mesh_mod.make_mesh()
    kf_sharded = ba_dist.shard_problem_by_keyframe(problem, m.size)
    # every real observation routed exactly once (payload w column)
    payload = (kf_sharded.payload if kf_sharded.mode == "a2a"
               else np.concatenate([np.asarray(x).reshape(-1, x.shape[-1])
                                    for x in kf_sharded.payload]))
    assert float(np.asarray(payload)[..., 4].sum()) == float(
        problem.obs_w.sum())
    dist = ba_dist.bundle_adjust_schur_dist_kf(kf_sharded, m, params)

    colo = ba_dist.bundle_adjust_schur_dist(
        ba_dist.shard_problem(problem, m.size), m, params)
    np.testing.assert_allclose(
        float(dist.final_cost), float(single.final_cost), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(colo.poses), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(dist.points), np.asarray(single.points), atol=5e-3)


def test_matfree_pcg_budget_fallback(scene, monkeypatch):
    """When the reduced system exceeds the materialization budget the
    matrix-free PCG (one psum per CG step) must still reach the basin."""
    (_, poses_init, _, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed)
    m = mesh_mod.make_mesh()
    sharded = ba_dist.shard_problem(problem, m.size)
    monkeypatch.setattr(ba_dist, "_S_MAT_BYTES", 0)
    res = ba_dist.bundle_adjust_schur_dist(
        sharded, m, ba_mod.BAParams(max_iterations=8, solver="pcg",
                                    cg_iters=40))
    assert float(res.final_cost) < 0.2 * float(res.initial_cost)


def test_dist_pcg_matches_dense():
    """The fully-distributed PCG solver (one psum per CG step, nothing
    replicated beyond (P,6) vectors) reaches the dense path's basin on
    the virtual mesh."""
    from jax.sharding import Mesh

    from kornia_tpu.parallel.mesh import OBS_AXIS

    (_, poses_init, _, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = make_ba_scene(
        seed=5, n_poses=12, n_points=400, noise_px=0.5)
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
        fixed_poses=fixed)
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices), (OBS_AXIS,))
    sharded = ba_dist.shard_problem(problem, len(devices))
    r_pcg = ba_dist.bundle_adjust_schur_dist(
        sharded, mesh, ba_mod.BAParams(max_iterations=6, solver="pcg",
                                       cg_iters=50))
    r_dense = ba_dist.bundle_adjust_schur_dist(
        sharded, mesh, ba_mod.BAParams(max_iterations=6,
                                       solver="dense"))
    assert float(r_pcg.final_cost) < 0.2 * float(r_pcg.initial_cost)
    assert float(r_pcg.final_cost) <= 1.3 * float(r_dense.final_cost)


def _depth_for(scene):
    """Per-observation GT camera-frame depth for a make_ba_scene scene."""
    from kornia_tpu.geometry import liegroup as lg

    (poses_gt, _, pts_gt, _, k, obs_cam, obs_pt, _, _) = scene
    pc = np.asarray(lg.se3_apply(
        jnp.asarray(poses_gt)[obs_cam], jnp.asarray(pts_gt)[obs_pt]))
    return pc[:, 2].astype(np.float32)


def test_kf_sharded_engine_matches_fallback(scene, monkeypatch):
    """The tiled segment engine built on the post-exchange ordering
    (VERDICT r3 item 1a) must be active and bit-compatible with the
    scatter fallback on the SAME kf-sharded layout."""
    monkeypatch.setenv("KORNIA_TPU_BA_ENGINE", "off")
    (_, poses_init, _, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv, fixed_poses=fixed)
    params = ba_mod.BAParams(max_iterations=8, loss="huber", loss_scale=2.0)
    m = mesh_mod.make_mesh()

    plain = ba_dist.shard_problem_by_keyframe(problem, m.size)
    assert plain.seg_oh is None
    r_plain = ba_dist.bundle_adjust_schur_dist_kf(plain, m, params)

    monkeypatch.setenv("KORNIA_TPU_BA_ENGINE", "on")
    eng = ba_dist.shard_problem_by_keyframe(problem, m.size)
    assert eng.seg_oh is not None and eng.cam_oh is not None
    r_eng = ba_dist.bundle_adjust_schur_dist_kf(eng, m, params)

    np.testing.assert_allclose(
        float(r_eng.final_cost), float(r_plain.final_cost), rtol=1e-4)
    # engine vs fallback differ only in f32 summation order; 8 LM
    # accept/reject decisions amplify that to the same ~5e-4 scale as
    # the dist-vs-single comparisons above
    np.testing.assert_allclose(
        np.asarray(r_eng.poses), np.asarray(r_plain.poses), atol=5e-4)


def test_kf_sharded_depth_matches_single_host(scene):
    """RGB-D depth residuals must ride the exchange payload (VERDICT r3
    missing #4: sharding an RGB-D problem previously dropped depth)."""
    (_, poses_init, _, pts_init, k,
     obs_cam, obs_pt, obs_uv, fixed) = scene
    depths = _depth_for(scene)
    dw = np.full(len(obs_cam), 50.0, np.float32)
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
        fixed_poses=fixed, obs_depth=depths, obs_depth_w=dw)
    params = ba_mod.BAParams(max_iterations=10, loss="identity")
    single = ba_mod.bundle_adjust_schur(problem, params)

    m = mesh_mod.make_mesh()
    kf = ba_dist.shard_problem_by_keyframe(problem, m.size)
    assert kf.has_depth
    dist = ba_dist.bundle_adjust_schur_dist_kf(kf, m, params)
    np.testing.assert_allclose(
        float(dist.final_cost), float(single.final_cost), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dist.poses), np.asarray(single.poses), atol=5e-4)

    # the depth rows must actually constrain the problem: a run whose
    # depth weights are zeroed ends at a different (mono) cost
    problem_mono = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
        fixed_poses=fixed)
    mono = ba_dist.bundle_adjust_schur_dist_kf(
        ba_dist.shard_problem_by_keyframe(problem_mono, m.size), m, params)
    assert abs(float(mono.final_cost) - float(dist.final_cost)) > 1e-3


def test_pose_priors_distributed_match_single_host(scene):
    """BaPosePrior-equivalent terms (reference ba.rs:107,
    ba_schur.rs:385) through BOTH distributed layouts."""
    from kornia_tpu.geometry import liegroup as lg

    (poses_gt, poses_init, _, pts_init, k,
     obs_cam, obs_pt, obs_uv, _) = scene
    p = poses_init.shape[0]
    # NO fixed poses: gauge is anchored purely by priors on the first
    # two camera centres (the reference's stated use case)
    rm = np.asarray(lg.quat_to_matrix(jnp.asarray(poses_gt[:, :4])))
    centers = -np.einsum("pji,pj->pi", rm, poses_gt[:, 4:])
    sigma = np.full(p, np.nan, np.float32)
    sigma[:2] = 1e-3
    problem = ba_mod.build_problem(
        poses_init, pts_init, k, obs_cam, obs_pt, obs_uv,
        pose_prior_center=centers, pose_prior_sigma=sigma)
    params = ba_mod.BAParams(max_iterations=10, loss="identity")
    single = ba_mod.bundle_adjust_schur(problem, params)
    assert float(single.final_cost) < 0.3 * float(single.initial_cost)
    # anchored centres obey the priors
    rm_f = np.asarray(lg.quat_to_matrix(single.poses[:, :4]))
    c_f = -np.einsum("pji,pj->pi", rm_f, np.asarray(single.poses[:, 4:]))
    assert np.abs(c_f[:2] - centers[:2]).max() < 5e-3

    m = mesh_mod.make_mesh()
    colo = ba_dist.bundle_adjust_schur_dist(
        ba_dist.shard_problem(problem, m.size), m, params)
    kf = ba_dist.bundle_adjust_schur_dist_kf(
        ba_dist.shard_problem_by_keyframe(problem, m.size), m, params)
    np.testing.assert_allclose(
        float(colo.final_cost), float(single.final_cost), rtol=1e-3)
    np.testing.assert_allclose(
        float(kf.final_cost), float(single.final_cost), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(kf.poses), np.asarray(single.poses), atol=1e-3)
