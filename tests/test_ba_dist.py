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
    # every real observation routed exactly once
    assert float(kf_sharded.send_w.sum()) == float(problem.obs_w.sum())
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
