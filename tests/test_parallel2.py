"""Distributed-layer tests (virtual 8-device CPU mesh via conftest):
distributed PGO vs single-host, ragged observation exchange, and the
data-parallel front-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim import pgo as pgo_mod
from kornia_tpu.parallel import exchange, frontend_dist, pgo_dist
from kornia_tpu.parallel.mesh import OBS_AXIS


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), (OBS_AXIS,))


def _noisy_circle_graph(rng, n=12, drift=0.05):
    """Ground-truth circle of poses + odometry edges with drift + one
    loop-closure edge."""
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        q = np.asarray(lg.matrix_to_quat(jnp.asarray(np.array([
            [np.cos(a), -np.sin(a), 0],
            [np.sin(a), np.cos(a), 0],
            [0, 0, 1.0]], np.float32))))
        t = np.array([np.cos(a), np.sin(a), 0.0])
        gt.append(np.concatenate([q, t]))
    gt = np.stack(gt).astype(np.float32)

    ei, ej, meas, w = [], [], [], []
    poses0 = gt.copy()
    for i in range(n - 1):
        rel = np.asarray(lg.se3_compose(
            jnp.asarray(gt[i + 1]), lg.se3_inverse(jnp.asarray(gt[i]))))
        noise = rng.normal(0, drift, 6).astype(np.float32)
        meas.append(np.asarray(lg.se3_compose(
            lg.se3_exp(jnp.asarray(noise)), jnp.asarray(rel))))
        ei.append(i)
        ej.append(i + 1)
        w.append(1.0)
        # integrate noisy odometry for the initial guess
        poses0[i + 1] = np.asarray(lg.se3_compose(
            jnp.asarray(meas[-1]), jnp.asarray(poses0[i])))
    # loop closure: last → first, exact
    rel = np.asarray(lg.se3_compose(
        jnp.asarray(gt[0]), lg.se3_inverse(jnp.asarray(gt[-1]))))
    ei.append(n - 1)
    ej.append(0)
    meas.append(rel)
    w.append(5.0)
    return (gt, poses0, np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.stack(meas).astype(np.float32), np.asarray(w, np.float32))


class TestDistributedPGO:
    def test_matches_single_host(self, mesh8, rng=None):
        rng = np.random.default_rng(2)
        gt, poses0, ei, ej, meas, w = _noisy_circle_graph(rng)
        params = pgo_mod.PGOParams(max_iterations=15)

        single = pgo_mod.pose_graph_optimize(
            jnp.asarray(poses0), ei, ej, jnp.asarray(meas),
            jnp.asarray(w), params=params)

        prob = pgo_dist.shard_pgo(poses0, ei, ej, meas, w, n_devices=8)
        dist = pgo_dist.pose_graph_optimize_dist(prob, mesh8, params)

        assert float(dist.final_cost) <= float(dist.initial_cost)
        # same optimum as the single-host solver
        np.testing.assert_allclose(
            np.asarray(dist.poses), np.asarray(single.poses), atol=5e-3)

    def test_improves_over_odometry(self, mesh8):
        rng = np.random.default_rng(4)
        gt, poses0, ei, ej, meas, w = _noisy_circle_graph(rng, drift=0.08)
        prob = pgo_dist.shard_pgo(poses0, ei, ej, meas, w, n_devices=8)
        res = pgo_dist.pose_graph_optimize_dist(
            prob, mesh8, pgo_mod.PGOParams(max_iterations=20))
        out = np.asarray(res.poses)
        err0 = np.linalg.norm(poses0[:, 4:] - gt[:, 4:], axis=1).mean()
        err1 = np.linalg.norm(out[:, 4:] - gt[:, 4:], axis=1).mean()
        assert err1 < 0.5 * err0


class TestExchange:
    def test_routes_to_point_owner(self, mesh8):
        rng = np.random.default_rng(1)
        d = 8
        pts_per_shard = 4
        m = 64
        src = rng.integers(0, d, m)
        cam = rng.integers(0, 10, m).astype(np.int32)
        pt = rng.integers(0, d * pts_per_shard, m)
        uv = rng.random((m, 2)).astype(np.float32)

        plan = exchange.build_exchange_plan(
            src, cam, pt, uv, d, pts_per_shard)
        rcam, rpt, ruv, rw = exchange.exchange_observations(plan, mesh8)
        rcam = np.asarray(rcam)
        rpt = np.asarray(rpt)
        ruv = np.asarray(ruv)
        rw = np.asarray(rw)

        # every real observation must land exactly once on its point's
        # owner shard, with its payload intact
        for i in range(m):
            owner = pt[i] // pts_per_shard
            local = pt[i] % pts_per_shard
            rows = np.nonzero(
                (rw[owner] > 0) & (rcam[owner] == cam[i])
                & (rpt[owner] == local)
                & (np.abs(ruv[owner] - uv[i]).sum(1) < 1e-6))[0]
            assert len(rows) >= 1
        # padding is weight-0 and total live rows == m
        assert int((rw > 0).sum()) == m

    def test_bucket_padding(self, mesh8):
        # all observations from shard 0 to shard 7: max-skew routing
        d = 8
        m = 10
        src = np.zeros(m, np.int64)
        cam = np.arange(m, dtype=np.int32)
        pt = np.full(m, 7 * 3)  # all to shard 7 (3 points/shard)
        uv = np.zeros((m, 2), np.float32)
        plan = exchange.build_exchange_plan(src, cam, pt, uv, d, 3)
        assert plan.bucket == m
        rcam, rpt, ruv, rw = exchange.exchange_observations(plan, mesh8)
        rw = np.asarray(rw)
        assert int((rw[7] > 0).sum()) == m
        assert int((rw[:7] > 0).sum()) == 0


class TestFrontendDist:
    def test_batch_matches_single(self, mesh8):
        from kornia_tpu.features import orb

        rng = np.random.default_rng(3)
        small = (rng.random((8, 24, 32)) * 255).astype(np.uint8)
        frames = np.stack([
            np.kron(s, np.ones((8, 8))).astype(np.uint8) for s in small])
        cfg = orb.OrbConfig(n_features=128, n_levels=2)

        batched = frontend_dist.detect_and_describe_batch(
            jnp.asarray(frames), cfg, mesh8)
        single0 = orb.orb_detect_and_describe(jnp.asarray(frames[0]), cfg)
        np.testing.assert_allclose(
            np.asarray(batched.xy[0]), np.asarray(single0.xy), atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(batched.mask[0]), np.asarray(single0.mask))


class TestExchangeSkew:
    """SURVEY.md §7 hard-part #1: skewed co-visibility. One hot
    (src, dst) keyframe pair must not inflate all D² buckets — the
    auto plan switches to ppermute rounds, bounding the payload."""

    def _skewed(self, rng, d=8, hot=1500, cold=6):
        # hot: keyframes on shard 2 observing points owned by shard 5;
        # cold: a few obs between every other pair
        src, cam, pt = [], [], []
        src += [2] * hot
        cam += list(rng.integers(0, 4, hot))
        pt += list(rng.integers(5 * 10, 6 * 10, hot))  # shard 5's points
        for s in range(d):
            for t in range(d):
                if (s, t) == (2, 5):
                    continue
                src += [s] * cold
                cam += list(rng.integers(0, 4, cold))
                pt += list(rng.integers(t * 10, (t + 1) * 10, cold))
        m = len(src)
        uv = rng.random((m, 2)).astype(np.float32)
        return (np.asarray(src), np.asarray(cam, np.int32),
                np.asarray(pt), uv, d, m)

    def test_hot_pair_switches_to_rounds_and_bounds_payload(self, mesh8):
        rng = np.random.default_rng(5)
        src, cam, pt, uv, d, m = self._skewed(rng)
        plan = exchange.build_exchange_plan(src, cam, pt, uv, d, 10)
        assert plan.mode == "rounds"
        bytes_a2a = d * d * plan.bucket * plan.n_cols * 4
        # rounds pays the hot bucket ONCE per shard instead of D² times
        assert plan.payload_bytes < 0.25 * bytes_a2a
        # absolute budget: within 8× (= D, the per-round replication
        # across shards) of the raw observation bytes + slack for the
        # cold rounds
        raw = m * plan.n_cols * 4
        assert plan.payload_bytes < 10 * raw, (plan.payload_bytes, raw)

    def test_skewed_routing_correct(self, mesh8):
        rng = np.random.default_rng(6)
        src, cam, pt, uv, d, m = self._skewed(rng, hot=300)
        plan = exchange.build_exchange_plan(src, cam, pt, uv, d, 10)
        rcam, rpt, ruv, rw = exchange.exchange_observations(plan, mesh8)
        rcam, rpt = np.asarray(rcam), np.asarray(rpt)
        ruv, rw = np.asarray(ruv), np.asarray(rw)
        assert int((rw > 0).sum()) == m
        # spot-check a sample of rows land on their owner with payload
        for i in rng.choice(m, 50, replace=False):
            owner, local = pt[i] // 10, pt[i] % 10
            rows = np.nonzero(
                (rw[owner] > 0) & (rcam[owner] == cam[i])
                & (rpt[owner] == local)
                & (np.abs(ruv[owner] - uv[i]).sum(1) < 1e-6))[0]
            assert len(rows) >= 1

    def test_uniform_stays_a2a(self, mesh8):
        rng = np.random.default_rng(7)
        d, m = 8, 640
        src = rng.integers(0, d, m)
        cam = rng.integers(0, 6, m).astype(np.int32)
        pt = rng.integers(0, d * 10, m)
        uv = rng.random((m, 2)).astype(np.float32)
        plan = exchange.build_exchange_plan(src, cam, pt, uv, d, 10)
        assert plan.mode == "a2a"
