"""Distributed pose-graph optimization (distributed Gauss-Newton).

North-star component (BASELINE.json: "pose-graph optimization via
distributed Gauss-Newton"); no reference code exists — designed from the
single-host math in optim/pgo.py the way ba_dist distributes ba.py.

Design: edges are sharded across the mesh axis (residual + Jacobian work
is O(edges), the dominant cost for large graphs); poses are replicated
(6P is small). Each device accumulates its partial block Hessian
(P, P, 6, 6) and gradient from local edges → one `psum` → identical
replicated damped solve + retract on every device. The LM loop lives
inside `shard_map`: one collective per iteration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim import pgo as pgo_mod
from kornia_tpu.optim.losses import LOSSES
from kornia_tpu.parallel.mesh import OBS_AXIS


class ShardedPGOProblem(NamedTuple):
    poses: jax.Array        # (Np, 7) replicated
    edge_i: jax.Array       # (D, El) int32
    edge_j: jax.Array       # (D, El)
    edge_meas: jax.Array    # (D, El, 7)
    edge_w: jax.Array       # (D, El) 0 = padding
    fixed: jax.Array        # (Np,) bool replicated


def shard_pgo(poses, edge_i, edge_j, edge_meas, edge_w=None,
              fixed=None, n_devices: int = 1) -> ShardedPGOProblem:
    """Host-side static partitioning: round-robin edges, zero-weight pad."""
    edge_i = np.asarray(edge_i, np.int32)
    edge_j = np.asarray(edge_j, np.int32)
    edge_meas = np.asarray(edge_meas, np.float32)
    e = edge_i.shape[0]
    if edge_w is None:
        edge_w = np.ones(e, np.float32)
    edge_w = np.asarray(edge_w, np.float32)
    p = np.asarray(poses).shape[0]
    if fixed is None:
        fixed = np.zeros(p, bool)
        fixed[0] = True

    el = max(-(-e // n_devices), 1)
    pad = el * n_devices
    ei = np.zeros(pad, np.int32)
    ej = np.zeros(pad, np.int32)
    em = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (pad, 1))
    ew = np.zeros(pad, np.float32)
    ei[:e], ej[:e], em[:e], ew[:e] = edge_i, edge_j, edge_meas, edge_w

    return ShardedPGOProblem(
        poses=jnp.asarray(poses, jnp.float32),
        edge_i=jnp.asarray(ei.reshape(n_devices, el)),
        edge_j=jnp.asarray(ej.reshape(n_devices, el)),
        edge_meas=jnp.asarray(em.reshape(n_devices, el, 7)),
        edge_w=jnp.asarray(ew.reshape(n_devices, el)),
        fixed=jnp.asarray(fixed),
    )


def pose_graph_optimize_dist(
    problem: ShardedPGOProblem, mesh: Mesh,
    params: pgo_mod.PGOParams = pgo_mod.PGOParams(),
) -> pgo_mod.PGOResult:
    """SPMD LM over edge shards: partial H/g → psum → replicated solve."""
    n_poses = problem.poses.shape[0]
    free = (~problem.fixed).astype(jnp.float32)

    def local_normal_eqs(poses, ei, ej, em, ew):
        h, g, cost = pgo_mod.pgo_normal_equations(
            poses, ei, ej, em, ew, params)
        return h, g, cost

    def spmd(poses, fixed_free, ei, ej, em, ew):
        # shapes inside: ei (1, El) → squeeze shard axis
        ei = ei[0]
        ej = ej[0]
        em = em[0]
        ew = ew[0]

        def cost_fn(ps):
            r = jax.vmap(pgo_mod.edge_residual)(ps[ei], ps[ej], em)
            sq = jnp.sum(r * r, axis=-1)
            w = ew * LOSSES[params.loss](sq, params.loss_scale)
            local = 0.5 * jnp.sum(w * sq)
            return jax.lax.psum(local, OBS_AXIS)

        def step(carry, _):
            ps, lam, cost = carry
            h, g, _ = local_normal_eqs(ps, ei, ej, em, ew)
            h = jax.lax.psum(h, OBS_AXIS)
            g = jax.lax.psum(g, OBS_AXIS)
            # gauge fixing + damped solve: identical to the single-host
            # step (optim/pgo.py:124-147), replicated on every device
            h = h * fixed_free[:, None, None, None] \
                * fixed_free[None, :, None, None]
            h = h.at[jnp.arange(n_poses), jnp.arange(n_poses)].add(
                (1.0 - fixed_free)[:, None, None]
                * jnp.eye(6, dtype=h.dtype))
            g = g * fixed_free[:, None]
            hd = h.transpose(0, 2, 1, 3).reshape(n_poses * 6, n_poses * 6)
            diag = jnp.diagonal(hd)
            hd = hd + jnp.diag(lam * jnp.maximum(diag, 1e-9))
            chol = jnp.linalg.cholesky(hd)
            y = jax.scipy.linalg.solve_triangular(
                chol, g.reshape(-1), lower=True)
            delta = jax.scipy.linalg.solve_triangular(
                chol.T, y, lower=False).reshape(n_poses, 6)
            delta = delta * fixed_free[:, None]
            new_ps = lg.se3_retract(ps, delta)
            new_cost = cost_fn(new_ps)
            accept = new_cost < cost
            ps = jnp.where(accept, new_ps, ps)
            cost_out = jnp.where(accept, new_cost, cost)
            lam = jnp.clip(
                jnp.where(accept, lam / params.lambda_factor,
                          lam * params.lambda_factor), 1e-12, 1e8)
            return (ps, lam, cost_out), cost_out

        cost0 = cost_fn(poses)
        (poses_out, _, cost_final), _ = jax.lax.scan(
            step, (poses, jnp.float32(params.lambda_init), cost0),
            None, length=params.max_iterations)
        return poses_out, cost0, cost_final

    fn = shard_map(
        spmd, mesh=mesh,
        in_specs=(P(), P(), P(OBS_AXIS), P(OBS_AXIS), P(OBS_AXIS),
                  P(OBS_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    poses_out, cost0, cost_final = jax.jit(fn)(
        problem.poses, free, problem.edge_i, problem.edge_j,
        problem.edge_meas, problem.edge_w)
    return pgo_mod.PGOResult(
        poses=poses_out, initial_cost=cost0, final_cost=cost_final,
        iterations=jnp.int32(params.max_iterations))
