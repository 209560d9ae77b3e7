"""Pose-graph optimization (reference: kornia-3d/src/pgo.rs — PgoEdge :47,
residual r = log(T_ab_meas⁻¹ · T_b · T_a⁻¹) with right-perturbation
convention :1-18, numeric central-difference Jacobians, pose_graph_optimize
:321 on the LM core).

TPU re-design: Jacobians are *exact* forward-mode autodiff through the
Lie-group ops (vmapped per edge) — replacing the reference's numeric
differences; the 6P×6P Gauss-Newton system is assembled with scatter-adds
and solved with a damped dense Cholesky inside a ``lax.scan`` LM loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kornia_tpu.geometry import liegroup as lg
from kornia_tpu.optim.losses import LOSSES

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class PGOParams:
    """Reference PgoParams (pgo.rs:60)."""

    max_iterations: int = 20
    lambda_init: float = 1e-6
    lambda_factor: float = 10.0
    loss: str = "identity"
    loss_scale: float = 1.0


class PGOResult(NamedTuple):
    poses: jax.Array        # (P, 7)
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array


def edge_residual(t_a: jax.Array, t_b: jax.Array, t_ab_meas: jax.Array) -> jax.Array:
    """r = log(T_ab_meas⁻¹ ∘ T_b ∘ T_a⁻¹) ∈ ℝ⁶ (reference pgo.rs:1-18)."""
    rel = lg.se3_compose(t_b, lg.se3_inverse(t_a))
    return lg.se3_log(lg.se3_compose(lg.se3_inverse(t_ab_meas), rel))


def _edge_res_and_jac(t_a, t_b, t_meas):
    """Residual (6,) and Jacobians (6, 6) wrt left-perturbations of a and b."""

    def res(delta):
        da, db = delta[:6], delta[6:]
        return edge_residual(lg.se3_retract(t_a, da), lg.se3_retract(t_b, db), t_meas)

    zero = jnp.zeros(12, jnp.float32)
    r = res(zero)
    j = jax.jacfwd(res)(zero)  # (6, 12)
    return r, j[:, :6], j[:, 6:]


def pgo_normal_equations(
    poses: jax.Array,
    edge_i: jax.Array, edge_j: jax.Array, edge_meas: jax.Array,
    edge_weight: jax.Array, params: PGOParams,
):
    """Assemble H (P,P,6,6) contributions and g (P,6) via scatter-add."""
    p = poses.shape[0]
    t_a = poses[edge_i]
    t_b = poses[edge_j]
    r, ja, jb = jax.vmap(_edge_res_and_jac)(t_a, t_b, edge_meas)  # (E,6),(E,6,6)×2

    sq = jnp.sum(r * r, axis=-1)
    w = edge_weight * LOSSES[params.loss](sq, params.loss_scale)
    wja = ja * w[:, None, None]
    wjb = jb * w[:, None, None]

    haa = jnp.einsum("eki,ekj->eij", wja, ja, precision=_HI)
    hbb = jnp.einsum("eki,ekj->eij", wjb, jb, precision=_HI)
    hab = jnp.einsum("eki,ekj->eij", wja, jb, precision=_HI)
    ga = -jnp.einsum("eki,ek->ei", wja, r, precision=_HI)
    gb = -jnp.einsum("eki,ek->ei", wjb, r, precision=_HI)

    # scatter into the dense pair grid
    pair_aa = edge_i * p + edge_i
    pair_bb = edge_j * p + edge_j
    pair_ab = edge_i * p + edge_j
    pair_ba = edge_j * p + edge_i
    flat = jnp.concatenate([haa, hbb, hab, jnp.swapaxes(hab, -1, -2)]).reshape(-1, 36)
    idx = jnp.concatenate([pair_aa, pair_bb, pair_ab, pair_ba])
    h = jax.ops.segment_sum(flat, idx, num_segments=p * p).reshape(p, p, 6, 6)
    g = jax.ops.segment_sum(
        jnp.concatenate([ga, gb]), jnp.concatenate([edge_i, edge_j]), num_segments=p
    )
    return h, g, jnp.sum(w * sq) * 0.5


def pose_graph_optimize(
    poses: jax.Array,
    edge_i, edge_j, edge_meas, edge_weight=None,
    fixed: Optional[jax.Array] = None,
    params: PGOParams = PGOParams(),
) -> PGOResult:
    """LM pose-graph optimization (reference pose_graph_optimize, pgo.rs:321).

    poses: (P, 7); edges (E,) int32 pairs with (E, 7) relative measurements
    T_ab (T_b ≈ T_ab ∘ T_a); ``fixed`` marks gauge poses (default: pose 0).
    """
    p = poses.shape[0]
    edge_i = jnp.asarray(edge_i, jnp.int32)
    edge_j = jnp.asarray(edge_j, jnp.int32)
    if edge_weight is None:
        edge_weight = jnp.ones(edge_i.shape[0], jnp.float32)
    if fixed is None:
        fixed = jnp.zeros(p, bool).at[0].set(True)
    free = (~fixed).astype(jnp.float32)

    def cost_fn(ps):
        r = jax.vmap(edge_residual)(ps[edge_i], ps[edge_j], edge_meas)
        sq = jnp.sum(r * r, axis=-1)
        w = edge_weight * LOSSES[params.loss](sq, params.loss_scale)
        return 0.5 * jnp.sum(w * sq)

    def step(carry, _):
        ps, lam, cost = carry
        h, g, _ = pgo_normal_equations(ps, edge_i, edge_j, edge_meas, edge_weight, params)
        # gauge fixing
        h = h * free[:, None, None, None] * free[None, :, None, None]
        h = h.at[jnp.arange(p), jnp.arange(p)].add(
            (1.0 - free)[:, None, None] * jnp.eye(6, dtype=h.dtype)
        )
        g = g * free[:, None]
        hd = h.transpose(0, 2, 1, 3).reshape(p * 6, p * 6)
        diag = jnp.diagonal(hd)
        hd = hd + jnp.diag(lam * jnp.maximum(diag, 1e-9))
        l = jnp.linalg.cholesky(hd)
        y = jax.scipy.linalg.solve_triangular(l, g.reshape(-1), lower=True)
        delta = jax.scipy.linalg.solve_triangular(l.T, y, lower=False).reshape(p, 6)
        delta = delta * free[:, None]
        ps_new = lg.se3_retract(ps, delta)
        new_cost = cost_fn(ps_new)
        accept = new_cost < cost
        ps_o = jnp.where(accept, ps_new, ps)
        lam_o = jnp.clip(
            jnp.where(accept, lam / params.lambda_factor, lam * params.lambda_factor),
            1e-12, 1e8,
        )
        return (ps_o, lam_o, jnp.where(accept, new_cost, cost)), None

    c0 = cost_fn(poses)
    (ps, lam, cost), _ = jax.lax.scan(
        step, (poses, jnp.asarray(params.lambda_init, jnp.float32), c0),
        None, length=params.max_iterations,
    )
    return PGOResult(
        poses=ps, initial_cost=c0, final_cost=cost,
        iterations=jnp.asarray(params.max_iterations, jnp.int32),
    )
