"""Levenberg-Marquardt on flat or manifold parameters
(reference: kornia-algebra/src/optim/solvers/levenberg_marquardt.rs:70-115).

TPU re-design: a fixed-iteration ``lax.scan`` — accept/reject and λ
adaptation are `where`-selects, never Python branches, so the whole
optimization is one compiled program. Jacobians come from ``jax.jacfwd``
(forward-mode through the residual), replacing the reference's hand-derived
or numeric Jacobians with exact autodiff.
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import solve_cholesky_damped


class TerminationReason(enum.Enum):
    """Reference OptimizerResult/TerminationReason (levenberg_marquardt.rs:44)."""

    MAX_ITERATIONS = "max_iterations"
    COST_TOLERANCE = "cost_tolerance"


class LMResult(NamedTuple):
    params: jax.Array
    cost: jax.Array          # final 0.5·‖r‖²
    initial_cost: jax.Array
    iterations: jax.Array
    converged: jax.Array     # cost-decrease tolerance hit at final iter


def _cost(r):
    return 0.5 * jnp.sum(r * r)


def lm_optimize(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iterations: int = 20,
    lambda_init: float = 1e-3,
    lambda_factor: float = 10.0,
    cost_tolerance: float = 1e-9,
) -> LMResult:
    """Dense LM on a flat parameter vector. residual_fn: (P,) → (R,)."""

    def step(carry, _):
        x, lam, cost, conv = carry
        r = residual_fn(x)
        j = jax.jacfwd(residual_fn)(x)  # (R, P)
        jtj = j.T @ j
        g = j.T @ r
        delta = solve_cholesky_damped(jtj, -g, lam)
        x_new = x + delta
        new_cost = _cost(residual_fn(x_new))
        accept = new_cost < cost
        x_out = jnp.where(accept, x_new, x)
        lam_out = jnp.where(accept, lam / lambda_factor, lam * lambda_factor)
        lam_out = jnp.clip(lam_out, 1e-12, 1e6)
        cost_out = jnp.where(accept, new_cost, cost)
        conv_out = conv | (accept & (cost - new_cost < cost_tolerance * cost))
        return (x_out, lam_out, cost_out, conv_out), cost_out

    c0 = _cost(residual_fn(x0))
    (x, lam, cost, conv), _ = jax.lax.scan(
        step, (x0, jnp.asarray(lambda_init, x0.dtype), c0, jnp.asarray(False)),
        None, length=max_iterations,
    )
    return LMResult(
        params=x, cost=cost, initial_cost=c0,
        iterations=jnp.asarray(max_iterations, jnp.int32), converged=conv,
    )


def lm_manifold(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    tangent_dim: int,
    max_iterations: int = 20,
    lambda_init: float = 1e-3,
    lambda_factor: float = 10.0,
    cost_tolerance: float = 1e-9,
) -> LMResult:
    """LM over a manifold: each iteration linearizes residual(retract(x, δ))
    at δ = 0 (the reference's Variable ⊕ semantics, variable.rs:8-152).

    x0 can be any pytree; retract_fn(x, δ (tangent_dim,)) → x.
    """

    def step(carry, _):
        x, lam, cost, conv = carry
        res_at = lambda d: residual_fn(retract_fn(x, d))
        zero = jnp.zeros(tangent_dim, jnp.float32)
        r = res_at(zero)
        j = jax.jacfwd(res_at)(zero)
        jtj = j.T @ j
        g = j.T @ r
        delta = solve_cholesky_damped(jtj, -g, lam)
        x_new = retract_fn(x, delta)
        new_cost = _cost(residual_fn(x_new))
        accept = new_cost < cost
        x_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), x_new, x
        )
        lam_out = jnp.clip(
            jnp.where(accept, lam / lambda_factor, lam * lambda_factor), 1e-12, 1e6
        )
        cost_out = jnp.where(accept, new_cost, cost)
        conv_out = conv | (accept & (cost - new_cost < cost_tolerance * cost))
        return (x_out, lam_out, cost_out, conv_out), cost_out

    zero = jnp.zeros(tangent_dim, jnp.float32)
    c0 = _cost(residual_fn(x0))
    (x, lam, cost, conv), _ = jax.lax.scan(
        step, (x0, jnp.asarray(lambda_init, jnp.float32), c0, jnp.asarray(False)),
        None, length=max_iterations,
    )
    return LMResult(
        params=x, cost=cost, initial_cost=c0,
        iterations=jnp.asarray(max_iterations, jnp.int32), converged=conv,
    )
