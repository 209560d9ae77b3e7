"""Robust loss functions (reference: kornia-algebra/src/optim/losses.rs:6-79).

Each loss returns the IRLS weight w(r²) such that the weighted residual
√w·r implements the robustified cost (the triggs convention the reference's
RobustLoss::weight uses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    return jnp.ones_like(sq_norm)


def huber_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    """w = 1 for |r| ≤ k, k/|r| beyond."""
    r = jnp.sqrt(jnp.maximum(sq_norm, 1e-18))
    return jnp.where(r <= scale, 1.0, scale / r)


def cauchy_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    """w = 1 / (1 + (r/k)²)."""
    return 1.0 / (1.0 + sq_norm / (scale * scale))


def tukey_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    r2 = sq_norm / (scale * scale)
    w = jnp.where(r2 <= 1.0, (1.0 - r2) ** 2, 0.0)
    return w


LOSSES = {
    "identity": identity_weight,
    "huber": huber_weight,
    "cauchy": cauchy_weight,
    "tukey": tukey_weight,
}
