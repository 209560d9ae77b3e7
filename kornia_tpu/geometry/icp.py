"""Iterative closest point (reference: kornia-3d/src/registration/ —
icp_vanilla.rs:45, ops.rs fit_transformation, ICPConvergenceCriteria :12).

TPU re-design: the reference's kiddo k-d tree NN becomes a brute-force
distance matmul (‖a−b‖² = |a|² + |b|² − 2ab) + argmin — for the 10³–10⁵
point clouds the reference targets, one MXU matmul beats tree traversal.
The outer loop is a ``lax.scan`` with fixed iterations (static graph);
convergence is reported, not branched on.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.linalg import rigid_transform_3d


@dataclasses.dataclass(frozen=True)
class ICPParams:
    """Reference ICPConvergenceCriteria (fixed-iteration TPU variant)."""

    max_iterations: int = 30
    distance_threshold: float = jnp.inf  # reject pairs farther than this
    tolerance: float = 1e-6              # reported, not branched on


class ICPResult(NamedTuple):
    """Reference ICPResult (icp_vanilla.rs:12)."""

    rotation: jax.Array      # (3, 3)
    translation: jax.Array   # (3,)
    rmse: jax.Array          # () final inlier RMSE
    converged: jax.Array     # () bool — last-step improvement < tolerance
    num_iterations: jax.Array


def nearest_neighbors(
    src: jax.Array, dst: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Brute-force NN: (N, 3) × (M, 3) → (idx (N,), dist² (N,))."""
    # precision=HIGHEST: the default bf16 MXU pass loses ~1e-2 relative —
    # larger than typical odometry displacements, which corrupts the
    # assignment (observed on v5e: ICP failed to converge at bf16).
    cross = jax.lax.dot_general(
        src, dst, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )
    d = (
        jnp.sum(src * src, axis=1, keepdims=True)
        + jnp.sum(dst * dst, axis=1)[None, :]
        - 2.0 * cross
    )
    idx = jnp.argmin(d, axis=1)
    return idx, jnp.maximum(jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0], 0.0)


def icp_vanilla(
    source: jax.Array,
    target: jax.Array,
    params: ICPParams = ICPParams(),
    init_rotation: Optional[jax.Array] = None,
    init_translation: Optional[jax.Array] = None,
) -> ICPResult:
    """Point-to-point ICP aligning ``source`` onto ``target``.

    source: (N, 3); target: (M, 3). Returns the transform with
    target ≈ R·source + t.
    """
    r0 = jnp.eye(3, dtype=source.dtype) if init_rotation is None else init_rotation
    t0 = jnp.zeros(3, source.dtype) if init_translation is None else init_translation

    def step(carry, _):
        r, t, prev_rmse = carry
        moved = source @ r.T + t
        idx, d2 = nearest_neighbors(moved, target)
        matched = target[idx]
        w = (d2 < params.distance_threshold**2).astype(source.dtype)
        w = jnp.where(jnp.sum(w) < 3, jnp.ones_like(w), w)  # degenerate guard
        r_new, t_new, _ = rigid_transform_3d(source, matched, w)
        moved2 = source @ r_new.T + t_new
        _, d2_new = nearest_neighbors(moved2, target)
        rmse = jnp.sqrt(jnp.sum(d2_new * w) / jnp.maximum(jnp.sum(w), 1.0))
        return (r_new, t_new, rmse), rmse

    (r, t, rmse), history = jax.lax.scan(
        step, (r0, t0, jnp.asarray(jnp.inf, source.dtype)), None,
        length=params.max_iterations,
    )
    improvement = jnp.abs(history[-2] - history[-1]) if params.max_iterations > 1 else rmse
    return ICPResult(
        rotation=r,
        translation=t,
        rmse=rmse,
        converged=improvement < params.tolerance,
        num_iterations=jnp.asarray(params.max_iterations, jnp.int32),
    )
