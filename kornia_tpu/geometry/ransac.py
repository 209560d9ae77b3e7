"""Batched RANSAC (reference: kornia-3d/src/ransac/driver.rs:46,218).

TPU re-design (SURVEY.md §7 "Batched, not branchy"): instead of the
reference's sequential hypothesize-test loop with adaptive early exit, ALL
hypotheses are drawn, solved, and scored as one fixed-shape batch:

  1. sample  — (B, S) index sets drawn via Gumbel-top-k over the validity
               mask (without replacement, vectorized PRNG);
  2. solve   — the minimal solver is batched: (B, S, 2) → (B, 3, 3);
  3. score   — one (B, N) residual matrix, MSAC scoring;
  4. select  — argmin score;
  5. LO step — weighted refit on the winner's inliers (optionally iterated).

The hypothesis count B is chosen up front from the standard RANSAC formula
at a conservative inlier ratio (the reference's adaptive cap, driver.rs,
evaluated statically).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jax.Array        # (3, 3) or solver-shaped best model
    inliers: jax.Array      # (N,) bool
    n_inliers: jax.Array    # () int32
    score: jax.Array        # () float32 MSAC score (lower = better)


def num_hypotheses(
    sample_size: int, inlier_ratio: float = 0.3, confidence: float = 0.999
) -> int:
    """Static hypothesis budget from the classic formula."""
    denom = math.log(max(1.0 - inlier_ratio**sample_size, 1e-12))
    return max(32, int(math.ceil(math.log(1.0 - confidence) / denom)))


def sample_minimal_sets(
    key: jax.Array, n_points: int, mask: jax.Array, batch: int, sample_size: int
) -> jax.Array:
    """(B, S) index sets, approx. uniform over valid points, no repeats
    within a set (Gumbel-top-k over the mask)."""
    g = jax.random.gumbel(key, (batch, n_points))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def ransac(
    key: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    solver_fn: Callable[[jax.Array, jax.Array], jax.Array],
    residual_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    sample_size: int,
    threshold: float,
    mask: Optional[jax.Array] = None,
    n_hypotheses: int = 512,
    lo_iters: int = 2,
    refit_fn: Optional[Callable] = None,
    scoring: str = "msac",
) -> RansacResult:
    """Generic batched RANSAC.

    x1, x2: (N, 2) correspondences (padded; ``mask`` marks valid rows).
    solver_fn: (B, S, 2) × (B, S, 2) → (B, ...) batched minimal solver.
    residual_fn: (B, ...) models × (N, 2) × (N, 2) → (B, N) squared
      residuals (same units as threshold²).
    refit_fn: weighted full-set solver for local optimization (defaults to
      solver_fn on the inlier set with weights).
    scoring: "msac" (truncated residual sum) or "magsac" — σ-marginalized
      Gaussian quality over a fixed σ grid in (t/8, t], the batch-friendly
      form of MAGSAC's noise-scale marginalization (reference capability:
      kornia-3d ransac/magsac.rs). Affects hypothesis *selection* only;
      the returned inlier set still uses the hard threshold.
    """
    n = x1.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    t2 = threshold * threshold

    k_sample, _ = jax.random.split(key)
    idx = sample_minimal_sets(k_sample, n, mask, n_hypotheses, sample_size)
    s1 = x1[idx]  # (B, S, 2)
    s2 = x2[idx]
    models = solver_fn(s1, s2)  # (B, ...)

    res = residual_fn(models, x1, x2)  # (B, N)
    res = jnp.where(jnp.isfinite(res), res, t2)  # NaN/inf models → capped
    res = jnp.where(mask[None, :], res, t2)  # invalid rows contribute cap
    if scoring == "magsac":
        sigmas = jnp.linspace(threshold / 8.0, threshold, 8)
        # marginal inlier likelihood; negated so argmin still selects best
        lik = jnp.mean(
            jnp.exp(-res[..., None] / (2.0 * sigmas ** 2)), axis=-1)
        score_all = -jnp.sum(jnp.where(mask[None, :], lik, 0.0), axis=-1)
    elif scoring == "msac":
        score_all = jnp.sum(jnp.minimum(res, t2), axis=-1)  # (B,)
    else:
        raise ValueError(f"unknown scoring {scoring!r}")
    msac = score_all
    best = jnp.argmin(msac)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)

    if refit_fn is None:
        refit_fn = solver_fn  # must accept (N,2),(N,2),weights kwarg

    def _expand(model):
        return jax.tree_util.tree_map(lambda m: m[None], model)

    def lo_step(carry, _):
        model, _score = carry
        r = residual_fn(_expand(model), x1, x2)[0]
        inl = (r < t2) & mask
        w = inl.astype(x1.dtype)
        refit = refit_fn(x1[None], x2[None], weights=w[None])
        refit = jax.tree_util.tree_map(lambda m: m[0], refit)
        r2 = residual_fn(_expand(refit), x1, x2)[0]
        new_score = jnp.sum(jnp.minimum(jnp.where(mask, r2, t2), t2))
        old_score = jnp.sum(jnp.minimum(jnp.where(mask, r, t2), t2))
        better = new_score < old_score
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), refit, model
        )
        return (out, jnp.minimum(new_score, old_score)), None

    (final_model, final_score), _ = jax.lax.scan(
        lo_step, (best_model, msac[best]), None, length=lo_iters
    )
    r = residual_fn(_expand(final_model), x1, x2)[0]
    inliers = (r < t2) & mask
    return RansacResult(
        model=final_model,
        inliers=inliers,
        n_inliers=jnp.sum(inliers),
        score=final_score,
    )
