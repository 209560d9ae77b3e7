"""Geometric warps (reference: kornia-imgproc/src/warp/).

warp_affine / warp_perspective with cv2 semantics: the matrix maps source →
destination, and each destination pixel samples the source at the *inverse*
mapping (cv2 WARP_INVERSE_MAP off by default, same here). The reference
computes per-row valid spans to skip out-of-bounds work (warp/span.rs); on
TPU the full grid is evaluated — uniform dense math beats branchy spans on a
vector machine — with out-of-bounds handled by masking in the sampler.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.ops.interpolation import grid_sample, meshgrid_pixel


def invert_affine(m: jax.Array) -> jax.Array:
    """Invert a (2, 3) affine matrix (reference warp/affine.rs invert)."""
    a = m[:, :2]
    t = m[:, 2]
    ainv = jnp.linalg.inv(a)
    tinv = -ainv @ t
    return jnp.concatenate([ainv, tinv[:, None]], axis=1)


def get_rotation_matrix2d(center: Tuple[float, float], angle_deg, scale) -> jax.Array:
    """cv2.getRotationMatrix2D equivalent; returns (2, 3) f32."""
    angle = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = jnp.cos(angle) * scale
    beta = jnp.sin(angle) * scale
    cx, cy = center
    return jnp.array(
        [
            [alpha, beta, (1.0 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1.0 - alpha) * cy],
        ],
        dtype=jnp.float32,
    )


def _finalize(out: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(dtype)


def _auto_method() -> str:
    """Per-backend default: the Pallas kernel on TPU, the (equally
    exact, compiled-fast) gather formulation on CPU — interpret-mode
    kernel execution on CPU costs ~0.5 s/Mpx, which poisons CPU test
    suites and --cpu example runs. KORNIA_TPU_WARP overrides."""
    import os

    env = os.environ.get("KORNIA_TPU_WARP", "")
    if env in ("pallas", "gather", "shear"):
        return env
    import jax as _jax

    return "pallas" if _jax.default_backend() == "tpu" else "gather"


def warp_affine(
    img: jax.Array,
    m: jax.Array,
    dsize: Tuple[int, int],
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    fill_value: float = 0.0,
    method: str = "auto",
) -> jax.Array:
    """Warp (H, W, C) or (H, W) by the 2×3 matrix ``m`` into (new_h, new_w).

    ``m`` maps src→dst like cv2.warpAffine.

    method "auto" (default) picks per backend: "pallas" on TPU — the
    exact single-pass bilinear warp as a vector-rate Pallas chunk
    kernel (ops.warp_pallas, ~1 ms at 1080p, scalar-gather fallback
    for maps outside the static window capacity) — and "gather" on
    CPU, where XLA gathers are fast and the interpret-mode kernel is
    not (both are exact; results agree to <=1 u8 rounding tie).
    method "gather" on TPU is scalar-rate (~60 ms at 1080p). method
    "shear" routes through ops.warp_shear (SVD → shear passes + band
    matmuls): multi-pass interpolation, ≈3% max deviation,
    bilinear/zeros only — kept for A/B comparison.
    """
    if method == "auto":
        method = _auto_method()
    if method == "pallas" and mode in ("bilinear", "nearest"):
        from kornia_tpu.ops.warp_pallas import warp_affine_exact

        return warp_affine_exact(img, m, dsize, mode=mode,
                                 padding_mode=padding_mode,
                                 fill_value=fill_value)
    if method == "shear" and mode == "bilinear" and padding_mode == "zeros":
        from kornia_tpu.ops.warp_shear import warp_affine_shear

        return warp_affine_shear(img, m, dsize)
    new_h, new_w = dsize
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    minv = invert_affine(m.astype(jnp.float32))
    gx, gy = meshgrid_pixel(new_h, new_w)
    sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
    sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]
    out = grid_sample(x, sx, sy, mode=mode, padding_mode=padding_mode, fill_value=fill_value)
    out = _finalize(out, img.dtype)
    return out[..., 0] if squeeze else out


def warp_perspective(
    img: jax.Array,
    m: jax.Array,
    dsize: Tuple[int, int],
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    fill_value: float = 0.0,
    method: str = "auto",
) -> jax.Array:
    """Warp by a 3×3 homography (cv2.warpPerspective semantics).

    method "auto" (default) = "pallas" on TPU (exact vector-rate chunk
    kernel, gather fallback for extreme horizons), "gather" on CPU
    (see warp_affine); "pallas"/"gather" force a path.
    """
    if method == "auto":
        method = _auto_method()
    if method == "pallas" and mode in ("bilinear", "nearest"):
        from kornia_tpu.ops.warp_pallas import warp_perspective_exact

        return warp_perspective_exact(img, m, dsize, mode=mode,
                                      padding_mode=padding_mode,
                                      fill_value=fill_value)
    new_h, new_w = dsize
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    minv = jnp.linalg.inv(m.astype(jnp.float32))
    gx, gy = meshgrid_pixel(new_h, new_w)
    denom = minv[2, 0] * gx + minv[2, 1] * gy + minv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    sx = (minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]) / denom
    sy = (minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]) / denom
    out = grid_sample(x, sx, sy, mode=mode, padding_mode=padding_mode, fill_value=fill_value)
    out = _finalize(out, img.dtype)
    return out[..., 0] if squeeze else out
