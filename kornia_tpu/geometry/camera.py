"""Camera models: pinhole, Brown-Conrady distortion, Kannala-Brandt fisheye
(reference: kornia-3d/src/camera/pinhole.rs, fisheye.rs;
kornia-imgproc/src/calibration/ — CameraIntrinsic mod.rs:12,
distort_point_polynomial distortion.rs:68, undistort iter :224).

All functions are batched over points; intrinsics are (3, 3) K matrices or
the explicit (fx, fy, cx, cy) + distortion coefficient vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.ops.interpolation import meshgrid_pixel


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Static camera description; arrays are constructed on demand."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 0
    height: int = 0

    @property
    def k_matrix(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )

    @classmethod
    def from_matrix(cls, k, width: int = 0, height: int = 0) -> "PinholeCamera":
        import numpy as np

        k = np.asarray(k)
        return cls(float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2]), width, height)


def project_points(pts_cam: jax.Array, k: jax.Array) -> jax.Array:
    """(..., 3) camera-frame points → (..., 2) pixels (z > 0 assumed)."""
    z = jnp.where(jnp.abs(pts_cam[..., 2:3]) < 1e-9, 1e-9, pts_cam[..., 2:3])
    xy = pts_cam[..., :2] / z
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    return jnp.stack(
        [xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1
    )


def unproject_points(px: jax.Array, depth: jax.Array, k: jax.Array) -> jax.Array:
    """(..., 2) pixels + (...,) depth → (..., 3) camera-frame points."""
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    x = (px[..., 0] - cx) / fx * depth
    y = (px[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normalize_points(px: jax.Array, k: jax.Array) -> jax.Array:
    """Pixels → normalized image coordinates (K⁻¹ applied)."""
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    return jnp.stack(
        [(px[..., 0] - cx) / fx, (px[..., 1] - cy) / fy], axis=-1
    )


# ---------------------------------------------------------------------------
# Brown-Conrady polynomial distortion (k1 k2 p1 p2 k3 [k4 k5 k6])
# ---------------------------------------------------------------------------


def distort_points_polynomial(xy_norm: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown-Conrady distortion to (..., 2) *normalized* coords
    (reference distort_point_polynomial, distortion.rs:68). ``dist`` is a
    length-5 or length-8 coefficient vector (cv2 ordering)."""
    d = jnp.zeros(8, xy_norm.dtype).at[: dist.shape[0]].set(dist)
    k1, k2, p1, p2, k3, k4, k5, k6 = (d[i] for i in range(8))
    x, y = xy_norm[..., 0], xy_norm[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points_iterative(
    xy_dist_norm: jax.Array, dist: jax.Array, iters: int = 8
) -> jax.Array:
    """Invert the distortion by fixed-point iteration (reference
    undistort_normalized_point_iter, distortion.rs:224; fixed iteration
    count for a static compute graph)."""

    def body(i, xy):
        delta = distort_points_polynomial(xy, dist) - xy
        return xy_dist_norm - delta

    return jax.lax.fori_loop(0, iters, body, xy_dist_norm)


def undistort_points(px: jax.Array, k: jax.Array, dist: jax.Array, iters: int = 8) -> jax.Array:
    """Pixel-space undistortion: pixels → undistorted pixels (cv2.undistortPoints
    with P=K; reference undistort_points distortion.rs:504)."""
    xy = normalize_points(px, k)
    xyu = undistort_points_iterative(xy, dist, iters)
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    return jnp.stack([xyu[..., 0] * fx + cx, xyu[..., 1] * fy + cy], axis=-1)


def generate_correction_map_polynomial(
    k: jax.Array, dist: jax.Array, size_hw: Tuple[int, int], new_k: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """(map_x, map_y) for remap-based image undistortion (reference
    generate_correction_map_polynomial, distortion.rs:135; pairs with
    ops.interpolation.remap like cv2.initUndistortRectifyMap)."""
    h, w = size_hw
    if new_k is None:
        new_k = k
    gx, gy = meshgrid_pixel(h, w)
    px = jnp.stack([gx, gy], axis=-1)
    xy = normalize_points(px, new_k)
    xyd = distort_points_polynomial(xy, dist)
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    return xyd[..., 0] * fx + cx, xyd[..., 1] * fy + cy


def undistort_image(img: jax.Array, k: jax.Array, dist: jax.Array,
                    new_k: Optional[jax.Array] = None,
                    mode: str = "bilinear") -> jax.Array:
    """Undistort an image (cv2.undistort; reference undistort_image path).

    The correction map is computed *in-program* and fused into the gather
    — on TPU this is ~1000× faster than remap() with precomputed map
    arrays, whose opaque runtime indices defeat XLA's gather lowering
    (measured 0.06 ms vs 70 ms at 1080p on v5e). Jit this with k/dist as
    runtime arguments.
    """
    from kornia_tpu.ops.interpolation import remap

    h, w = img.shape[:2]
    map_x, map_y = generate_correction_map_polynomial(
        k, dist, (h, w), new_k)
    # correction maps are smooth (row spread <= 2 per chunk for sane
    # calibrations): nsel=4 selects the ~1.5x faster kernel variant;
    # pathological maps fall back to the exact gather automatically
    return remap(img, map_x, map_y, mode, nsel=4)


# ---------------------------------------------------------------------------
# Kannala-Brandt fisheye (reference camera/fisheye.rs)
# ---------------------------------------------------------------------------


def fisheye_project(pts_cam: jax.Array, k: jax.Array, kb: jax.Array) -> jax.Array:
    """Kannala-Brandt equidistant model with polynomial θ-distortion
    θ_d = θ(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸), cv2.fisheye convention."""
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1.0 + kb[0] * t2 + kb[1] * t2**2 + kb[2] * t2**3 + kb[3] * t2**4)
    scale = theta_d / r
    xd = x * scale
    yd = y * scale
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    return jnp.stack([xd * fx + cx, yd * fy + cy], axis=-1)


def fisheye_unproject(px: jax.Array, k: jax.Array, kb: jax.Array, iters: int = 10) -> jax.Array:
    """Invert KB: pixels → unit-norm bearing vectors (..., 3)."""
    xy = normalize_points(px, k)
    theta_d = jnp.sqrt(jnp.maximum(jnp.sum(xy * xy, axis=-1), 1e-18))

    def body(i, theta):
        t2 = theta * theta
        f = theta * (1.0 + kb[0] * t2 + kb[1] * t2**2 + kb[2] * t2**3 + kb[3] * t2**4) - theta_d
        fp = 1.0 + 3 * kb[0] * t2 + 5 * kb[1] * t2**2 + 7 * kb[2] * t2**3 + 9 * kb[3] * t2**4
        return theta - f / jnp.maximum(fp, 1e-6)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    scale = jnp.tan(theta) / jnp.maximum(theta_d, 1e-12)
    xn = xy * scale[..., None]
    bearing = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)
