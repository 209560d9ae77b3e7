"""Stereo rectification (Bouguet) + rectification remap.

Capability parity with the reference's kornia-3d/src/stereo/rectify.rs
(StereoRectifier::from_calib, rectify_left/right via remap,
baseline/bf accessors). Implements the standard Bouguet rectification
used by cv2.stereoRectify: split the inter-camera rotation in half, align
both optical axes orthogonal to the baseline, and build undistort+rectify
maps consumed by kornia_tpu.ops.interpolation.remap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.camera import distort_points_polynomial
from kornia_tpu.ops.interpolation import remap


def _rodrigues_matrix(rvec: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * kx @ kx


def _rodrigues_vector(r: np.ndarray) -> np.ndarray:
    cos_t = np.clip((np.trace(r) - 1) / 2, -1, 1)
    theta = np.arccos(cos_t)
    if theta < 1e-12:
        return np.zeros(3)
    axis = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0],
                     r[1, 0] - r[0, 1]]) / (2 * np.sin(theta))
    return axis * theta


def stereo_rectify(
    k1: np.ndarray, d1: Optional[np.ndarray],
    k2: np.ndarray, d2: Optional[np.ndarray],
    image_size: Tuple[int, int],  # (h, w)
    r: np.ndarray, t: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bouguet stereo rectification.

    Args:
        k1/k2: 3×3 intrinsics; d1/d2: (k1 k2 p1 p2 k3) Brown-Conrady or None.
        image_size: (h, w); r, t: cam1→cam2 rotation and translation.

    Returns:
        (R1, R2, P1, P2, Q): per-camera rectifying rotations, 3×4 rectified
        projection matrices, and the 4×4 disparity-to-depth matrix — same
        contract as cv2.stereoRectify (with alpha=-1 default scaling
        approximated by keeping the mean focal length).
    """
    k1 = np.asarray(k1, np.float64)
    k2 = np.asarray(k2, np.float64)
    r = np.asarray(r, np.float64)
    t = np.asarray(t, np.float64).reshape(3)
    h, w = image_size

    # split rotation: each camera turns halfway toward the other
    om = _rodrigues_vector(r)
    r_half = _rodrigues_matrix(-0.5 * om)
    t_rect = r_half @ t

    # new x-axis along the baseline; positive toward camera order
    idx = 0 if abs(t_rect[0]) >= abs(t_rect[1]) else 1
    uu = np.zeros(3)
    uu[idx] = 1.0 if t_rect[idx] >= 0 else -1.0
    e1 = t_rect / np.linalg.norm(t_rect)
    ww = np.cross(e1, uu)
    nw = np.linalg.norm(ww)
    if nw > 1e-12:
        ww = ww / nw * np.arccos(np.clip(
            abs(t_rect[idx]) / np.linalg.norm(t_rect), -1, 1))
    r_align = _rodrigues_matrix(ww)

    r1 = r_align @ r_half.T
    r2 = r_align @ r_half
    # ensure the baseline maps onto +x of the rectified frame
    t_new = r2 @ t

    f = (k1[0, 0] + k1[1, 1] + k2[0, 0] + k2[1, 1]) / 4.0
    cx = (k1[0, 2] + k2[0, 2]) / 2.0
    cy = (k1[1, 2] + k2[1, 2]) / 2.0

    p1 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]])
    p2 = np.array([[f, 0, cx, f * t_new[idx]],
                   [0, f, cy, 0], [0, 0, 1, 0]])
    if idx == 1:  # vertical stereo: disparity offset on y
        p2 = np.array([[f, 0, cx, 0],
                       [0, f, cy, f * t_new[1]], [0, 0, 1, 0]])

    baseline = -t_new[idx]
    q = np.array([
        [1, 0, 0, -cx],
        [0, 1, 0, -cy],
        [0, 0, 0, f],
        [0, 0, -1.0 / baseline if baseline != 0 else 0, 0],
    ])
    return r1, r2, p1, p2, q


def init_undistort_rectify_map(
    k: np.ndarray, dist: Optional[np.ndarray], r_rect: np.ndarray,
    p_new: np.ndarray, image_size: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Build (map_x, map_y) for remap: rectified pixel → source pixel.

    Same contract as cv2.initUndistortRectifyMap.
    """
    h, w = image_size
    # optimization_barrier: the calib params are tiny trace-time
    # constants; without the barrier XLA folds the whole map into 16 MB
    # literals whose opaque indices hit the ~1000×-slower gather path
    # (same pathology as remap with precomputed maps).
    k = jax.lax.optimization_barrier(jnp.asarray(k, jnp.float32))
    rr = jax.lax.optimization_barrier(
        jnp.asarray(np.linalg.inv(r_rect), jnp.float32))
    p = jax.lax.optimization_barrier(
        jnp.asarray(np.asarray(p_new, np.float32)))
    fx_n, fy_n = p[0, 0], p[1, 1]
    cx_n, cy_n = p[0, 2], p[1, 2]

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xn = (xs - cx_n) / fx_n
    yn = (ys - cy_n) / fy_n
    ones = jnp.ones_like(xn)
    dirs = jnp.stack([xn, yn, ones], axis=-1) @ rr.T
    xn2 = dirs[..., 0] / dirs[..., 2]
    yn2 = dirs[..., 1] / dirs[..., 2]
    if dist is not None:
        xy = jnp.stack([xn2.reshape(-1), yn2.reshape(-1)], axis=-1)
        xy = distort_points_polynomial(
            xy, jax.lax.optimization_barrier(
                jnp.asarray(dist, jnp.float32)))
        xn2 = xy[:, 0].reshape(h, w)
        yn2 = xy[:, 1].reshape(h, w)
    map_x = xn2 * k[0, 0] + k[0, 2]
    map_y = yn2 * k[1, 1] + k[1, 2]
    return map_x, map_y


@dataclass
class StereoRectifier:
    """Precomputed rectification for a calibrated stereo pair.

    Reference: StereoRectifier::from_calib (stereo/rectify.rs:56-105),
    rectify_left/right (:209-218), baseline/bf (:195-200).

    rectify_left/right recompute the map arithmetic *inside* the jitted
    gather (in-program indices ride XLA's fast gather lowering; opaque
    precomputed map arrays are ~1000× slower on TPU — see
    camera.undistort_image). ``map_left/map_right`` remain available for
    inspection/off-device use.
    """

    k1: np.ndarray
    d1: Optional[np.ndarray]
    k2: np.ndarray
    d2: Optional[np.ndarray]
    image_size: Tuple[int, int]
    r1: np.ndarray
    r2: np.ndarray
    p1: np.ndarray
    p2: np.ndarray
    q: np.ndarray

    @classmethod
    def from_calib(
        cls,
        k1: np.ndarray, d1: Optional[np.ndarray],
        k2: np.ndarray, d2: Optional[np.ndarray],
        image_size: Tuple[int, int],
        r: np.ndarray, t: np.ndarray,
    ) -> "StereoRectifier":
        r1, r2, p1, p2, q = stereo_rectify(k1, d1, k2, d2, image_size, r, t)
        return cls(k1=np.asarray(k1, np.float64), d1=d1,
                   k2=np.asarray(k2, np.float64), d2=d2,
                   image_size=tuple(image_size),
                   r1=r1, r2=r2, p1=p1, p2=p2, q=q)

    @property
    def map_left(self) -> Tuple[jax.Array, jax.Array]:
        return init_undistort_rectify_map(
            self.k1, self.d1, self.r1, self.p1, self.image_size)

    @property
    def map_right(self) -> Tuple[jax.Array, jax.Array]:
        return init_undistort_rectify_map(
            self.k2, self.d2, self.r2, self.p2, self.image_size)

    @property
    def baseline(self) -> float:
        """Metric baseline |B| of the rectified pair."""
        f = self.p2[0, 0]
        off = self.p2[0, 3] if abs(self.p2[0, 3]) > 0 else self.p2[1, 3]
        return float(abs(off) / f)

    @property
    def bf(self) -> float:
        """focal × baseline (the stereo-depth constant)."""
        return float(self.p2[0, 0] * self.baseline)

    def _rectify(self, img, k, dist, r_rect, p_new, mode):
        mx, my = init_undistort_rectify_map(
            k, dist, r_rect, p_new, self.image_size)
        return remap(img, mx, my, mode)

    def rectify_left(self, img: jax.Array, mode: str = "bilinear") -> jax.Array:
        return self._rectify(img, self.k1, self.d1, self.r1, self.p1, mode)

    def rectify_right(self, img: jax.Array, mode: str = "bilinear") -> jax.Array:
        return self._rectify(img, self.k2, self.d2, self.r2, self.p2, mode)
