"""Depth-map operations (reference: kornia-py depth.rs — sample_depth
:239 — plus the standard depth geometry the SLAM loop needs)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_depth(
    depth: jax.Array, xy: jax.Array,
    mode: str = "nearest",
    min_depth: float = 1e-6,
    window: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Sample a (H, W) depth map at (N, 2) pixel locations.

    Returns (values (N,), valid (N,) bool). Invalid = out of bounds or
    depth <= min_depth. `mode`: "nearest" or "bilinear" (bilinear treats
    holes as invalid — any zero corner invalidates, matching the
    reference's conservative sampling). `window` > 0 takes the median of
    valid depths in a (2w+1)² patch (nearest mode only).
    """
    h, w = depth.shape
    x = xy[:, 0]
    y = xy[:, 1]
    inb = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        if window > 0:
            r = jnp.arange(-window, window + 1)
            oy, ox = jnp.meshgrid(r, r, indexing="ij")
            ys = jnp.clip(yi[:, None] + oy.reshape(-1)[None, :], 0, h - 1)
            xs = jnp.clip(xi[:, None] + ox.reshape(-1)[None, :], 0, w - 1)
            patch = depth[ys, xs]  # (N, (2w+1)²)
            ok = patch > min_depth
            big = jnp.where(ok, patch, jnp.inf)
            med = jnp.nanmedian(jnp.where(ok, patch, jnp.nan), axis=1)
            val = jnp.where(jnp.any(ok, axis=1), med, 0.0)
            del big
        else:
            val = depth[yi, xi]
        valid = inb & (val > min_depth)
        return val.astype(jnp.float32), valid

    if mode == "bilinear":
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        c00 = depth[y0, x0]
        c01 = depth[y0, x0 + 1]
        c10 = depth[y0 + 1, x0]
        c11 = depth[y0 + 1, x0 + 1]
        all_valid = ((c00 > min_depth) & (c01 > min_depth)
                     & (c10 > min_depth) & (c11 > min_depth))
        val = ((1 - fy) * ((1 - fx) * c00 + fx * c01)
               + fy * ((1 - fx) * c10 + fx * c11))
        return val.astype(jnp.float32), inb & all_valid

    raise ValueError(f"unknown mode {mode!r}")


def depth_to_3d(depth: jax.Array, k: jax.Array) -> jax.Array:
    """(H, W) depth → (H, W, 3) camera-frame points (invalid depth → 0)."""
    h, w = depth.shape
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    z = depth.astype(jnp.float32)
    x = (xs - cx) / fx * z
    y = (ys - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def depth_to_normals(depth: jax.Array, k: jax.Array) -> jax.Array:
    """Surface normals from central differences of the 3D map, unit
    length, camera-facing (n_z < 0 convention like kornia)."""
    pts = depth_to_3d(depth, k)
    dzdx = (jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)) / 2.0
    dzdy = (jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)) / 2.0
    n = jnp.cross(dzdx, dzdy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward the camera
    flip = jnp.sign(n[..., 2:3])
    return -n * jnp.where(flip == 0, 1.0, flip)


def warp_frame_depth(
    image_src: jax.Array, depth_dst: jax.Array,
    src_trans_dst: jax.Array, k: jax.Array,
) -> jax.Array:
    """Warp src image into the dst frame via dst's depth
    (kornia's warp_frame_depth): x_src = K·T·K⁻¹·[u·z, v·z, z]."""
    from kornia_tpu.ops.interpolation import remap

    pts = depth_to_3d(depth_dst, k)                     # dst cam frame
    r = src_trans_dst[:3, :3]
    t = src_trans_dst[:3, 3]
    src_pts = pts @ r.T + t
    z = jnp.maximum(src_pts[..., 2], 1e-9)
    u = src_pts[..., 0] / z * k[0, 0] + k[0, 2]
    v = src_pts[..., 1] / z * k[1, 1] + k[1, 2]
    return remap(image_src, u.astype(jnp.float32), v.astype(jnp.float32))
