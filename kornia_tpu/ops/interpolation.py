"""Shared interpolation samplers + remap (reference: kornia-imgproc/src/interpolation/).

``grid_sample`` gathers pixels at arbitrary (x, y) locations — the primitive
under warp_affine / warp_perspective / remap / undistortion. Coordinates are
in *pixel units* with the cv2 convention (pixel centers at integers).

Resize does NOT use this module: on TPU separable resize is expressed as two
band-matrix multiplications that ride the MXU (see kornia_tpu.ops.resize).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _gather_hw(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[..., iy, ix, :] where iy/ix are (...,) integer maps.

    img: (H, W, C); iy/ix: (Ho, Wo). Returns (Ho, Wo, C).
    Uses a flat 1-D gather which XLA lowers efficiently on TPU.
    """
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))


def _clamp_coords(iy, ix, h, w):
    return jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)


def _cubic_kernel(x: jax.Array, a: float = -0.75) -> jax.Array:
    """Keys cubic convolution kernel (cv2 uses a = -0.75)."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w1 = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    w2 = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def grid_sample(
    img: jax.Array,
    x: jax.Array,
    y: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    fill_value: float = 0.0,
) -> jax.Array:
    """Sample ``img`` (H, W, C) at pixel coords (x, y), each (Ho, Wo).

    padding_mode: "zeros" fills out-of-bounds with ``fill_value`` (cv2
    BORDER_CONSTANT); "border" clamps (BORDER_REPLICATE).
    Returns (Ho, Wo, C) float32.
    """
    h, w, _ = img.shape
    imgf = img.astype(jnp.float32)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        cy, cx = _clamp_coords(iy, ix, h, w)
        out = _gather_hw(imgf, cy, cx)
        if padding_mode == "zeros":
            out = jnp.where(inb[..., None], out, fill_value)
        return out

    if mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        acc = None
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
                iy, ix = y0i + dy, x0i + dx
                cy, cx = _clamp_coords(iy, ix, h, w)
                v = _gather_hw(imgf, cy, cx)
                if padding_mode == "zeros":
                    inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
                    v = jnp.where(inb[..., None], v, fill_value)
                acc = v * wgt[..., None] if acc is None else acc + v * wgt[..., None]
        if padding_mode == "zeros":
            # cv2 semantics: a sample whose *footprint center* is outside is
            # blended toward the constant; fully-outside gives the constant.
            pass
        return acc

    if mode == "bicubic":
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - jnp.floor(x)
        fy = y - jnp.floor(y)
        acc = None
        wsum = None
        for dy in range(-1, 3):
            wy = _cubic_kernel(fy - dy)
            for dx in range(-1, 3):
                wx = _cubic_kernel(fx - dx)
                wgt = wx * wy
                iy, ix = y0 + dy, x0 + dx
                cy, cx = _clamp_coords(iy, ix, h, w)
                v = _gather_hw(imgf, cy, cx)
                if padding_mode == "zeros":
                    inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
                    v = jnp.where(inb[..., None], v, fill_value)
                term = v * wgt[..., None]
                acc = term if acc is None else acc + term
        return acc

    raise ValueError(f"unknown interpolation mode: {mode}")


def remap(
    img: jax.Array,
    map_x: jax.Array,
    map_y: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    fill_value: float = 0.0,
    nsel: int = 8,
) -> jax.Array:
    """cv2.remap equivalent: dst(i,j) = src(map_y(i,j), map_x(i,j)).

    The workhorse for undistortion maps and stereo rectification
    (reference interpolation/remap.rs, calibration/distortion.rs:135).
    Preserves input dtype (u8 rounds + clamps).

    On TPU, bilinear/nearest with zeros/border padding ride the exact
    Pallas chunk kernel (ops.warp_pallas.remap_exact, ~0.4 ms at 1080p
    vs ~60 ms for the scalar-gather path); other modes and maps
    outside the kernel's window capacity use the gather formulation,
    as does the CPU backend (where XLA gathers are fast and
    interpret-mode kernels are not; KORNIA_TPU_WARP=pallas forces the
    kernel). ``nsel`` sizes the kernel's per-chunk row-candidate
    budget: smooth maps (undistortion, rectification: row spread <=
    nsel-2 per (8,128) chunk) can pass 4 for a ~1.5x faster kernel;
    maps that exceed it fall back to the exact-but-slow gather path
    automatically.
    """
    from kornia_tpu.ops.warp import _auto_method

    if (_auto_method() == "pallas"
            and mode in ("bilinear", "nearest")
            and padding_mode in ("zeros", "border")):
        from kornia_tpu.ops.warp_pallas import remap_exact

        return remap_exact(img, map_x, map_y, mode=mode,
                           padding_mode=padding_mode,
                           fill_value=fill_value, nsel=nsel)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    out = grid_sample(img, map_x, map_y, mode=mode, padding_mode=padding_mode, fill_value=fill_value)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    elif out.dtype != img.dtype:
        out = out.astype(img.dtype)
    if squeeze:
        out = out[..., 0]
    return out


def meshgrid_pixel(h: int, w: int) -> Tuple[jax.Array, jax.Array]:
    """(x, y) pixel-center coordinate maps of shape (h, w), float32.

    Built with broadcasted_iota (not ``broadcast_to`` of a 1-D arange):
    XLA's TPU gather lowering degrades ~700× when the index arithmetic
    roots in a degenerate-broadcast operand (measured on v5e — 70 ms vs
    0.1 ms for a 1080p bilinear warp).
    """
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return xx, yy
