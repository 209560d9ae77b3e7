"""Pixel-intensity enhancement (reference: kornia-imgproc/src/enhance.rs,
clahe.rs; color-jitter ops from kornia-py augmentations).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from kornia_tpu.ops import color as _color


def _finalize(out, dtype):
    if dtype == jnp.uint8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(dtype)


def add_weighted(a: jax.Array, alpha: float, b: jax.Array, beta: float, gamma: float) -> jax.Array:
    """cv2.addWeighted (reference enhance.rs add_weighted)."""
    out = a.astype(jnp.float32) * alpha + b.astype(jnp.float32) * beta + gamma
    return _finalize(out, a.dtype)


def adjust_brightness(img: jax.Array, factor: float) -> jax.Array:
    """Multiply intensity by ``factor`` (torchvision convention)."""
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    out = img.astype(jnp.float32) * factor
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_contrast(img: jax.Array, factor: float) -> jax.Array:
    """Blend with mean grayscale (torchvision convention)."""
    x = img.astype(jnp.float32)
    gray = _color.rgb_to_gray(img).astype(jnp.float32)
    mean = jnp.mean(gray)
    out = mean + factor * (x - mean)
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_saturation(img: jax.Array, factor: float) -> jax.Array:
    x = img.astype(jnp.float32)
    gray = _color.rgb_to_gray(img).astype(jnp.float32)
    out = gray + factor * (x - gray)
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    return _finalize(jnp.clip(out, 0.0, scale), img.dtype)


def adjust_hue(img: jax.Array, hue_deg: float) -> jax.Array:
    """Rotate hue by ``hue_deg`` degrees through HSV."""
    hsv = _color.rgb_to_hsv(img)
    if img.dtype == jnp.uint8:
        h = (hsv[..., 0].astype(jnp.float32) + hue_deg / 2.0) % 180.0
        hsv = hsv.at[..., 0].set(jnp.round(h).astype(jnp.uint8))
    else:
        h = (hsv[..., 0] + hue_deg) % 360.0
        hsv = hsv.at[..., 0].set(h)
    return _color.hsv_to_rgb(hsv)


def adjust_gamma(img: jax.Array, gamma: float, gain: float = 1.0) -> jax.Array:
    scale = 255.0 if img.dtype == jnp.uint8 else 1.0
    x = img.astype(jnp.float32) / scale
    out = gain * x**gamma
    return _finalize(jnp.clip(out, 0.0, 1.0) * scale, img.dtype)


def invert(img: jax.Array) -> jax.Array:
    if img.dtype == jnp.uint8:
        return (255 - img.astype(jnp.int32)).astype(jnp.uint8)
    return (1.0 - img).astype(img.dtype)


def equalize_hist(gray: jax.Array) -> jax.Array:
    """Global histogram equalization on u8 grayscale (cv2.equalizeHist)."""
    flat = gray.reshape(-1)
    hist = jnp.bincount(flat.astype(jnp.int32), length=256)
    cdf = jnp.cumsum(hist)
    n = flat.shape[0]
    # cv2: lut = round((cdf - cdf_min) / (N - cdf_min) * 255)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, n + 1))
    denom = jnp.maximum(n - cdf_min, 1)
    lut = jnp.clip(jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0), 0, 255)
    return lut.astype(jnp.uint8)[gray.astype(jnp.int32)]


def clahe(
    gray: jax.Array, clip_limit: float = 40.0, grid: tuple = (8, 8)
) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (reference clahe.rs).

    TPU formulation — every stage gather/scatter-free:

    1. per-tile histograms as a BATCHED 16x16 digit one-hot MXU
       contraction (the ops/histogram.py trick, batched over tiles);
    2. clip + redistribute + cdf -> per-tile LUTs;
    3. the VERTICAL tile interpolation is folded into the LUTs first:
       a (H, gy) two-diagonal weight matmul yields per-row LUTs;
    4. the HORIZONTAL interpolation splits columns into half-tile-
       aligned bands (tile indices are constant inside a band), and
       the LUT lookup becomes a per-(row, band) one-hot value
       contraction — 0/1 and 0..255 operands are bf16-exact, f32
       accumulation, so the lookup is exact.

    The original formulation (dense (T, N, 256) f32 one-hot histograms
    + 4 per-pixel LUT gathers) measured 82.5 ms at 1080p — the gathers
    run at scalar rate; this one measures ~1 ms (slope method, v5e).
    """
    h, w = gray.shape[:2]
    gy, gx = grid
    th, tw = -(-h // gy), -(-w // gx)  # ceil tile size
    ph, pw = th * gy - h, tw * gx - w
    # cv2 extends to a tile multiple with BORDER_REFLECT_101
    g = jnp.pad(gray, ((0, ph), (0, pw)),
                mode="reflect" if max(ph, pw) else "constant")
    tiles = g.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3) \
        .reshape(gy * gx, th * tw).astype(jnp.int32)

    # (1) batched digit-contraction histograms: (T, 256)
    vals16 = jnp.arange(16, dtype=jnp.int32)
    hi1 = ((tiles >> 4)[..., None] == vals16).astype(jnp.bfloat16)
    lo1 = ((tiles & 15)[..., None] == vals16).astype(jnp.bfloat16)
    hists = jax.lax.dot_general(
        hi1, lo1, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(gy * gx, 256)

    # (2) cv2's exact integer clip + redistribution (clahe.cpp): clip
    # at floor(max(clip*area/256, 1)); excess // 256 goes to every
    # bin; the remainder +1s bins 0, s, 2s, ... (s = 256 // residual)
    hists = hists.astype(jnp.int32)
    limit = max(int(clip_limit * (th * tw) / 256.0), 1)
    excess = jnp.sum(jnp.maximum(hists - limit, 0), axis=1,
                     keepdims=True)
    hists = jnp.minimum(hists, limit) + excess // 256
    residual = excess % 256                                  # (T, 1)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    idx = jnp.arange(256, dtype=jnp.int32)[None, :]
    is_mult = (idx % step) == 0
    rank = jnp.cumsum(is_mult.astype(jnp.int32), axis=1) - 1
    hists = hists + (is_mult & (rank < residual)).astype(jnp.int32)
    cdfs = jnp.cumsum(hists, axis=1).astype(jnp.float32)
    luts = jnp.clip(jnp.round(cdfs * (255.0 / (th * tw))), 0, 255)
    luts = luts.reshape(gy, gx, 256)

    # (3) per-row corner LUTs via 0/1 one-hot matmuls (exact: the
    # operands stay integer-valued 0..255, bf16-representable)
    yy = jnp.arange(h, dtype=jnp.float32)
    ty = yy / th - 0.5          # cv2 clahe.cpp: y*inv_th - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, gy - 1)
    y1 = jnp.minimum(y0 + 1, gy - 1)
    fy = jnp.clip(ty - y0, 0.0, 1.0)
    rows = jnp.arange(gy, dtype=jnp.float32)
    w0 = (rows[None, :] == y0[:, None]).astype(jnp.float32)
    w1 = (rows[None, :] == y1[:, None]).astype(jnp.float32)
    flat = luts.reshape(gy, gx * 256)
    lut_t = (w0 @ flat).reshape(h, gx, 256)    # top-row tile LUTs
    lut_b = (w1 @ flat).reshape(h, gx, 256)    # bottom-row tile LUTs

    # (4) half-tile-aligned column bands: within band k the tile pair
    # (x0, x1) = (k-1, k) clipped is constant, so the LUT lookup is a
    # per-(row, band) one-hot value contraction.
    lpad = tw // 2
    k = gx + 1
    gp = jnp.pad(g[:h], ((0, 0), (lpad, k * tw - lpad - tw * gx)),
                 mode="edge")
    bands = gp.reshape(h, k, tw).astype(jnp.int32)
    x0k = np.clip(np.arange(k) - 1, 0, gx - 1)
    x1k = np.clip(np.arange(k), 0, gx - 1)
    # the lookup factors through the 4-bit digits like the histogram:
    # LUT[v] = Σ_h Σ_l 1[hi=h] 1[lo=l] M[h, l] with M = LUT as 16x16 —
    # a 16-wide contraction + a 16-wide masked reduce instead of one
    # 256-wide one-hot (which materializes at (H, K, tw, 256))
    vals16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((bands >> 4)[..., None] == vals16).astype(jnp.bfloat16)
    oh_lo = ((bands & 15)[..., None] == vals16).astype(jnp.bfloat16)

    def contract(lut_hkv):
        m = lut_hkv.reshape(h, k, 16, 16).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            oh_lo, m, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)    # (H, K, tw, 16hi)
        return jnp.sum(t1 * oh_hi.astype(jnp.float32), axis=-1)

    o00 = contract(lut_t[:, x0k, :])
    o01 = contract(lut_t[:, x1k, :])
    o10 = contract(lut_b[:, x0k, :])
    o11 = contract(lut_b[:, x1k, :])

    # horizontal weight of tile x1 at band offset j (x = k*tw-lpad+j):
    # cv2: fx = x/tw - 0.5 - (k-1) = (j-lpad)/tw + 0.5
    fx = jnp.clip((jnp.arange(tw, dtype=jnp.float32) - lpad)
                  / tw + 0.5, 0.0, 1.0)[None, None, :]
    fyv = fy[:, None, None]
    top = o00 * (1.0 - fx) + o01 * fx
    bot = o10 * (1.0 - fx) + o11 * fx
    out = top * (1.0 - fyv) + bot * fyv
    out = out.reshape(h, k * tw)[:, lpad:lpad + w]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
