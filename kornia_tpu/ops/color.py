"""Color-space conversions (reference: kornia-imgproc/src/color/).

Semantics follow the reference's contract of OpenCV compatibility
(kornia-imgproc documents per-conversion byte-exactness vs cv2 in
benchmarks.md). Conventions:

* f32 images are RGB in [0, 1] unless stated. HSV/HLS hue is in degrees
  [0, 360) for f32 (cv2 convention) and [0, 180) for u8.
* u8 grayscale uses cv2's exact fixed-point weights
  ``(R*4899 + G*9617 + B*1868 + 8192) >> 14`` so the result is
  byte-identical to cv2 (the contract the reference asserts per kernel in
  kornia-imgproc/src/cuda/mod.rs:8-53).
* Lab/Luv/XYZ use sRGB (D65) with the linear-light transfer function,
  matching cv2's f32 path (kornia-imgproc/src/color/cie.rs).

All functions are batch-polymorphic over leading dims: (..., H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _matvec3(x: jax.Array, m) -> jax.Array:
    """Apply a 3×3 color matrix along the last axis with *elementwise* ops.

    Deliberately not an einsum: a 3-wide contraction can't tile the MXU and
    would run at bf16 default precision on TPU — nine VPU multiply-adds are
    both faster and exactly f32.
    """
    c0, c1, c2 = x[..., 0], x[..., 1], x[..., 2]
    rows = [m[i][0] * c0 + m[i][1] * c1 + m[i][2] * c2 for i in range(3)]
    return jnp.stack(rows, axis=-1)


def _is_u8(x) -> bool:
    return x.dtype == jnp.uint8


def _to_f32_unit(x) -> jax.Array:
    """u8 → f32 in [0,1]; f32 passes through."""
    if _is_u8(x):
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x.astype(jnp.float32)


def _from_f32_unit(x, like) -> jax.Array:
    if _is_u8(like):
        return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    return x.astype(like.dtype)


# --------------------------------------------------------------------------
# grayscale (reference color/gray/)
# --------------------------------------------------------------------------

# ITU-R BT.601 luma weights.
_GRAY_W = (0.299, 0.587, 0.114)


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """(..., H, W, 3) → (..., H, W, 1). u8 path is byte-exact with cv2."""
    if _is_u8(rgb):
        r = rgb[..., 0].astype(jnp.int32)
        g = rgb[..., 1].astype(jnp.int32)
        b = rgb[..., 2].astype(jnp.int32)
        # cv2's fixed-point: round(w * 2^14) weights, rounding add 1<<13.
        y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
        return y.astype(jnp.uint8)[..., None]
    w = jnp.asarray(_GRAY_W, dtype=jnp.float32)
    y = rgb[..., 0] * w[0] + rgb[..., 1] * w[1] + rgb[..., 2] * w[2]
    return y.astype(rgb.dtype)[..., None]


def bgr_to_gray(bgr: jax.Array) -> jax.Array:
    return rgb_to_gray(bgr[..., ::-1])


def gray_to_rgb(gray: jax.Array) -> jax.Array:
    """(..., H, W, 1) → (..., H, W, 3)."""
    return jnp.broadcast_to(gray, gray.shape[:-1] + (3,))


# --------------------------------------------------------------------------
# channel shuffles / alpha
# --------------------------------------------------------------------------


def rgb_to_bgr(rgb: jax.Array) -> jax.Array:
    return rgb[..., ::-1]


bgr_to_rgb = rgb_to_bgr


def rgb_to_rgba(rgb: jax.Array, alpha=None) -> jax.Array:
    if alpha is None:
        alpha = 255 if _is_u8(rgb) else 1.0
    a = jnp.full(rgb.shape[:-1] + (1,), alpha, dtype=rgb.dtype)
    return jnp.concatenate([rgb, a], axis=-1)


def rgba_to_rgb(rgba: jax.Array) -> jax.Array:
    return rgba[..., :3]


def bgra_to_rgba(bgra: jax.Array) -> jax.Array:
    return jnp.concatenate([bgra[..., 2::-1], bgra[..., 3:4]], axis=-1)


# --------------------------------------------------------------------------
# HSV / HLS (OpenCV conventions; reference color/hsv.rs, hls.rs)
# --------------------------------------------------------------------------


def _hue_from_maxmin(r, g, b, vmax, diff):
    """Shared hue computation, degrees in [0, 360)."""
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        vmax == r,
        60.0 * (g - b) / safe,
        jnp.where(vmax == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff > 0, h, 0.0)
    return jnp.where(h < 0, h + 360.0, h)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """f32: H∈[0,360), S,V∈[0,1]. u8: H∈[0,180), S,V∈[0,255] (cv2)."""
    x = _to_f32_unit(rgb)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = vmax - vmin
    h = _hue_from_maxmin(r, g, b, vmax, diff)
    s = jnp.where(vmax > 0, diff / jnp.where(vmax > 0, vmax, 1.0), 0.0)
    if _is_u8(rgb):
        out = jnp.stack([h * 0.5, s * 255.0, vmax * 255.0], axis=-1)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.stack([h, s, vmax], axis=-1).astype(rgb.dtype)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    if _is_u8(hsv):
        h = hsv[..., 0].astype(jnp.float32) * 2.0
        s = hsv[..., 1].astype(jnp.float32) / 255.0
        v = hsv[..., 2].astype(jnp.float32) / 255.0
    else:
        h = hsv[..., 0].astype(jnp.float32)
        s = hsv[..., 1].astype(jnp.float32)
        v = hsv[..., 2].astype(jnp.float32)
    h = (h / 60.0) % 6.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    out = jnp.stack([r, g, b], axis=-1)
    return _from_f32_unit(out, hsv)


def rgb_to_hls(rgb: jax.Array) -> jax.Array:
    """f32: H∈[0,360), L,S∈[0,1]. u8 scaled like cv2 (H/2, L*255, S*255)."""
    x = _to_f32_unit(rgb)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = vmax - vmin
    l = 0.5 * (vmax + vmin)
    h = _hue_from_maxmin(r, g, b, vmax, diff)
    denom = jnp.where(l < 0.5, vmax + vmin, 2.0 - vmax - vmin)
    s = jnp.where(diff > 0, diff / jnp.where(denom > 0, denom, 1.0), 0.0)
    if _is_u8(rgb):
        out = jnp.stack([h * 0.5, l * 255.0, s * 255.0], axis=-1)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.stack([h, l, s], axis=-1).astype(rgb.dtype)


def hls_to_rgb(hls: jax.Array) -> jax.Array:
    if _is_u8(hls):
        h = hls[..., 0].astype(jnp.float32) * 2.0
        l = hls[..., 1].astype(jnp.float32) / 255.0
        s = hls[..., 2].astype(jnp.float32) / 255.0
    else:
        h, l, s = (hls[..., i].astype(jnp.float32) for i in range(3))
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = (h / 60.0) % 6.0
    xcomp = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    i = jnp.floor(hp).astype(jnp.int32)
    z = jnp.zeros_like(c)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [c, xcomp, z, z, xcomp], c)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [xcomp, c, c, xcomp, z], z)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [z, z, xcomp, c, c], xcomp)
    m = l - 0.5 * c
    out = jnp.stack([r + m, g + m, b + m], axis=-1)
    return _from_f32_unit(out, hls)


# --------------------------------------------------------------------------
# CIE XYZ / Lab / Luv (sRGB D65; reference color/cie/)
# --------------------------------------------------------------------------

# sRGB → XYZ (D65) matrix, rows = X,Y,Z.
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875991, 0.041556),
    (0.055648, -0.204043, 1.057311),
)
# D65 reference white.
_WHITE = (0.950456, 1.0, 1.088754)


def _srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def rgb_to_xyz(rgb: jax.Array, *, linear_input: bool = True) -> jax.Array:
    """cv2 treats f32 RGB as already-linear for XYZ; Lab applies gamma."""
    x = _to_f32_unit(rgb)
    if not linear_input:
        x = _srgb_to_linear(x)
    out = _matvec3(x, _RGB2XYZ)
    return _from_f32_unit(out, rgb) if _is_u8(rgb) else out.astype(rgb.dtype)


def xyz_to_rgb(xyz: jax.Array, *, linear_output: bool = True) -> jax.Array:
    x = xyz.astype(jnp.float32)
    if _is_u8(xyz):
        x = x / 255.0
    out = _matvec3(x, _XYZ2RGB)
    if not linear_output:
        out = _linear_to_srgb(out)
    out = jnp.clip(out, 0.0, 1.0)
    return _from_f32_unit(out, xyz)


def _lab_f(t):
    # cv2 threshold 0.008856, slope 7.787, offset 16/116
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(t):
    t3 = t**3
    return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """f32: L∈[0,100], a,b≈[-127,127] (cv2). u8 scaled: L*255/100, a+128, b+128."""
    x = _to_f32_unit(rgb)
    x = _srgb_to_linear(x)
    xyz = _matvec3(x, _RGB2XYZ)
    xn = xyz[..., 0] / _WHITE[0]
    yn = xyz[..., 1] / _WHITE[1]
    zn = xyz[..., 2] / _WHITE[2]
    fx, fy, fz = _lab_f(xn), _lab_f(yn), _lab_f(zn)
    l = jnp.where(yn > 0.008856, 116.0 * jnp.cbrt(yn) - 16.0, 903.3 * yn)
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    if _is_u8(rgb):
        out = jnp.stack([l * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.stack([l, a, b], axis=-1).astype(rgb.dtype)


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    if _is_u8(lab):
        l = lab[..., 0].astype(jnp.float32) * (100.0 / 255.0)
        a = lab[..., 1].astype(jnp.float32) - 128.0
        b = lab[..., 2].astype(jnp.float32) - 128.0
    else:
        l, a, b = (lab[..., i].astype(jnp.float32) for i in range(3))
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xn = _lab_f_inv(fx) * _WHITE[0]
    yn = jnp.where(l > 903.3 * 0.008856, fy**3, l / 903.3) * _WHITE[1]
    zn = _lab_f_inv(fz) * _WHITE[2]
    xyz = jnp.stack([xn, yn, zn], axis=-1)
    lin = _matvec3(xyz, _XYZ2RGB)
    out = jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)
    return _from_f32_unit(out, lab)


def rgb_to_luv(rgb: jax.Array) -> jax.Array:
    """CIE L*u*v* (cv2 f32 convention; u8 scaled per cv2)."""
    x = _srgb_to_linear(_to_f32_unit(rgb))
    xyz = _matvec3(x, _RGB2XYZ)
    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    l = jnp.where(Y > 0.008856, 116.0 * jnp.cbrt(Y) - 16.0, 903.3 * Y)
    denom = X + 15.0 * Y + 3.0 * Z
    safe = jnp.where(denom > 0, denom, 1.0)
    up = 4.0 * X / safe
    vp = 9.0 * Y / safe
    un = 4.0 * _WHITE[0] / (_WHITE[0] + 15.0 + 3.0 * _WHITE[2])
    vn = 9.0 / (_WHITE[0] + 15.0 + 3.0 * _WHITE[2])
    u = 13.0 * l * (up - un)
    v = 13.0 * l * (vp - vn)
    if _is_u8(rgb):
        out = jnp.stack(
            [l * 255.0 / 100.0, (u + 134.0) * 255.0 / 354.0, (v + 140.0) * 255.0 / 262.0],
            axis=-1,
        )
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.stack([l, u, v], axis=-1).astype(rgb.dtype)


def luv_to_rgb(luv: jax.Array) -> jax.Array:
    if _is_u8(luv):
        l = luv[..., 0].astype(jnp.float32) * (100.0 / 255.0)
        u = luv[..., 1].astype(jnp.float32) * (354.0 / 255.0) - 134.0
        v = luv[..., 2].astype(jnp.float32) * (262.0 / 255.0) - 140.0
    else:
        l, u, v = (luv[..., i].astype(jnp.float32) for i in range(3))
    un = 4.0 * _WHITE[0] / (_WHITE[0] + 15.0 + 3.0 * _WHITE[2])
    vn = 9.0 / (_WHITE[0] + 15.0 + 3.0 * _WHITE[2])
    safe_l = jnp.where(l > 0, l, 1.0)
    up = u / (13.0 * safe_l) + un
    vp = v / (13.0 * safe_l) + vn
    Y = jnp.where(l > 8.0, ((l + 16.0) / 116.0) ** 3, l / 903.3)
    safe_vp = jnp.where(vp != 0, vp, 1.0)
    X = jnp.where(l > 0, Y * 9.0 * up / (4.0 * safe_vp), 0.0)
    Z = jnp.where(l > 0, Y * (12.0 - 3.0 * up - 20.0 * vp) / (4.0 * safe_vp), 0.0)
    xyz = jnp.stack([X, Y, Z], axis=-1)
    out = jnp.clip(_linear_to_srgb(_matvec3(xyz, _XYZ2RGB)), 0.0, 1.0)
    return _from_f32_unit(out, luv)


# --------------------------------------------------------------------------
# analog YUV (kornia convention; packed/planar video formats in ops/yuv.py)
# --------------------------------------------------------------------------

_RGB2YUV = (
    (0.299, 0.587, 0.114),
    (-0.14713, -0.28886, 0.436),
    (0.615, -0.51499, -0.10001),
)
_YUV2RGB = (
    (1.0, 0.0, 1.13983),
    (1.0, -0.39465, -0.58060),
    (1.0, 2.03211, 0.0),
)


def rgb_to_yuv(rgb: jax.Array) -> jax.Array:
    x = _to_f32_unit(rgb)
    out = _matvec3(x, _RGB2YUV)
    if _is_u8(rgb):
        out = out * 255.0 + jnp.asarray([0.0, 128.0, 128.0])
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.astype(rgb.dtype)


def yuv_to_rgb(yuv: jax.Array) -> jax.Array:
    if _is_u8(yuv):
        x = yuv.astype(jnp.float32)
        x = (x - jnp.asarray([0.0, 128.0, 128.0])) / 255.0
    else:
        x = yuv.astype(jnp.float32)
    out = jnp.clip(_matvec3(x, _YUV2RGB), 0.0, 1.0)
    return _from_f32_unit(out, yuv)


# --------------------------------------------------------------------------
# sepia (reference color/sepia.rs)
# --------------------------------------------------------------------------

_SEPIA = (
    (0.393, 0.769, 0.189),
    (0.349, 0.686, 0.168),
    (0.272, 0.534, 0.131),
)


def sepia(rgb: jax.Array) -> jax.Array:
    x = _to_f32_unit(rgb)
    out = jnp.clip(_matvec3(x, _SEPIA), 0.0, 1.0)
    return _from_f32_unit(out, rgb)


# --------------------------------------------------------------------------
# colormaps (reference color/colormap.rs + generated LUTs)
# --------------------------------------------------------------------------


def _viridis_lut():
    """Viridis 256-entry LUT computed from the published polynomial fit."""
    import numpy as np

    # Anchor points of matplotlib viridis (subsampled); linear interp to 256.
    anchors = np.array(
        [
            [0.267004, 0.004874, 0.329415],
            [0.282623, 0.140926, 0.457517],
            [0.253935, 0.265254, 0.529983],
            [0.206756, 0.371758, 0.553117],
            [0.163625, 0.471133, 0.558148],
            [0.127568, 0.566949, 0.550556],
            [0.134692, 0.658636, 0.517649],
            [0.266941, 0.748751, 0.440573],
            [0.477504, 0.821444, 0.318195],
            [0.741388, 0.873449, 0.149561],
            [0.993248, 0.906157, 0.143936],
        ],
        dtype=np.float32,
    )
    xi = np.linspace(0.0, 1.0, 256)
    xp = np.linspace(0.0, 1.0, len(anchors))
    lut = np.stack([np.interp(xi, xp, anchors[:, c]) for c in range(3)], axis=-1)
    return (lut * 255.0).round().astype(np.uint8)


def _jet_lut():
    """OpenCV-style jet colormap from the piecewise-linear formula."""
    import numpy as np

    x = np.linspace(0.0, 1.0, 256)

    def ramp(v):
        return np.clip(1.5 - np.abs(v), 0.0, 1.0)

    r = ramp(4.0 * (x - 0.75))
    g = ramp(4.0 * (x - 0.5))
    b = ramp(4.0 * (x - 0.25))
    lut = np.stack([r, g, b], -1)
    return (lut * 255.0).round().astype(np.uint8)


def _turbo_lut():
    """Google Turbo colormap (published 6th-order polynomial fit)."""
    import numpy as np

    x = np.linspace(0.0, 1.0, 256)
    v = np.stack([np.ones_like(x), x, x**2, x**3, x**4, x**5], -1)
    kr = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                   -152.94239396, 59.28637943])
    kg = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                   4.27729857, 2.82956604])
    kb = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                   -89.90310912, 27.34824973])
    lut = np.stack([v @ kr, v @ kg, v @ kb], -1).clip(0, 1)
    return (lut * 255.0).round().astype(np.uint8)


def _hot_lut():
    import numpy as np

    x = np.linspace(0.0, 1.0, 256)
    r = np.clip(x / 0.4, 0, 1)
    g = np.clip((x - 0.4) / 0.4, 0, 1)
    b = np.clip((x - 0.8) / 0.2, 0, 1)
    lut = np.stack([r, g, b], -1)
    return (lut * 255.0).round().astype(np.uint8)


def _gray_lut():
    import numpy as np

    x = np.arange(256, dtype=np.uint8)
    return np.stack([x, x, x], -1)


def _formula_lut(fn):
    """256-entry u8 LUT from an (x in [0,1]) -> (r,g,b in [0,1]) fn."""
    import numpy as np

    def build():
        x = np.linspace(0.0, 1.0, 256)
        lut = np.stack(fn(x, np), -1).clip(0.0, 1.0)
        return (lut * 255.0).round().astype(np.uint8)

    return build


# MATLAB/OpenCV classic linear maps (public closed forms; reference
# colormap.rs ColormapType rows)
def _autumn(x, np):
    return np.ones_like(x), x, np.zeros_like(x)


def _winter(x, np):
    return np.zeros_like(x), x, 1.0 - 0.5 * x


def _spring(x, np):
    return np.ones_like(x), x, 1.0 - x


def _summer(x, np):
    return x, 0.5 + 0.5 * x, np.full_like(x, 0.4)


def _cool(x, np):
    return x, 1.0 - x, np.ones_like(x)


def _ocean(x, np):
    return np.clip(3 * x - 2, 0, 1), np.clip((3 * x - 1) / 2, 0, 1), x


def _bone(x, np):
    r = np.where(x < 0.75, 7 / 8 * x, 11 / 8 * x - 3 / 8)
    g = np.where(x < 0.375, 7 / 8 * x,
                 np.where(x < 0.75, 29 / 24 * x - 1 / 8,
                          7 / 8 * x + 1 / 8))
    b = np.where(x < 0.375, 29 / 24 * x, 7 / 8 * x + 1 / 8)
    return r, g, b


def _pink(x, np):
    # MATLAB pink = sqrt((2*gray + hot)/3)
    hr = np.clip(x / 0.4, 0, 1)
    hg = np.clip((x - 0.4) / 0.4, 0, 1)
    hb = np.clip((x - 0.8) / 0.2, 0, 1)
    return (np.sqrt((2 * x + hr) / 3), np.sqrt((2 * x + hg) / 3),
            np.sqrt((2 * x + hb) / 3))


def _hsv_map(x, np):
    h = x * 6.0
    r = np.clip(np.abs(h - 3.0) - 1.0, 0, 1)
    g = np.clip(2.0 - np.abs(h - 2.0), 0, 1)
    b = np.clip(2.0 - np.abs(h - 4.0), 0, 1)
    return r, g, b


def _rainbow(x, np):
    # violet -> blue -> green -> yellow -> red (reverse hue sweep)
    h = (1.0 - x) * 4.0 / 6.0 * 6.0  # hue 240deg..0deg
    r = np.clip(np.abs(h - 3.0) - 1.0, 0, 1)
    g = np.clip(2.0 - np.abs(h - 2.0), 0, 1)
    b = np.clip(2.0 - np.abs(h - 4.0), 0, 1)
    return r, g, b


def _deepgreen(x, np):
    # black -> deep green -> white ramp (OpenCV 4.x DEEPGREEN shape)
    return np.clip(2 * x - 1, 0, 1), x, np.clip(2 * x - 1, 0, 1) * 0.8 \
        + np.clip(3 * x - 2.4, 0, 1) * 0.2


def _matplotlib_lut(name):
    """Exact 256-entry LUT from matplotlib's published colormap data
    (perceptual families: magma/inferno/plasma/cividis/twilight/
    parula-alias). Gated on matplotlib being importable."""

    def build():
        import numpy as np

        try:
            import matplotlib
        except ImportError as e:  # pragma: no cover
            raise ValueError(
                f"colormap '{name}' needs matplotlib for its published "
                "LUT data") from e
        cmap = matplotlib.colormaps[name]
        lut = cmap(np.linspace(0.0, 1.0, 256))[:, :3]
        return (lut * 255.0).round().astype(np.uint8)

    return build


_COLORMAPS = {}
_LUT_BUILDERS = {
    "viridis": _viridis_lut,
    "jet": _jet_lut,
    "turbo": _turbo_lut,
    "hot": _hot_lut,
    "gray": _gray_lut,
    "autumn": _formula_lut(_autumn),
    "winter": _formula_lut(_winter),
    "spring": _formula_lut(_spring),
    "summer": _formula_lut(_summer),
    "cool": _formula_lut(_cool),
    "ocean": _formula_lut(_ocean),
    "bone": _formula_lut(_bone),
    "pink": _formula_lut(_pink),
    "hsv": _formula_lut(_hsv_map),
    "rainbow": _formula_lut(_rainbow),
    "deepgreen": _formula_lut(_deepgreen),
    "magma": _matplotlib_lut("magma"),
    "inferno": _matplotlib_lut("inferno"),
    "plasma": _matplotlib_lut("plasma"),
    "cividis": _matplotlib_lut("cividis"),
    "twilight": _matplotlib_lut("twilight"),
    # MATLAB parula is license-encumbered; matplotlib's viridis is the
    # standard open substitute and is what we alias it to.
    "parula": _matplotlib_lut("viridis"),
}


def apply_colormap(gray: jax.Array, name: str = "viridis") -> jax.Array:
    """Map (..., H, W) or (..., H, W, 1) u8/f32 gray to RGB u8 via LUT.

    The LUT cache holds HOST numpy arrays only: a cached device array
    would be captured as a jit closure constant, which costs ~34 ms per
    dispatch through the axon tunnel and degrades every later dispatch
    in the process (PERF_NOTES.md "captured-device-constant poison").
    The numpy LUT is folded in-trace for free.
    """
    if name not in _COLORMAPS:
        if name in _LUT_BUILDERS:
            _COLORMAPS[name] = _LUT_BUILDERS[name]()   # host numpy
        else:
            raise ValueError(f"unknown colormap: {name}; "
                             f"available: {sorted(_LUT_BUILDERS)}")
    lut = jnp.asarray(_COLORMAPS[name])
    if gray.ndim >= 3 and gray.shape[-1] == 1:
        gray = gray[..., 0]
    if gray.dtype == jnp.uint8:
        idx = gray.astype(jnp.int32)
    else:
        idx = jnp.clip(jnp.round(gray * 255.0), 0, 255).astype(jnp.int32)
    return lut[idx]
