"""Image pyramids (reference: kornia-imgproc/src/resize/pyramid.rs, pyramid.rs).

``pyrdown``/``pyrup`` use the cv2 5-tap binomial kernel. The ORB scale
pyramid uses the reference's per-octave scale factor with bilinear resize
(resize/pyramid.rs exact-2× fast paths are subsumed by the matmul resize).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.ops.filters import _conv_sep, _finalize, _with_channels
from kornia_tpu.ops.resize import resize

_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _decimate2(x: jax.Array) -> jax.Array:
    """x[..., ::2, ::2, :] without the fused 2-axis strided slice.

    A single strided slice per axis lowers to a cheap relayout (~4 µs
    at 480p), but XLA fuses ``[::2, ::2]`` into one op that runs at
    scalar rate on TPU (measured 0.91 ms at 480p — 300× the BW floor;
    this was the entire LK-precompute budget). Rows use a sublane
    stride; lanes use the even-pad + reshape + index-0 form, which XLA
    does NOT re-fuse into the pathological path (5 µs measured)."""
    h, w, c = x.shape[-3:]
    rows = x[..., ::2, :, :]
    if w % 2:
        rows = jnp.pad(rows, [(0, 0)] * (rows.ndim - 2) + [(0, 1), (0, 0)])
    lead = rows.shape[:-3]
    h2 = rows.shape[-3]
    return rows.reshape(lead + (h2, (w + 1) // 2, 2, c))[..., 0, :]


def pyrdown(img: jax.Array) -> jax.Array:
    """Gaussian blur (5-tap binomial) + drop every other pixel (cv2.pyrDown)."""
    x, squeeze = _with_channels(img)
    blurred = _conv_sep(x, _PYR_K, _PYR_K, "reflect")
    out = _finalize(_decimate2(blurred), img.dtype)
    return out[..., 0] if squeeze else out


def pyrup(img: jax.Array) -> jax.Array:
    """Zero-upsample 2× + blur with 4·kernel (cv2.pyrUp)."""
    x, squeeze = _with_channels(img)
    h, w, c = x.shape[-3:]
    lead = x.shape[:-3]
    up = jnp.zeros(lead + (h * 2, w * 2, c), jnp.float32)
    up = up.at[..., ::2, ::2, :].set(x.astype(jnp.float32))
    out = _conv_sep(up, _PYR_K * 2.0, _PYR_K * 2.0, "reflect")
    out = _finalize(out, img.dtype)
    return out[..., 0] if squeeze else out


def gaussian_pyramid(img: jax.Array, levels: int) -> List[jax.Array]:
    out = [img]
    for _ in range(levels - 1):
        out.append(pyrdown(out[-1]))
    return out


def scale_pyramid(
    img: jax.Array, n_levels: int, scale_factor: float = 1.2
) -> List[jax.Array]:
    """ORB-style geometric pyramid (reference orb/extractor.rs pyramid).

    Level i has size round(dim / scale_factor**i); bilinear, chained from the
    previous level like ORB-SLAM3 (each level resized from level i-1, not 0).
    """
    h, w = img.shape[-3] if img.ndim >= 3 else img.shape[-2], 0
    if img.ndim >= 3:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]
    levels = [img]
    for i in range(1, n_levels):
        s = scale_factor**i
        nh, nw = int(round(h / s)), int(round(w / s))
        levels.append(resize(levels[-1], (nh, nw), mode="bilinear"))
    return levels
