"""Corner / blob response functions
(reference: kornia-imgproc/src/features/responses.rs).

Dense maps computed with separable convolutions; keypoint-local variants are
gathers at keypoint locations. All return float32 (H, W).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.ops.filters import _conv_sep, gaussian_kernel1d, sobel


def _grads(gray_f: jax.Array, kind: str = "sobel"):
    if kind == "central":
        # central differences (edge-replicated) — the gradient
        # harris_at_windows uses; keeps dense-map rankings consistent
        # with the windowed evaluator
        p = jnp.pad(gray_f, 1, mode="edge")
        h, w = gray_f.shape
        gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
        gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
        return gx, gy
    gx = sobel(gray_f[..., None], 1, 0)[..., 0]
    gy = sobel(gray_f[..., None], 0, 1)[..., 0]
    return gx, gy


def _window_kernel(block_size: int, sigma: float, window: str) -> np.ndarray:
    if window == "box":
        # cv2.cornerHarris semantics: box sum over blockSize
        return np.ones(block_size, np.float32)
    return gaussian_kernel1d(block_size, sigma)


def harris_response(
    gray: jax.Array, k: float = 0.04, block_size: int = 5, sigma: float = 1.0,
    window: str = "gaussian", grad: str = "sobel",
) -> jax.Array:
    """Harris cornerness det(M) − k·tr(M)² (reference responses.rs:111-333).

    ``window="box"`` reproduces cv2.cornerHarris's box-summed structure
    tensor; "gaussian" is the reference's (and the classic) weighting.
    ``grad="central"`` uses central differences — the same gradient as
    :func:`harris_at_windows`, so the dense map ranks keypoints
    identically to the windowed evaluator (away from borders).
    """
    x = gray.astype(jnp.float32)
    gx, gy = _grads(x, grad)
    kern = _window_kernel(block_size, sigma, window)
    sxx = _conv_sep((gx * gx)[..., None], kern, kern)[..., 0]
    syy = _conv_sep((gy * gy)[..., None], kern, kern)[..., 0]
    sxy = _conv_sep((gx * gy)[..., None], kern, kern)[..., 0]
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def shi_tomasi_response(gray: jax.Array, block_size: int = 5, sigma: float = 1.0) -> jax.Array:
    """GFTT / min-eigenvalue response (reference responses.rs:650)."""
    x = gray.astype(jnp.float32)
    gx, gy = _grads(x)
    kern = gaussian_kernel1d(block_size, sigma)
    sxx = _conv_sep((gx * gx)[..., None], kern, kern)[..., 0]
    syy = _conv_sep((gy * gy)[..., None], kern, kern)[..., 0]
    sxy = _conv_sep((gx * gy)[..., None], kern, kern)[..., 0]
    half_tr = 0.5 * (sxx + syy)
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - (sxx * syy - sxy * sxy), 0.0))
    return half_tr - disc


def hessian_response(gray: jax.Array) -> jax.Array:
    """det(Hessian) blob response (reference responses.rs:43)."""
    x = gray.astype(jnp.float32)
    p = jnp.pad(x, 1, mode="edge")
    h, w = x.shape
    c = lambda dy, dx: p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
    dxx = c(0, 1) - 2.0 * x + c(0, -1)
    dyy = c(1, 0) - 2.0 * x + c(-1, 0)
    dxy = 0.25 * (c(1, 1) - c(1, -1) - c(-1, 1) + c(-1, -1))
    return dxx * dyy - dxy * dxy


def dog_response(gray: jax.Array, sigma1: float = 1.0, sigma2: float = 1.6, ksize: int = 9) -> jax.Array:
    """Difference-of-Gaussians (reference responses.rs:519)."""
    x = gray.astype(jnp.float32)[..., None]
    k1 = gaussian_kernel1d(ksize, sigma1)
    k2 = gaussian_kernel1d(ksize, sigma2)
    return (_conv_sep(x, k2, k2) - _conv_sep(x, k1, k1))[..., 0]


def harris_at(gray: jax.Array, xy: jax.Array, k: float = 0.04, block_size: int = 7) -> jax.Array:
    """Harris response sampled at (N, 2) integer keypoints — the reference
    evaluates Harris only at FAST keypoints (extractor.rs per-KP 5×5 preload);
    on TPU the dense map plus a gather is cheaper than scattered compute."""
    resp = harris_response(gray, k=k, block_size=block_size)
    ix = jnp.clip(xy[:, 0].astype(jnp.int32), 0, gray.shape[1] - 1)
    iy = jnp.clip(xy[:, 1].astype(jnp.int32), 0, gray.shape[0] - 1)
    return resp[iy, ix]


def harris_at_windows(gray_f: jax.Array, xy_int: jax.Array,
                      k: float = 0.04, block_size: int = 5,
                      sigma: float = 1.0) -> jax.Array:
    """Harris response at (N, 2) integer keypoints computed from
    VMEM-resident keypoint windows instead of a dense response map.

    Same structure-tensor math as :func:`harris_response` restricted to
    a (block+2)^2 patch per keypoint — ranking-consistent with the
    dense version away from borders but ~3x cheaper on the ORB path
    (the dense map cost ~1.3 ms/frame across 4 pyramid levels at
    752x480; windows ride ops.pallas_kernels.extract_windows_pallas).
    """
    from kornia_tpu.ops.pallas_kernels import extract_windows_pallas

    half = block_size // 2
    r = half + 1                       # + gradient halo
    win = extract_windows_pallas(gray_f, xy_int)       # (N, 48, 128)
    patch = win[:, 24 - r: 24 + r + 1, 64 - r: 64 + r + 1]
    gx = 0.5 * (patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2])
    gy = 0.5 * (patch[:, 2:, 1:-1] - patch[:, :-2, 1:-1])
    w1 = gaussian_kernel1d(block_size, sigma)
    w2 = np.outer(w1, w1).astype(np.float32)
    sxx = jnp.einsum("nij,ij->n", gx * gx, w2)
    syy = jnp.einsum("nij,ij->n", gy * gy, w2)
    sxy = jnp.einsum("nij,ij->n", gx * gy, w2)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr
