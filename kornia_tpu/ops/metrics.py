"""Image-pair error metrics (reference: kornia-imgproc/src/metrics/)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def huber(a: jax.Array, b: jax.Array, delta: float = 1.0) -> jax.Array:
    d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    quad = 0.5 * d * d
    lin = delta * (d - 0.5 * delta)
    return jnp.mean(jnp.where(d <= delta, quad, lin))


def psnr(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(m, 1e-12))


def ssim(a: jax.Array, b: jax.Array, max_val: float = 255.0, ksize: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM with a Gaussian window (Wang et al. 2004)."""
    from kornia_tpu.ops.filters import _conv_sep, gaussian_kernel1d

    def prep(x):
        x = x.astype(jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        return x

    x, y = prep(a), prep(b)
    k = gaussian_kernel1d(ksize, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _conv_sep(x, k, k)
    mu_y = _conv_sep(y, k, k)
    sxx = _conv_sep(x * x, k, k) - mu_x * mu_x
    syy = _conv_sep(y * y, k, k) - mu_y * mu_y
    sxy = _conv_sep(x * y, k, k) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sxx + syy + c2)
    return jnp.mean(num / den)
