"""Seeded random augmentation pipeline.

Capability parity with kornia-py's ``augmentations`` module
(augmentations.rs:41 — seeded random aug pipeline with ``set_seed``).
TPU-idiomatic: randomness flows through explicit jax PRNG keys (the
pipeline holds a key and splits per call — `set_seed` resets it), every
op is a pure jittable function over (H, W, C) u8/f32 images, and a whole
pipeline composes into ONE jitted program via :meth:`AugmentationPipeline.__call__`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from kornia_tpu.ops import enhance, filters, geometry_utils, warp


Aug = Callable[[jax.Array, jax.Array], jax.Array]  # (key, img) -> img


def _as_float(img: jax.Array) -> Tuple[jax.Array, bool]:
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0, True
    return img, False


def _restore(img: jax.Array, was_u8: bool) -> jax.Array:
    if was_u8:
        return jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    return img


@dataclass(frozen=True)
class RandomHorizontalFlip:
    p: float = 0.5

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        flip = jax.random.bernoulli(key, self.p)
        return jax.lax.cond(flip, geometry_utils.hflip, lambda x: x, img)


@dataclass(frozen=True)
class RandomVerticalFlip:
    p: float = 0.5

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        flip = jax.random.bernoulli(key, self.p)
        return jax.lax.cond(flip, geometry_utils.vflip, lambda x: x, img)


@dataclass(frozen=True)
class ColorJitter:
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue_deg: float = 10.0

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        kb, kc, ks, kh = jax.random.split(key, 4)
        x, was_u8 = _as_float(img)
        b = 1.0 + jax.random.uniform(
            kb, minval=-self.brightness, maxval=self.brightness)
        c = 1.0 + jax.random.uniform(
            kc, minval=-self.contrast, maxval=self.contrast)
        x = jnp.clip(x * b, 0, 1)
        mean = jnp.mean(x, axis=(-3, -2, -1), keepdims=True)
        x = jnp.clip((x - mean) * c + mean, 0, 1)
        if img.ndim == 3 and img.shape[-1] == 3:
            s = 1.0 + jax.random.uniform(
                ks, minval=-self.saturation, maxval=self.saturation)
            gray = jnp.mean(x, axis=-1, keepdims=True)
            x = jnp.clip(gray + (x - gray) * s, 0, 1)
            h = jax.random.uniform(
                kh, minval=-self.hue_deg, maxval=self.hue_deg)
            x = enhance.adjust_hue(x, h)
        return _restore(x, was_u8)


@dataclass(frozen=True)
class RandomGaussianBlur:
    p: float = 0.5
    ksize: int = 5
    sigma_range: Tuple[float, float] = (0.3, 1.5)

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        kp, ks = jax.random.split(key)
        do = jax.random.bernoulli(kp, self.p)
        # static kernel size; random sigma folded in by blending two blurs
        lo = filters.gaussian_blur(img.astype(jnp.float32),
                                   (self.ksize, self.ksize),
                                   self.sigma_range[0])
        hi = filters.gaussian_blur(img.astype(jnp.float32),
                                   (self.ksize, self.ksize),
                                   self.sigma_range[1])
        a = jax.random.uniform(ks)
        blurred = lo * (1 - a) + hi * a
        out = jnp.where(do, blurred, img.astype(jnp.float32))
        if img.dtype == jnp.uint8:
            return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        return out.astype(img.dtype)


@dataclass(frozen=True)
class RandomAffine:
    degrees: float = 10.0
    translate: float = 0.05      # fraction of size
    scale_range: Tuple[float, float] = (0.9, 1.1)

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        kr, kt, ks = jax.random.split(key, 3)
        h, w = img.shape[:2]
        ang = jnp.deg2rad(jax.random.uniform(
            kr, minval=-self.degrees, maxval=self.degrees))
        t = jax.random.uniform(kt, (2,), minval=-self.translate,
                               maxval=self.translate) * jnp.array([w, h])
        s = jax.random.uniform(ks, minval=self.scale_range[0],
                               maxval=self.scale_range[1])
        c, si = jnp.cos(ang) * s, jnp.sin(ang) * s
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        # rotate/scale about the center, then translate
        m = jnp.array([
            [c, -si, cx - c * cx + si * cy + t[0]],
            [si, c, cy - si * cx - c * cy + t[1]],
        ], jnp.float32)
        return warp.warp_affine(img, m, (h, w))


@dataclass(frozen=True)
class RandomErasing:
    p: float = 0.5
    area: Tuple[float, float] = (0.02, 0.2)

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        kp, ka, kx, ky, kv = jax.random.split(key, 5)
        h, w = img.shape[:2]
        do = jax.random.bernoulli(kp, self.p)
        frac = jax.random.uniform(ka, minval=self.area[0],
                                  maxval=self.area[1])
        side = jnp.sqrt(frac)
        eh = side * h
        ew = side * w
        y0 = jax.random.uniform(ky) * (h - eh)
        x0 = jax.random.uniform(kx) * (w - ew)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        inside = ((ys >= y0) & (ys < y0 + eh)
                  & (xs >= x0) & (xs < x0 + ew))
        if img.ndim == 3:
            inside = inside[:, :, None]
        fill = jax.random.uniform(kv) * (
            255.0 if img.dtype == jnp.uint8 else 1.0)
        erased = jnp.where(inside, jnp.asarray(fill, jnp.float32),
                           img.astype(jnp.float32))
        out = jnp.where(do, erased, img.astype(jnp.float32))
        if img.dtype == jnp.uint8:
            return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        return out.astype(img.dtype)


class AugmentationPipeline:
    """Seeded, replayable augmentation sequence.

    >>> pipe = AugmentationPipeline([RandomHorizontalFlip(), ColorJitter()],
    ...                             seed=0)
    >>> out = pipe(img)          # stateful key advance
    >>> pipe.set_seed(0)         # reference augmentations.rs:41 set_seed
    >>> out_again = pipe(img)    # identical to `out`
    """

    def __init__(self, augs: Sequence[Aug], seed: int = 0):
        self.augs = list(augs)
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._jitted = jax.jit(self._apply)

    def _apply(self, key: jax.Array, img: jax.Array) -> jax.Array:
        keys = jax.random.split(key, max(len(self.augs), 1))
        for aug, k in zip(self.augs, keys):
            img = aug(k, img)
        return img

    def set_seed(self, seed: int) -> None:
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, img: jax.Array) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return self._jitted(sub, img)

    def apply_batch(self, key: jax.Array, imgs: jax.Array) -> jax.Array:
        """vmap over a batch with independent per-image keys."""
        keys = jax.random.split(key, imgs.shape[0])
        return jax.vmap(self._apply)(keys, imgs)
