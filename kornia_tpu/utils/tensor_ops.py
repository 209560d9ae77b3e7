"""Elementwise tensor-ops parity layer (reference: kornia-tensor-ops).

The reference exposes a TensorOps trait (ops.rs:474) with checked
elementwise arithmetic, reductions, and similarity measures, plus a
typed error taxonomy (error.rs: shape/dim mismatch). On TPU these are
jnp one-liners — what this module adds is the reference's *contract*:
explicit shape checking with typed errors instead of silent broadcasting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class TensorOpsError(Exception):
    """Base error (reference error.rs)."""


class ShapeMismatchError(TensorOpsError):
    """Operand shapes differ (broadcasting intentionally NOT applied)."""


class DimOutOfBoundsError(TensorOpsError):
    """Reduction dim outside the operand's rank."""


def _check_same_shape(a: jax.Array, b: jax.Array) -> None:
    if a.shape != b.shape:
        raise ShapeMismatchError(f"shape mismatch: {a.shape} vs {b.shape}")


def add(a, b):
    _check_same_shape(a, b)
    return a + b


def sub(a, b):
    _check_same_shape(a, b)
    return a - b


def mul(a, b):
    _check_same_shape(a, b)
    return a * b


def div(a, b):
    _check_same_shape(a, b)
    return a / b


def mul_scalar(a, s: float):
    return a * s


def powf(a, p: float):
    return jnp.power(a, p)


def powi(a, p: int):
    return jnp.power(a, p)


def abs(a):  # noqa: A001 - parity naming with the reference
    return jnp.abs(a)


def element_min(a, b):
    _check_same_shape(a, b)
    return jnp.minimum(a, b)


def mean(a):
    return jnp.mean(a)


def sum_elements(a, dim: int):
    """Dim-wise sum (reference ops.rs:34) with bounds checking."""
    if not -a.ndim <= dim < a.ndim:
        raise DimOutOfBoundsError(f"dim {dim} out of bounds for rank {a.ndim}")
    return jnp.sum(a, axis=dim)


def dot_product1(a, b):
    """1-D dot product (reference dot_product1)."""
    _check_same_shape(a, b)
    if a.ndim != 1:
        raise DimOutOfBoundsError(f"dot_product1 expects rank-1, got {a.ndim}")
    return jnp.dot(a, b)


def cosine_similarity(a, b, eps: float = 1e-8):
    _check_same_shape(a, b)
    num = jnp.sum(a * b)
    den = jnp.sqrt(jnp.sum(a * a)) * jnp.sqrt(jnp.sum(b * b))
    return num / jnp.maximum(den, eps)


def cosine_distance(a, b, eps: float = 1e-8):
    return 1.0 - cosine_similarity(a, b, eps)
