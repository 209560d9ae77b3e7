"""SigLIP-style vision transformer (the SmolVLM vision tower).

Capability parity with the reference's kornia-vlm vision models
(crates/kornia-vlm/src/smolvlm/vision_model.rs — SigLIP encoder on
candle). TPU-first: everything is large batched matmuls in bf16-friendly
shapes; attention uses jnp.einsum so XLA maps it onto the MXU; no
data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTAttention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        qkv = nn.DenseGeneral(
            (3, c.num_heads, head_dim), dtype=c.dtype, name="qkv")(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        scale = head_dim ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(
            c.hidden_size, axis=(-2, -1), dtype=c.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="ln1")(x)
        x = x + ViTAttention(c, name="attn")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="ln2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """Patchify → transformer encoder → (B, N_patches, hidden)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) float in [-1, 1] (SigLIP normalization)."""
        c = self.cfg
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID", dtype=c.dtype, name="patch_embed")(images)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.hidden_size)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.num_patches, c.hidden_size))
        x = x + pos[:, : x.shape[1]].astype(c.dtype)
        for i in range(c.num_layers):
            x = ViTBlock(c, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                            name="ln_post")(x)
