"""Llama-style causal decoder (the SmolVLM/SmolLM2 text backbone).

Capability parity with the reference's kornia-vlm text models
(crates/kornia-vlm/src/smolvlm/text_model.rs — RMSNorm, RoPE, GQA,
SwiGLU on candle). TPU-first: a static-shape KV cache carried as
explicit state (functional, scan/jit-friendly — no mutation), bf16
matmuls via config dtype, and decode implemented as a lax.scan over the
generated positions so the whole generation loop is ONE compiled
program.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 49280
    hidden_size: int = 576
    intermediate_size: int = 1536
    num_layers: int = 8
    num_heads: int = 9
    num_kv_heads: int = 3
    max_seq_len: int = 1024
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class KVCache(NamedTuple):
    """Static-shape per-layer cache: (L, B, max_seq, kv_heads, head_dim)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # () int32 — filled positions

    @classmethod
    def zeros(cls, cfg: LLMConfig, batch: int) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.max_seq_len,
                 cfg.num_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, cfg.dtype),
                   v=jnp.zeros(shape, cfg.dtype),
                   length=jnp.int32(0))


def _rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps).astype(x.dtype)) * w


class RMSNorm(nn.Module):
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return _rms_norm(x, w.astype(x.dtype), self.eps)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding. x: (B, T, H, D); positions: (T,)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class DecoderBlock(nn.Module):
    cfg: LLMConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, positions, cache_k, cache_v, cache_len, mask):
        c = self.cfg
        hd = c.head_dim
        h = RMSNorm(c.rms_eps, name="attn_norm")(x)
        q = nn.DenseGeneral((c.num_heads, hd), use_bias=False,
                            dtype=c.dtype, name="q")(h)
        k = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False,
                            dtype=c.dtype, name="k")(h)
        v = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False,
                            dtype=c.dtype, name="v")(h)
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)

        # write into the static cache at [cache_len, cache_len+T)
        t = x.shape[1]
        new_k = jax.lax.dynamic_update_slice(
            cache_k, k, (0, cache_len, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache_v, v, (0, cache_len, 0, 0))

        rep = c.num_heads // c.num_kv_heads
        kk = jnp.repeat(new_k, rep, axis=2)
        vv = jnp.repeat(new_v, rep, axis=2)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, kk)
        attn = jnp.where(mask, attn, -1e30)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv)
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), use_bias=False,
                              dtype=c.dtype, name="o")(out)
        x = x + out

        h = RMSNorm(c.rms_eps, name="mlp_norm")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False,
                        dtype=c.dtype, name="gate")(h)
        up = nn.Dense(c.intermediate_size, use_bias=False,
                      dtype=c.dtype, name="up")(h)
        h = nn.Dense(c.hidden_size, use_bias=False,
                     dtype=c.dtype, name="down")(nn.silu(gate) * up)
        return x + h, new_k, new_v


class CausalLM(nn.Module):
    """Decoder-only LM over embeddings (token embedding lives here, but
    __call__ accepts raw embeddings so VLMs can splice image tokens)."""

    cfg: LLMConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                              name="tok_embed")
        self.blocks = [DecoderBlock(c, i, name=f"layer_{i}")
                       for i in range(c.num_layers)]
        self.norm_f = RMSNorm(c.rms_eps, name="final_norm")

    def embed_tokens(self, tokens: jax.Array) -> jax.Array:
        return self.embed(tokens)

    def __call__(self, embeds: jax.Array, cache: KVCache
                 ) -> Tuple[jax.Array, KVCache]:
        """embeds: (B, T, H) starting at cache.length. Returns logits
        (B, T, vocab) and the updated cache."""
        c = self.cfg
        t = embeds.shape[1]
        positions = cache.length + jnp.arange(t)
        # causal mask against the cache: key j visible to query i iff
        # j < cache.length + i + 1
        key_pos = jnp.arange(c.max_seq_len)
        mask = key_pos[None, None, None, :] <= (
            cache.length + jnp.arange(t))[None, None, :, None]

        x = embeds
        ks, vs = [], []
        for i, blk in enumerate(self.blocks):
            x, nk, nv = blk(x, positions, cache.k[i], cache.v[i],
                            cache.length, mask)
            ks.append(nk)
            vs.append(nv)
        x = self.norm_f(x)
        logits = self.embed.attend(x.astype(jnp.float32))
        new_cache = KVCache(k=jnp.stack(ks), v=jnp.stack(vs),
                            length=cache.length + t)
        return logits, new_cache
