"""Gemma-style causal decoder (the PaliGemma text backbone).

Capability parity with the reference's kornia-vlm PaliGemma text model
(crates/kornia-vlm/src/paligemma/ — Gemma-2B decoder on candle).
Gemma differs from the llama family in ways that matter for weight
parity: RMSNorm uses a ``(1 + w)`` zero-centered scale, the token
embedding is multiplied by ``sqrt(hidden)`` at the model input, the
head dim is an explicit config field (256 for Gemma-2B, NOT
hidden/heads), and the MLP is GeGLU (tanh-approx gelu gate).

TPU-first like :mod:`kornia_tpu.models.llm`: static-shape KV cache as
explicit state, one jitted program for the whole generation scan, and
an optional prefix-LM mask (PaliGemma attends bidirectionally over the
image+prompt prefix and causally over generated tokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from kornia_tpu.models.llm import KVCache, _rope


@dataclasses.dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int = 257216        # PaliGemma vocab (Gemma + loc/seg)
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_layers: int = 18
    num_heads: int = 8
    num_kv_heads: int = 1           # Gemma-2B is MQA
    head_dim: int = 256             # explicit — NOT hidden/heads
    max_seq_len: int = 1024
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32


class GemmaRMSNorm(nn.Module):
    """RMSNorm with Gemma's zero-centered ``(1 + w)`` scale, computed
    in f32 end-to-end like the HF/candle implementations."""

    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.zeros, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), -1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + self.eps)
        return (out * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


class GemmaBlock(nn.Module):
    cfg: GemmaConfig

    @nn.compact
    def __call__(self, x, positions, cache_k, cache_v, cache_len, mask):
        c = self.cfg
        hd = c.head_dim
        h = GemmaRMSNorm(c.rms_eps, name="attn_norm")(x)
        q = nn.DenseGeneral((c.num_heads, hd), use_bias=False,
                            dtype=c.dtype, name="q")(h)
        k = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False,
                            dtype=c.dtype, name="k")(h)
        v = nn.DenseGeneral((c.num_kv_heads, hd), use_bias=False,
                            dtype=c.dtype, name="v")(h)
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)

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

        h = GemmaRMSNorm(c.rms_eps, name="mlp_norm")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False,
                        dtype=c.dtype, name="gate")(h)
        up = nn.Dense(c.intermediate_size, use_bias=False,
                      dtype=c.dtype, name="up")(h)
        h = nn.Dense(c.hidden_size, use_bias=False, dtype=c.dtype,
                     name="down")(nn.gelu(gate, approximate=True) * up)
        return x + h, new_k, new_v


class GemmaLM(nn.Module):
    """Gemma decoder over embeddings. ``__call__`` accepts RAW (unscaled)
    embeddings and applies the ``sqrt(hidden)`` input normalizer itself,
    mirroring HF's GemmaModel — so VLM callers splice image features at
    the unscaled level exactly like PaliGemma's merge step."""

    cfg: GemmaConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                              name="tok_embed")
        self.blocks = [GemmaBlock(c, name=f"layer_{i}")
                       for i in range(c.num_layers)]
        self.norm_f = GemmaRMSNorm(c.rms_eps, name="final_norm")

    def embed_tokens(self, tokens: jax.Array) -> jax.Array:
        return self.embed(tokens)

    def __call__(self, embeds: jax.Array, cache: KVCache,
                 prefix_len: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, KVCache]:
        """embeds: (B, T, H) raw embeddings starting at cache.length.

        prefix_len: optional () int — keys/queries with global position
        < prefix_len attend bidirectionally within the prefix block
        (PaliGemma's image+prompt prefix); None = pure causal.
        """
        c = self.cfg
        t = embeds.shape[1]
        positions = cache.length + jnp.arange(t)
        key_pos = jnp.arange(c.max_seq_len)
        q_pos = positions
        causal = key_pos[None, None, None, :] <= \
            q_pos[None, None, :, None]
        if prefix_len is not None:
            in_prefix = (key_pos[None, None, None, :] < prefix_len) & \
                (q_pos[None, None, :, None] < prefix_len)
            mask = causal | in_prefix
        else:
            mask = causal

        x = embeds * jnp.asarray(
            c.hidden_size ** 0.5, embeds.dtype)      # Gemma normalizer
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
