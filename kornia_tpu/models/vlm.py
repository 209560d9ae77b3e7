"""SmolVLM-style vision-language model + generation loop.

Capability parity with the reference's kornia-vlm crate (SmolVLM /
SmolVLM2 / PaliGemma inference — crates/kornia-vlm/src/lib.rs:1-8,
smolvlm/{vision_model,text_model,preprocessor}, context.rs token
streaming). Architecture: SigLIP vision tower → pixel-shuffle connector
→ llama-style decoder; image features replace <image> placeholder
tokens in the embedding sequence.

TPU-first: generation is a `lax.scan` over decode steps against a
static-shape KV cache — the whole generate() is one compiled program,
no per-token dispatch. Weights are random-initialized by default; a
``load_params`` hook accepts a pytree (e.g. converted from local HF
safetensors — network download is intentionally out of scope).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from kornia_tpu.models.llm import CausalLM, KVCache, LLMConfig
from kornia_tpu.models.vit import ViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: ViTConfig = ViTConfig(
        image_size=384, patch_size=14, hidden_size=384,
        intermediate_size=1536, num_layers=6, num_heads=6)
    text: LLMConfig = LLMConfig(
        vocab_size=49280, hidden_size=576, intermediate_size=1536,
        num_layers=6, num_heads=9, num_kv_heads=3, max_seq_len=1024)
    pixel_shuffle_factor: int = 3
    image_token_id: int = 49190

    @property
    def tokens_per_image(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        side = side // self.pixel_shuffle_factor
        return side * side


def smolvlm_256m() -> VLMConfig:
    """SmolVLM(2)-256M-Instruct architecture preset (reference
    kornia-vlm smolvlm2 variants, lib.rs:1-8): SigLIP-base-p16/512
    tower, SmolLM2-135M decoder, pixel-shuffle 4 (64 tokens/image)."""
    return VLMConfig(
        vision=ViTConfig(image_size=512, patch_size=16, hidden_size=768,
                         intermediate_size=3072, num_layers=12,
                         num_heads=12),
        text=LLMConfig(vocab_size=49280, hidden_size=576,
                       intermediate_size=1536, num_layers=30,
                       num_heads=9, num_kv_heads=3, max_seq_len=8192),
        pixel_shuffle_factor=4,
        image_token_id=49190)


def smolvlm_500m() -> VLMConfig:
    """SmolVLM(2)-500M-Instruct preset: SigLIP-base-p16/512 tower,
    SmolLM2-360M decoder, pixel-shuffle 4."""
    return VLMConfig(
        vision=ViTConfig(image_size=512, patch_size=16, hidden_size=768,
                         intermediate_size=3072, num_layers=12,
                         num_heads=12),
        text=LLMConfig(vocab_size=49280, hidden_size=960,
                       intermediate_size=2560, num_layers=32,
                       num_heads=15, num_kv_heads=5, max_seq_len=8192),
        pixel_shuffle_factor=4,
        image_token_id=49190)


def smolvlm_2_2b() -> VLMConfig:
    """SmolVLM(2)-2.2B-Instruct preset: SigLIP-SO400M-p14/384 tower,
    SmolLM2-1.7B decoder, pixel-shuffle 3 (81 tokens/image)."""
    return VLMConfig(
        vision=ViTConfig(image_size=384, patch_size=14, hidden_size=1152,
                         intermediate_size=4304, num_layers=27,
                         num_heads=16),
        text=LLMConfig(vocab_size=49280, hidden_size=2048,
                       intermediate_size=8192, num_layers=24,
                       num_heads=32, num_kv_heads=32, max_seq_len=8192),
        pixel_shuffle_factor=3,
        image_token_id=49190)


class SmolVLM(nn.Module):
    """Vision tower + connector + decoder (SmolVLM architecture)."""

    cfg: VLMConfig

    def setup(self):
        self.vision = VisionTransformer(self.cfg.vision, name="vision")
        self.text = CausalLM(self.cfg.text, name="text")
        self.connector = nn.Dense(
            self.cfg.text.hidden_size, use_bias=False, name="connector")

    def _pixel_shuffle(self, x: jax.Array) -> jax.Array:
        """(B, N, D) → (B, N/r², D·r²): trade tokens for channels
        (SmolVLM's connector compression)."""
        r = self.cfg.pixel_shuffle_factor
        b, n, d = x.shape
        side = int(round(n ** 0.5))
        x = x.reshape(b, side, side, d)
        x = x.reshape(b, side // r, r, side // r, r, d)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, (side // r) ** 2, d * r * r)

    def encode_images(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1,1] → (B, tokens_per_image, text_hidden)."""
        feats = self.vision(images)
        feats = self._pixel_shuffle(feats)
        return self.connector(feats)

    def embed_multimodal(self, tokens: jax.Array,
                         image_feats: Optional[jax.Array]) -> jax.Array:
        """Token embeddings with <image> positions replaced by image
        features (in order). tokens: (B, T); image_feats (B, Ni, H)."""
        emb = self.text.embed_tokens(tokens)
        if image_feats is None:
            return emb
        is_img = tokens == self.cfg.image_token_id
        # k-th image token of each row takes image_feats[:, k]
        idx = jnp.cumsum(is_img, axis=1) - 1
        idx = jnp.clip(idx, 0, image_feats.shape[1] - 1)
        gathered = jnp.take_along_axis(
            image_feats, idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered, emb)

    def __call__(self, tokens: jax.Array, images: Optional[jax.Array],
                 cache: KVCache) -> Tuple[jax.Array, KVCache]:
        feats = self.encode_images(images) if images is not None else None
        emb = self.embed_multimodal(tokens, feats)
        return self.text(emb, cache)

    def decode_step(self, token: jax.Array, cache: KVCache
                    ) -> Tuple[jax.Array, KVCache]:
        """One decode step: (B, 1) token → (B, vocab) logits."""
        emb = self.text.embed_tokens(token)
        logits, cache = self.text(emb, cache)
        return logits[:, -1], cache


class GenerationResult(NamedTuple):
    tokens: jax.Array       # (B, max_new) generated ids (eos-padded)
    n_generated: jax.Array  # (B,) count before eos


_GEN_CACHE: dict = {}


def build_vlm(cfg: VLMConfig = VLMConfig(), seed: int = 0):
    """Init a SmolVLM with random weights; returns (model, params)."""
    model = SmolVLM(cfg)
    rng = jax.random.PRNGKey(seed)
    tokens = jnp.zeros((1, 8), jnp.int32)
    images = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    cache = KVCache.zeros(cfg.text, 1)
    params = model.init(rng, tokens, images, cache)
    return model, params


def load_params(params, flat_updates: dict):
    """Overlay converted weights (path → array) onto an init pytree.

    Paths use '/'-joined flax module names. Missing keys raise.
    """
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    for k, v in flat_updates.items():
        if k not in flat:
            raise KeyError(f"unknown parameter {k}")
        if flat[k].shape != v.shape:
            raise ValueError(
                f"shape mismatch for {k}: {flat[k].shape} vs {v.shape}")
        flat[k] = jnp.asarray(v, flat[k].dtype)
    return tu.unflatten_dict(flat, sep="/")


def generate(
    model: SmolVLM, params, tokens: np.ndarray,
    images: Optional[np.ndarray] = None,
    max_new_tokens: int = 32,
    eos_token_id: int = 2,
    temperature: float = 0.0,
    seed: int = 0,
    stream_callback: Optional[Callable[[int], None]] = None,
) -> GenerationResult:
    """Prefill + scan-decode. Greedy when temperature == 0.

    The decode loop is a lax.scan — one compiled program for the whole
    generation (reference analogue: context.rs incremental decode with
    token streaming; ``stream_callback`` receives tokens host-side after
    the scan completes, preserving the streaming API without breaking
    the single-program design).
    """
    cfg = model.cfg
    tokens = jnp.asarray(tokens, jnp.int32)
    if tokens.ndim == 1:
        tokens = tokens[None]
    b = tokens.shape[0]
    imgs = None if images is None else jnp.asarray(images)

    # one compiled program per (model, shape, knobs) — without the cache
    # every generate() call would re-trace the whole scan
    cache_key = (id(model), tokens.shape,
                 None if imgs is None else imgs.shape,
                 max_new_tokens, eos_token_id, temperature)
    cached = _GEN_CACHE.get(cache_key)
    if cached is not None:
        out, n_gen = cached(params, tokens, imgs, jax.random.PRNGKey(seed))
        if stream_callback is not None:
            host = np.asarray(out)
            for t in host[0][: int(n_gen[0]) + 1]:
                stream_callback(int(t))
        return GenerationResult(tokens=out, n_generated=n_gen)

    @jax.jit
    def run(params, tokens, imgs_or_none, key):
        cache = KVCache.zeros(cfg.text, b)
        logits, cache = model.apply(params, tokens, imgs_or_none, cache)
        last = logits[:, -1]

        def sample(lg_, k_):
            if temperature > 0:
                return jax.random.categorical(k_, lg_ / temperature)
            return jnp.argmax(lg_, -1)

        def step(carry, _):
            tok, cache, done, key = carry
            key, sub = jax.random.split(key)
            logits, cache = model.apply(
                params, tok[:, None], None, cache,
                method=lambda m, t, i, c: m.text(m.text.embed_tokens(t), c))
            nxt = sample(logits[:, -1], sub).astype(jnp.int32)
            nxt = jnp.where(done, eos_token_id, nxt)
            done = done | (nxt == eos_token_id)
            return (nxt, cache, done, key), nxt

        first = sample(last, key).astype(jnp.int32)
        done0 = first == eos_token_id
        (_, _, _, _), rest = jax.lax.scan(
            step, (first, cache, done0, key), None,
            length=max_new_tokens - 1)
        out = jnp.concatenate([first[:, None], rest.T], axis=1)
        n_gen = jnp.sum(jnp.cumsum(out == eos_token_id, axis=1) == 0, axis=1)
        return out, n_gen

    _GEN_CACHE[cache_key] = run
    out, n_gen = run(params, tokens, imgs, jax.random.PRNGKey(seed))
    if stream_callback is not None:
        host = np.asarray(out)
        for t in host[0][: int(n_gen[0]) + 1]:
            stream_callback(int(t))
    return GenerationResult(tokens=out, n_generated=n_gen)


def sample_video_frames(n_frames: int, n_samples: int) -> np.ndarray:
    """Uniform frame-index sampling (reference: kornia-vlm video.rs)."""
    if n_frames <= 0:
        return np.empty(0, np.int64)
    n_samples = min(n_samples, n_frames)
    return np.linspace(0, n_frames - 1, n_samples).round().astype(np.int64)


def save_params_npz(path: str, params) -> None:
    """Persist a params pytree to one compressed npz ('/'-joined keys)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str, params_template):
    """Load params saved by save_params_npz, validated against a template
    pytree (shape/dtype of an init'd model)."""
    import flax.traverse_util as tu

    z = np.load(path)
    flat = tu.flatten_dict(params_template, sep="/")
    out = {}
    for k in flat:
        if k not in z:
            raise KeyError(f"checkpoint missing parameter {k}")
        if z[k].shape != flat[k].shape:
            raise ValueError(
                f"shape mismatch for {k}: {z[k].shape} vs {flat[k].shape}")
        out[k] = jnp.asarray(z[k], flat[k].dtype)
    return tu.unflatten_dict(out, sep="/")
