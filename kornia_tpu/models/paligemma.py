"""PaliGemma vision-language model (SigLIP tower + Gemma decoder).

Capability parity with the reference's kornia-vlm PaliGemma
(crates/kornia-vlm/src/paligemma/{model,mod}.rs — SigLIP-So400m +
Gemma-2B on candle, prefix-LM attention, token streaming).

Architecture (exactly the HF semantics, so locally-converted
checkpoints are weight-parity-testable without network access):
  image → SigLIP tower (no pooling head) → linear projector (bias)
  → features / sqrt(text_hidden) → spliced over <image> tokens in the
  UNSCALED token embeddings → GemmaLM (which applies the sqrt(hidden)
  input normalizer) with a bidirectional mask over the image+prompt
  prefix and causal attention for generated tokens.

Generation reuses :func:`kornia_tpu.models.vlm.generate` — PaliGemma
exposes the same (tokens, images, cache) call surface; the prefill
passes ``prefix_len = T`` so the whole prompt is bidirectional, decode
steps are causal (cached prefix keys stay visible).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from kornia_tpu.models.gemma import GemmaConfig, GemmaLM
from kornia_tpu.models.llm import KVCache
from kornia_tpu.models.vit import ViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class PaliGemmaConfig:
    vision: ViTConfig = ViTConfig(
        image_size=224, patch_size=14, hidden_size=1152,
        intermediate_size=4304, num_layers=27, num_heads=16)
    text: GemmaConfig = GemmaConfig()
    image_token_id: int = 257152

    @property
    def tokens_per_image(self) -> int:
        return self.vision.num_patches


class PaliGemma(nn.Module):
    """SigLIP tower + linear projector + Gemma decoder."""

    cfg: PaliGemmaConfig

    def setup(self):
        self.vision = VisionTransformer(self.cfg.vision, name="vision")
        self.text = GemmaLM(self.cfg.text, name="text")
        # HF multi_modal_projector.linear carries a bias
        self.projector = nn.Dense(
            self.cfg.text.hidden_size, use_bias=True, name="projector")

    def encode_images(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1, 1] → (B, N_patches, text_hidden),
        pre-scaled by 1/sqrt(text_hidden) (HF's merge-step scaling —
        cancels the decoder's input normalizer for image positions)."""
        feats = self.projector(self.vision(images))
        return feats / jnp.asarray(
            self.cfg.text.hidden_size ** 0.5, feats.dtype)

    def embed_multimodal(self, tokens: jax.Array,
                         image_feats: Optional[jax.Array]) -> jax.Array:
        emb = self.text.embed_tokens(tokens)
        if image_feats is None:
            return emb
        is_img = tokens == self.cfg.image_token_id
        idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1,
                       0, image_feats.shape[1] - 1)
        gathered = jnp.take_along_axis(
            image_feats, idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered, emb)

    def __call__(self, tokens: jax.Array, images: Optional[jax.Array],
                 cache: KVCache) -> Tuple[jax.Array, KVCache]:
        """Prefill: the full (image tokens + prompt) block is the
        bidirectional prefix (token_type semantics of HF PaliGemma)."""
        feats = self.encode_images(images) if images is not None else None
        emb = self.embed_multimodal(tokens, feats)
        prefix_len = cache.length + tokens.shape[1]
        return self.text(emb, cache, prefix_len=prefix_len)

    def decode_step(self, token: jax.Array, cache: KVCache
                    ) -> Tuple[jax.Array, KVCache]:
        emb = self.text.embed_tokens(token)
        logits, cache = self.text(emb, cache)
        return logits[:, -1], cache


def build_paligemma(cfg: PaliGemmaConfig = PaliGemmaConfig(),
                    seed: int = 0):
    """Init a PaliGemma with random weights; returns (model, params)."""
    model = PaliGemma(cfg)
    rng = jax.random.PRNGKey(seed)
    tokens = jnp.zeros((1, 8), jnp.int32)
    images = jnp.zeros(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3))
    cache = KVCache.zeros(cfg.text, 1)
    params = model.init(rng, tokens, images, cache)
    return model, params
