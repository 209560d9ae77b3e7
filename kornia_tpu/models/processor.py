"""VLM image/text preprocessing (reference: kornia-vlm smolvlm
preprocessor.rs + smolvlm2 image/video processors)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kornia_tpu.ops import resize as resize_mod


def preprocess_image(
    img_u8: np.ndarray, image_size: int = 384,
    mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
    std: Tuple[float, ...] = (0.5, 0.5, 0.5),
) -> jax.Array:
    """(H, W, 3) u8 → (1, S, S, 3) f32 normalized (SigLIP convention:
    [-1, 1] with mean=std=0.5). Aspect is handled by stretch-resize,
    matching the SmolVLM base-image path."""
    x = jnp.asarray(img_u8)
    x = resize_mod.resize(x, (image_size, image_size), "bilinear")
    x = x.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x[None]


def split_into_tiles(
    img_u8: np.ndarray, tile: int = 384, max_tiles: int = 4
) -> np.ndarray:
    """High-res path: split into up to ``max_tiles`` tiles plus the
    global thumbnail (SmolVLM image-splitting strategy). Returns
    (N, tile, tile, 3) u8 host-side."""
    h, w = img_u8.shape[:2]
    rows = min(max(1, round(h / tile)), int(np.sqrt(max_tiles)))
    cols = min(max(1, round(w / tile)), max(1, max_tiles // rows))
    out = []
    for r in range(rows):
        for c in range(cols):
            y0 = r * h // rows
            y1 = (r + 1) * h // rows
            x0 = c * w // cols
            x1 = (c + 1) * w // cols
            t = np.asarray(jax.device_get(resize_mod.resize(
                jnp.asarray(img_u8[y0:y1, x0:x1]), (tile, tile),
                "bilinear")))
            out.append(t)
    # global view last (thumbnail token group)
    out.append(np.asarray(jax.device_get(resize_mod.resize(
        jnp.asarray(img_u8), (tile, tile), "bilinear"))))
    return np.stack(out)


def build_prompt_tokens(
    prompt_ids: List[int], n_image_tokens: int, image_token_id: int,
    bos_token_id: int = 1,
) -> np.ndarray:
    """Assemble <bos> <image>*N prompt — the SmolVLM chat layout's
    token-level core (tokenizer itself is out of scope; callers bring
    ids from any tokenizer, e.g. HF's, offline)."""
    return np.asarray(
        [bos_token_id] + [image_token_id] * n_image_tokens
        + list(prompt_ids), np.int32)
