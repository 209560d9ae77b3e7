"""Model zoo (TPU re-design of crates/kornia-vlm): SmolVLM-class VLM in
flax — SigLIP vision tower, llama-style decoder with static KV cache,
pixel-shuffle connector, scan-based generation."""

from kornia_tpu.models.vit import ViTConfig, VisionTransformer
from kornia_tpu.models.llm import CausalLM, KVCache, LLMConfig
from kornia_tpu.models.vlm import (
    GenerationResult,
    SmolVLM,
    VLMConfig,
    build_vlm,
    generate,
    load_params,
    load_params_npz,
    save_params_npz,
    sample_video_frames,
    smolvlm_256m,
    smolvlm_500m,
    smolvlm_2_2b,
)
from kornia_tpu.models.video import (
    VideoMetadata,
    VideoSample,
    preprocess_video,
    sample_video,
)
from kornia_tpu.models.gemma import GemmaConfig, GemmaLM
from kornia_tpu.models.paligemma import (
    PaliGemma,
    PaliGemmaConfig,
    build_paligemma,
)
from kornia_tpu.models.processor import (
    build_prompt_tokens,
    preprocess_image,
    split_into_tiles,
)

__all__ = [
    "ViTConfig",
    "VisionTransformer",
    "CausalLM",
    "KVCache",
    "LLMConfig",
    "SmolVLM",
    "VLMConfig",
    "GenerationResult",
    "build_vlm",
    "generate",
    "load_params",
    "load_params_npz",
    "save_params_npz",
    "sample_video_frames",
    "smolvlm_256m",
    "smolvlm_500m",
    "smolvlm_2_2b",
    "VideoMetadata",
    "VideoSample",
    "preprocess_video",
    "sample_video",
    "GemmaConfig",
    "GemmaLM",
    "PaliGemma",
    "PaliGemmaConfig",
    "build_paligemma",
    "preprocess_image",
    "split_into_tiles",
    "build_prompt_tokens",
]
