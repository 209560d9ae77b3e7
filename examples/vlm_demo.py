"""VLM inference demo (random weights — architecture exercise).

Reference: examples/smol_vlm* / paligemma (kornia-vlm). Without network
access real checkpoints can't be fetched; this exercises the full
pipeline (image preprocess → vision tower → connector → decode scan)
end to end and shows where converted weights plug in (models.load_params).

    python examples/vlm_demo.py [--image PATH] [--max-new 16]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--image", default=DOG_JPEG)
    p.add_argument("--max-new", type=int, default=16)
    p.add_argument("--arch", default="smolvlm",
                   choices=("smolvlm", "paligemma"),
                   help="model family (reference: examples/smol_vlm* "
                        "vs examples/paligemma)")
    args = p.parse_args()
    configure_backend(args)

    import numpy as np

    from kornia_tpu import io as kio
    from kornia_tpu import models as M

    if args.arch == "paligemma":
        cfg = M.PaliGemmaConfig(
            vision=M.ViTConfig(image_size=112, patch_size=14,
                               hidden_size=64, intermediate_size=128,
                               num_layers=2, num_heads=4),
            text=M.GemmaConfig(vocab_size=512, hidden_size=64,
                               intermediate_size=128, num_layers=2,
                               num_heads=4, num_kv_heads=1, head_dim=16,
                               max_seq_len=128),
            image_token_id=500)
        model, params = M.build_paligemma(cfg, seed=0)
    else:
        cfg = M.VLMConfig(
            vision=M.ViTConfig(image_size=112, patch_size=14,
                               hidden_size=64, intermediate_size=128,
                               num_layers=2, num_heads=4),
            text=M.LLMConfig(vocab_size=512, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2,
                             max_seq_len=128),
            pixel_shuffle_factor=2, image_token_id=500)
        model, params = M.build_vlm(cfg, seed=0)
    print(f"{args.arch}: {cfg.vision.num_layers}-layer ViT + "
          f"{cfg.text.num_layers}-layer decoder, "
          f"{cfg.tokens_per_image} tokens/image")

    img = kio.read_image_any_rgb8(args.image)
    pixels = np.asarray(M.preprocess_image(img, cfg.vision.image_size))
    tokens = M.build_prompt_tokens(
        [10, 11, 12], cfg.tokens_per_image, cfg.image_token_id)[None]

    toks = []
    t0 = time.perf_counter()
    res = M.generate(model, params, tokens, pixels,
                     max_new_tokens=args.max_new,
                     stream_callback=toks.append)
    dt = time.perf_counter() - t0
    print(f"generated {int(res.n_generated[0])} tokens "
          f"in {dt*1e3:.0f} ms (incl. compile): {toks}")


if __name__ == "__main__":
    main()
