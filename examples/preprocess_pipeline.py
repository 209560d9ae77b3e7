"""Fused DNN preprocess: camera frame → normalized CHW tensor.

Reference: examples/cuda_fusion + cuda_camera_preprocess (the fused
resize+normalize+CHW pipeline, benchmark-cuda-color-conversions.md
§Fused: 0.0968 ms @640² on Orin Nano CUDA).

    python examples/preprocess_pipeline.py [--video clip.mp4]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--video", default=None)
    p.add_argument("--size", type=int, default=640)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.ops import preprocess as pp

    cfg = pp.PreprocessorConfig(
        out_size=(args.size, args.size),
        normalize=pp.NormalizeMode.MEAN_STD,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    fused = jax.jit(lambda x: pp.resize_normalize_to_tensor(x, cfg))

    if args.video:
        from kornia_tpu.io.video import VideoReader
        from kornia_tpu.io import FpsCounter

        fps = FpsCounter()
        with VideoReader(args.video) as r:
            for i, frame in enumerate(r):
                out = jax.block_until_ready(fused(jnp.asarray(frame)))
                fps.tick()
                if i % 30 == 0:
                    print(f"frame {i}: {out.shape} {fps.fps():.1f} fps")
        return

    img = kio.read_image_any_rgb8(DOG_JPEG)
    out = jax.block_until_ready(fused(jnp.asarray(img)))
    print(f"in {img.shape} u8 → out {out.shape} {out.dtype}")
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(fused(jnp.asarray(img)))
    print(f"fused preprocess: "
          f"{(time.perf_counter() - t0) / 50 * 1e3:.4f} ms/frame")


if __name__ == "__main__":
    main()
