"""Baseline config 1: decode → grayscale → FAST corners.

Reference: examples/fast_detector (SURVEY.md §3.1 call stack).

    python examples/fast_detector.py [--image PATH] [--threshold 20]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--image", default=DOG_JPEG)
    p.add_argument("--threshold", type=float, default=20.0)
    p.add_argument("--max-keypoints", type=int, default=2048)
    p.add_argument("--output", default=None,
                   help="write a visualization PNG")
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.ops import color, draw
    from kornia_tpu.features import fast

    img = kio.read_image_any_rgb8(args.image)
    print(f"image: {args.image} {img.shape}")

    step = jax.jit(lambda x: fast.fast_detect(
        color.rgb_to_gray(x)[..., 0], threshold=args.threshold,
        max_keypoints=args.max_keypoints))
    kps = jax.block_until_ready(step(jnp.asarray(img)))

    t0 = time.perf_counter()
    for _ in range(10):
        kps = jax.block_until_ready(step(jnp.asarray(img)))
    print(f"detect: {(time.perf_counter() - t0) / 10 * 1e3:.3f} ms/frame")

    n = int(kps.mask.sum())
    print(f"corners: {n}")
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    for x, y in xy[:5]:
        print(f"  ({x:.0f}, {y:.0f})")

    if args.output:
        vis = draw.draw_keypoints(jnp.asarray(img), jnp.asarray(xy))
        kio.write_image_png(args.output, np.asarray(vis))
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
