"""Undistort an image with Brown-Conrady calibration.

Reference: examples/undistort_image, undistort_points_image.

    python examples/undistort_image.py [--image PATH] [--output out.png]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--image", default=DOG_JPEG)
    p.add_argument("--output", default=None)
    p.add_argument("--k1", type=float, default=-0.25)
    p.add_argument("--k2", type=float, default=0.06)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.geometry import camera

    img = kio.read_image_any_rgb8(args.image)
    h, w = img.shape[:2]
    k = jnp.asarray([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]],
                    jnp.float32)
    dist = jnp.asarray([args.k1, args.k2, 0, 0, 0], jnp.float32)

    fn = jax.jit(lambda x, kk, dd: camera.undistort_image(x, kk, dd))
    out = jax.block_until_ready(fn(jnp.asarray(img), k, dist))
    t0 = time.perf_counter()
    for _ in range(10):
        out = jax.block_until_ready(fn(jnp.asarray(img), k, dist))
    print(f"undistort {h}x{w}: "
          f"{(time.perf_counter() - t0) / 10 * 1e3:.3f} ms")

    if args.output:
        kio.write_image_png(args.output, np.asarray(out))
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
