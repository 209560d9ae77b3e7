"""Baseline config 2: ORB detect+describe+match over an image pair.

Reference: examples/orb_detector + benchmarks.md §ORB e2e quality (the
reproj-error-under-known-warp protocol).

    python examples/orb_detector.py [--image PATH]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import DOG_JPEG, base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--image", default=DOG_JPEG)
    p.add_argument("--n-features", type=int, default=1000)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import cv2
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.ops import color
    from kornia_tpu.features import matching, orb

    img = kio.read_image_any_rgb8(args.image)
    gray = np.asarray(color.rgb_to_gray(jnp.asarray(img)))[..., 0]
    # known warp → ground-truth correspondence (benchmarks.md protocol)
    m = cv2.getRotationMatrix2D(
        (gray.shape[1] / 2, gray.shape[0] / 2), 8.0, 0.95)
    m[0, 2] += 6
    warped = cv2.warpAffine(gray, m, (gray.shape[1], gray.shape[0]))

    cfg = orb.OrbConfig(n_features=args.n_features, n_levels=4)

    def step(a, b):
        fa = orb.orb_detect_and_describe(a, cfg)
        fb = orb.orb_detect_and_describe(b, cfg)
        mm = matching.match_descriptors(
            fa.descriptors, fb.descriptors, a_mask=fa.mask, b_mask=fb.mask,
            max_distance=64, ratio=0.8)
        return fa, fb, mm

    jit_step = jax.jit(step)
    fa, fb, mm = jax.block_until_ready(jit_step(
        jnp.asarray(gray), jnp.asarray(warped)))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jit_step(jnp.asarray(gray),
                                       jnp.asarray(warped)))
    print(f"detect+describe+match: "
          f"{(time.perf_counter() - t0) / 5 * 1e3:.2f} ms/pair")

    ok = np.asarray(mm.mask)
    ia = np.nonzero(ok)[0]
    ib = np.asarray(mm.idx)[ok]
    xa = np.asarray(fa.xy)[ia]
    xb = np.asarray(fb.xy)[ib]
    # reprojection error under the known warp
    proj = xa @ m[:, :2].T + m[:, 2]
    err = np.linalg.norm(proj - xb, axis=1)
    inl = err < 3.0
    print(f"matches: {ok.sum()}, inlier rate {inl.mean():.2f}, "
          f"median reproj err {np.median(err[inl]):.2f} px "
          f"(reference: 0.89 px on this protocol)")


if __name__ == "__main__":
    main()
