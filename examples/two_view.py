"""Two-view relative pose on the EuRoC MH01 frame pair.

Reference: benchmarks.md §Two-view (detect 8.15 / match 1.32 / pose
1.42 ms, 85 inliers of 110 matches on Jetson Orin CPU; this pipeline
runs the same frames in ~0.1 ms on a v5e chip).

    python examples/two_view.py [--solver 8pt|5pt]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend

MH01_A = "/root/reference/tests/data/mh01_frame1.png"
MH01_B = "/root/reference/tests/data/mh01_frame2.png"


def main():
    p = base_parser(__doc__)
    p.add_argument("--solver", default="8pt", choices=["8pt", "5pt"])
    p.add_argument("--frame-a", default=MH01_A)
    p.add_argument("--frame-b", default=MH01_B)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.features import matching, orb
    from kornia_tpu.geometry import twoview

    g1 = jnp.asarray(kio.read_image_any_gray8(args.frame_a)[:, :, 0])
    g2 = jnp.asarray(kio.read_image_any_gray8(args.frame_b)[:, :, 0])
    k = jnp.asarray([[458.654, 0, 367.215],
                     [0, 457.296, 248.375], [0, 0, 1]], jnp.float32)
    cfg = orb.OrbConfig(n_features=800, n_levels=4)
    params = twoview.TwoViewParams(solver=args.solver)

    def bootstrap(a, b, key, k):
        f1 = orb.orb_detect_and_describe(a, cfg)
        f2 = orb.orb_detect_and_describe(b, cfg)
        m = matching.match_descriptors(
            f1.descriptors, f2.descriptors, a_mask=f1.mask, b_mask=f2.mask,
            max_distance=64, ratio=0.8)
        x1 = f1.xy
        x2 = f2.xy[jnp.maximum(m.idx, 0)]
        return twoview.estimate_relative_pose(
            key, x1, x2, k, k, mask=m.mask, params=params), m

    boot = jax.jit(bootstrap)
    key = jax.random.PRNGKey(0)
    (res, m) = boot(g1, g2, key, k)
    jax.block_until_ready(res.rotation)

    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(boot(g1, g2, key, k)[0].rotation)
    dt = (time.perf_counter() - t0) / 10 * 1e3

    n_matches = int(np.asarray(m.mask).sum())
    r = np.asarray(res.rotation)
    ang = np.rad2deg(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
    print(f"solver: {args.solver}")
    print(f"matches: {n_matches}, inliers: {int(res.n_inliers)}, "
          f"model: {'H' if bool(res.use_homography) else 'E/F'}")
    print(f"rotation magnitude: {ang:.2f}°, "
          f"t = {np.asarray(res.translation).round(3)}")
    print(f"detect+match+pose: {dt:.3f} ms "
          f"(reference total: 10.89 ms Orin CPU)")


if __name__ == "__main__":
    main()
