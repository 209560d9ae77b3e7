"""PnP demo: EPnP + RANSAC + LM on a synthetic distorted cube.

Reference: examples/pnp_demo (pnp_demo/src/main.rs:21-60 — synthetic
cube with Brown-Conrady distortion).

    python examples/pnp_demo.py [--noise 0.5] [--outliers 0.2]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--noise", type=float, default=0.5)
    p.add_argument("--outliers", type=float, default=0.2)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kornia_tpu.geometry import camera, liegroup as lg, pnp

    rng = np.random.default_rng(0)
    k = np.array([[800.0, 0, 640], [0, 800.0, 360], [0, 0, 1]], np.float32)
    dist = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.0], np.float32)

    # cube corners + edge midpoints in world
    g = np.linspace(-0.5, 0.5, 3)
    world = np.array([[x, y, z] for x in g for y in g for z in g],
                     np.float32)

    # se3 twist is [rho(3); omega(3)] — translation block first
    xi = np.array([0.1, -0.05, 2.0, 0.1, -0.2, 0.05], np.float32)
    t_true = np.asarray(lg.se3_exp(jnp.asarray(xi)))
    cam = np.asarray(lg.se3_apply(jnp.asarray(t_true)[None],
                                  jnp.asarray(world)))
    xy_n = cam[:, :2] / cam[:, 2:]
    xy_d = np.asarray(camera.distort_points_polynomial(
        jnp.asarray(xy_n), jnp.asarray(dist)))
    px = xy_d * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
    px += rng.normal(0, args.noise, px.shape)
    n_out = int(len(px) * args.outliers)
    out_idx = rng.choice(len(px), n_out, replace=False)
    px[out_idx] = rng.uniform([0, 0], [1280, 720], (n_out, 2))
    print(f"{len(world)} points, {n_out} outliers, "
          f"noise σ={args.noise} px")

    # undistort observations, then PnP-RANSAC
    px_u = np.asarray(camera.undistort_points(
        jnp.asarray(px, jnp.float32), jnp.asarray(k), jnp.asarray(dist)))
    pose, inliers, n_inl = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(world),
        jnp.asarray(px_u, jnp.float32), jnp.asarray(k),
        threshold_px=3.0)

    r_est = np.asarray(pose.rotation)
    t_est = np.asarray(pose.translation)
    r_true = np.asarray(lg.quat_to_matrix(lg.se3_quat(jnp.asarray(t_true))))
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(r_est @ r_true.T) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(t_est - np.asarray(t_true)[4:])
    print(f"inliers: {int(n_inl)}/{len(world)}")
    print(f"rotation error: {rot_err:.3f}°, translation error: {t_err:.4f}")


if __name__ == "__main__":
    main()
