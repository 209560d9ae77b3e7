"""Baseline config 4: ICP registration + pose graph over PLY pairs.

Reference: examples/icp_registration + ply_rerun. Generates a synthetic
scan sequence (or reads --ply files), registers consecutive pairs with
ICP, chains them into a pose graph, and optimizes with PGO.

    python examples/icp_registration.py [--ply a.ply b.ply ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
from examples._common import base_parser, configure_backend


def main():
    p = base_parser(__doc__)
    p.add_argument("--ply", nargs="*", default=None)
    p.add_argument("--n-scans", type=int, default=4)
    args = p.parse_args()
    configure_backend(args)

    import numpy as np
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.geometry import icp, liegroup as lg
    from kornia_tpu.optim import pgo

    rng = np.random.default_rng(0)

    if args.ply:
        clouds = [kio.read_ply(f)["points"].astype(np.float32)
                  for f in args.ply]
        print(f"loaded {len(clouds)} PLY clouds")
    else:
        # synthetic: one surface observed from drifting poses
        base = rng.uniform(-1, 1, (1500, 3)).astype(np.float32)
        base[:, 2] = 0.2 * np.sin(3 * base[:, 0]) + 0.1 * base[:, 1] ** 2
        clouds = []
        gt = []
        for i in range(args.n_scans):
            xi = np.array([0, 0, 0.06 * i, 0.08 * i, 0.02 * i, 0],
                          np.float32)
            t = np.asarray(lg.se3_exp(jnp.asarray(xi)))
            gt.append(t)
            moved = np.asarray(lg.se3_apply(jnp.asarray(t)[None],
                                            jnp.asarray(base)))
            clouds.append((moved + rng.normal(0, 0.003, moved.shape))
                          .astype(np.float32))
        print(f"synthesized {len(clouds)} scans of {base.shape[0]} points")

    poses = [np.array([1, 0, 0, 0, 0, 0, 0], np.float32)]
    edges = []
    for i in range(len(clouds) - 1):
        res = icp.icp_vanilla(
            jnp.asarray(clouds[i + 1]), jnp.asarray(clouds[i]),
            icp.ICPParams(max_iterations=30))
        r = np.asarray(res.rotation)
        t = np.asarray(res.translation)
        q = np.asarray(lg.matrix_to_quat(jnp.asarray(r)))
        rel = np.concatenate([q, t]).astype(np.float32)
        print(f"pair {i}->{i+1}: rmse {float(res.rmse):.4f}, "
              f"|t| {np.linalg.norm(t):.3f}")
        poses.append(np.asarray(
            lg.se3_compose(jnp.asarray(rel), jnp.asarray(poses[-1]))))
        edges.append((i, i + 1, rel))

    ei = np.asarray([e[0] for e in edges], np.int32)
    ej = np.asarray([e[1] for e in edges], np.int32)
    meas = np.stack([e[2] for e in edges])
    res = pgo.pose_graph_optimize(
        jnp.asarray(np.stack(poses)), ei, ej, jnp.asarray(meas),
        params=pgo.PGOParams(max_iterations=10))
    print(f"PGO: cost {float(res.initial_cost):.6f} -> "
          f"{float(res.final_cost):.6f}")
    out = np.asarray(res.poses)
    for i, pose in enumerate(out):
        print(f"  scan {i}: t = {pose[4:].round(3)}")


if __name__ == "__main__":
    main()
