"""Extended benchmark: front-end + geometry stacks on the real chip.

Complements bench.py (which the driver runs and which stays lean) with
the reference's other headline rows (BASELINE.md): ORB detect+describe,
two-view bootstrap on the EuRoC MH01 frame pair, Hamming matching, BA.

Methodology: the SLOPE instrument shared with bench.py — K chained
in-program repetitions, full-output consumption, cost = slope between
two K values (PERF_NOTES.md §Methodology; naive timing is fiction on
the axon tunnel).

    PYTHONPATH=.:.axon_site python bench_detail.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

from bench import _slope

MH01_A = "/root/reference/tests/data/mh01_frame1.png"
MH01_B = "/root/reference/tests/data/mh01_frame2.png"


def main():
    import jax
    import jax.numpy as jnp

    from kornia_tpu import io as kio
    from kornia_tpu.features import matching, orb
    from kornia_tpu.geometry import twoview
    from kornia_tpu.optim import ba as ba_mod

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}

    # --- ORB detect+describe 1080p (reference: 10.65 ms Orin CPU) ---
    gray1080 = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))
    cfg = orb.OrbConfig(n_features=1000, n_levels=4)
    results["orb_detect_describe_1080p"] = _slope(
        lambda g: orb.orb_detect_and_describe(g, cfg), gray1080,
        ks=(2, 12))

    # --- Hamming matching 1024×1024 (part of the match split) ---
    bits_b = rng.integers(0, 2, (1024, 256)).astype(np.uint8)
    results["match_1024x1024"] = _slope(
        lambda a: matching.match_descriptors(
            a, jnp.asarray(bits_b), max_distance=64, ratio=0.8),
        jnp.asarray(rng.integers(0, 2, (1024, 256)).astype(np.uint8)),
        ks=(4, 34))

    # --- two-view bootstrap on EuRoC MH01 (reference: 10.89 ms total,
    #     detect 8.15 / match 1.32 / pose 1.42 on Orin CPU) ---
    try:
        g1 = np.asarray(kio.read_image_any_gray8(MH01_A)[:, :, 0])
        g2 = np.asarray(kio.read_image_any_gray8(MH01_B)[:, :, 0])
    except Exception:  # noqa: BLE001
        g1 = rng.integers(0, 256, (480, 752), np.uint8)
        g2 = rng.integers(0, 256, (480, 752), np.uint8)
    pair = jnp.asarray(np.stack([g1, g2]))
    k_np = np.asarray([[458.654, 0, 367.215],
                       [0, 457.296, 248.375], [0, 0, 1]], np.float32)
    cfg_vga = orb.OrbConfig(n_features=800, n_levels=4)

    def bootstrap(x):
        f1 = orb.orb_detect_and_describe(x[0], cfg_vga)
        f2 = orb.orb_detect_and_describe(x[1], cfg_vga)
        m = matching.match_descriptors(
            f1.descriptors, f2.descriptors, a_mask=f1.mask,
            b_mask=f2.mask, max_distance=64, ratio=0.8)
        x1 = f1.xy
        x2 = f2.xy[jnp.clip(m.idx, 0, f2.xy.shape[0] - 1)]
        return twoview.estimate_relative_pose(
            jax.random.PRNGKey(0), x1, x2, jnp.asarray(k_np),
            jnp.asarray(k_np), mask=m.mask)

    results["twoview_mh01_detect_match_pose"] = _slope(
        bootstrap, pair, ks=(2, 8))
    res = jax.jit(bootstrap)(pair)
    print(f"# mh01 two-view: {int(res.n_inliers)} inliers, "
          f"H-model={bool(res.use_homography)}", file=sys.stderr)

    # --- per-iteration Schur BA (170 poses × 3k pts, ba_schur.rs) ---
    from bench_scaling import synth_problem

    problem, n_obs = synth_problem(n_poses=170, n_points=3000, seed=1)
    params = ba_mod.BAParams(max_iterations=5, loss="huber",
                             loss_scale=2.0)
    # numpy copies: closing over DEVICE arrays poisons every subsequent
    # dispatch to ~34 ms (PERF_NOTES.md); numpy trace constants are free
    problem_np = jax.tree_util.tree_map(np.asarray, problem)

    def ba_op(uv):
        p = jax.tree_util.tree_map(jnp.asarray, problem_np)
        return ba_mod.bundle_adjust_schur(p._replace(obs_uv=uv), params)

    ms = _slope(ba_op, jnp.asarray(problem_np.obs_uv), ks=(1, 4), reps=2)
    results["ba_schur_170x3000_per_iter"] = ms / params.max_iterations
    print(f"# BA problem: 170 poses, 3000 pts, {n_obs} obs",
          file=sys.stderr)

    for k_, v in results.items():
        print(f"# {k_}: {v:.3f} ms", file=sys.stderr)
    print(json.dumps({k_: round(v, 4) for k_, v in results.items()}))


if __name__ == "__main__":
    main()
