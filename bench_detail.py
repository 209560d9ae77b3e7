"""Extended benchmark: front-end + geometry stacks on the real chip.

Complements bench.py (which the driver runs and which stays lean) with
the reference's other headline rows (BASELINE.md): ORB detect+describe,
two-view bootstrap on the EuRoC MH01 frame pair, Hamming matching, BA.

    PYTHONPATH=.:.axon_site python bench_detail.py
"""

from __future__ import annotations

import gc
import json
import sys
import time

import numpy as np

MH01_A = "/root/reference/tests/data/mh01_frame1.png"
MH01_B = "/root/reference/tests/data/mh01_frame2.png"


def _best_of(fn, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    gc.disable()
    try:
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
    finally:
        gc.enable()
    return min(times) * 1e3


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
    orb_fn = jax.jit(lambda g: orb.orb_detect_and_describe(g, cfg))
    results["orb_detect_describe_1080p"] = _best_of(
        lambda: orb_fn(gray1080), n=5)

    # --- Hamming matching 1000×1000 (part of the match split) ---
    fa = orb_fn(gray1080)
    match_fn = jax.jit(lambda a, b, ma, mb: matching.match_descriptors(
        a, b, a_mask=ma, b_mask=mb, max_distance=64, ratio=0.8))
    results["match_1000x1000"] = _best_of(
        lambda: match_fn(fa.descriptors, fa.descriptors, fa.mask, fa.mask))

    # --- two-view bootstrap on EuRoC MH01 (reference: 10.89 ms total,
    #     detect 8.15 / match 1.32 / pose 1.42 on Orin CPU) ---
    try:
        g1 = jnp.asarray(kio.read_image_any_gray8(MH01_A)[:, :, 0])
        g2 = jnp.asarray(kio.read_image_any_gray8(MH01_B)[:, :, 0])
    except Exception:  # noqa: BLE001
        g1 = g2 = None
    if g1 is not None:
        cfg_vga = orb.OrbConfig(n_features=800, n_levels=4)
        k = jnp.asarray([[458.654, 0, 367.215],
                         [0, 457.296, 248.375], [0, 0, 1]], jnp.float32)

        # k as a runtime arg: a captured device array poisons the whole
        # process into ~35 ms/dispatch mode (PERF_NOTES.md)
        def bootstrap(a, b, key, k):
            f1 = orb.orb_detect_and_describe(a, cfg_vga)
            f2 = orb.orb_detect_and_describe(b, cfg_vga)
            m = matching.match_descriptors(
                f1.descriptors, f2.descriptors, a_mask=f1.mask,
                b_mask=f2.mask, max_distance=64, ratio=0.8)
            x1 = f1.xy[jnp.arange(m.idx.shape[0])]
            x2 = f2.xy[m.idx]
            return twoview.estimate_relative_pose(
                key, x1, x2, k, k, mask=m.mask)

        boot = jax.jit(bootstrap)
        key = jax.random.PRNGKey(0)
        res = jax.block_until_ready(boot(g1, g2, key, k))
        results["twoview_mh01_detect_match_pose"] = _best_of(
            lambda: boot(g1, g2, key, k), n=5)
        print(f"# mh01 two-view: {int(res.n_inliers)} inliers, "
              f"H-model={bool(res.use_homography)}", file=sys.stderr)

    # --- per-iteration Schur BA (170 poses × 3k pts regime, ba_schur.rs) ---
    from bench_scaling import synth_problem

    problem, n_obs = synth_problem(n_poses=170, n_points=3000, seed=1)
    params = ba_mod.BAParams(max_iterations=5, loss="huber", loss_scale=2.0)
    ba_fn = jax.jit(lambda p: ba_mod.bundle_adjust_schur(p, params))
    ms = _best_of(lambda: ba_fn(problem), n=3)
    results["ba_schur_170x3000_per_iter"] = ms / params.max_iterations
    print(f"# BA problem: 170 poses, 3000 pts, {n_obs} obs",
          file=sys.stderr)

    for k_, v in results.items():
        print(f"# {k_}: {v:.3f} ms", file=sys.stderr)
    print(json.dumps({k_: round(v, 4) for k_, v in results.items()}))


if __name__ == "__main__":
    main()
