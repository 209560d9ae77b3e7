"""Benchmark harness — prints ONE JSON line for the driver.

Methodology: the SLOPE instrument (PERF_NOTES.md §Methodology). The axon
tunnel defeats naive timing three ways: `block_until_ready` doesn't
block (only value fetch does), identical (program, input) executions
are memoized, and partially-consumed outputs get dead-code-sliced. So
each op is run K times *inside one lax.scan program* with a chained
data dependency and full-output consumption; cost = the slope of total
fetched wall time between two K values. Validated against the bf16
matmul roofline (186 of 197 TFLOP/s).

Headline metric: the fused DNN-preprocess pipeline (1080p RGB u8 →
640×640 normalized CHW f32), the reference's flagship fused kernel
(benchmark-cuda-color-conversions.md §Fused: 0.0968 ms on Orin Nano
CUDA). vs_baseline = baseline_ms / ours_ms (> 1 means faster than the
reference's GPU number).

Detailed per-op results go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _slope(op, x, ks, reps=3):
    """True per-op cost in ms: K chained in-program reps, slope over ks.

    op: carry -> output pytree (carry has x's shape/dtype).
    """
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(x, seed):
            def body(carry, _):
                out = op(carry)
                leaves = jax.tree_util.tree_leaves(out)
                probe = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                bump = (probe * jnp.float32(1e-30)).astype(carry.dtype)
                return carry + bump, probe

            _, probes = jax.lax.scan(
                body, x + seed.astype(x.dtype), None, length=n)
            return probes.sum()

        return run

    times = {}
    for n in ks:
        f = make(n)
        float(f(x, jnp.float32(1).astype(x.dtype)))  # compile + warm
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(f(x, jnp.float32(i + 2).astype(x.dtype)))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0]) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from kornia_tpu.ops import preprocess as pp
    from kornia_tpu.ops import color, resize, warp, filters
    from kornia_tpu.features import fast, orb, matching

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 256, (1080, 1920, 3), np.uint8))
    gray = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))

    results = {}

    # --- headline: fused resize+normalize+CHW 1080p→640² ---
    cfg = pp.PreprocessorConfig(
        out_size=(640, 640),
        normalize=pp.NormalizeMode.MEAN_STD,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
    )
    results["fused_preprocess_1080p_to_640"] = _slope(
        lambda x: pp.resize_normalize_to_tensor(x, cfg), rgb, ks=(4, 64))

    # --- supporting ops (stderr, for the record; ΔK sized to each op) ---
    results["gray_from_rgb_1080p"] = _slope(
        color.rgb_to_gray, rgb, ks=(4, 64))
    results["resize_half_bilinear_1080p"] = _slope(
        lambda x: resize.resize(x, (540, 960), "bilinear"), gray,
        ks=(4, 64))
    results["gaussian5x5_1080p"] = _slope(
        lambda x: filters.gaussian_blur(
            x.astype(jnp.float32)[..., None], (5, 5), 1.5), gray,
        ks=(4, 64))

    m = np.asarray([[0.9, 0.2, 10.0], [-0.1, 1.05, -5.0]], np.float32)
    results["warp_affine_shear_1080p"] = _slope(
        lambda x: warp.warp_affine(
            x.astype(jnp.float32), jnp.asarray(m), (1080, 1920),
            method="shear"), gray, ks=(2, 10))

    results["fast_detect_1080p"] = _slope(
        lambda g: fast.fast_detect(
            g, threshold=20.0, max_keypoints=4096).xy, gray, ks=(4, 34))

    g640 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    results["orb_2000kp_480x640"] = _slope(
        lambda g: orb.orb_detect_and_describe(g), g640, ks=(2, 12))

    bits_b = rng.integers(0, 2, (1024, 256)).astype(np.uint8)
    results["hamming_match_1024"] = _slope(
        lambda a: matching.match_descriptors(a, jnp.asarray(bits_b)),
        jnp.asarray(rng.integers(0, 2, (1024, 256)).astype(np.uint8)),
        ks=(4, 34))

    for k, v in results.items():
        print(f"# {k}: {v:.4f} ms", file=sys.stderr)

    headline = results["fused_preprocess_1080p_to_640"]
    baseline_ms = 0.0968  # reference fused kernel, Orin Nano CUDA (640²)
    print(json.dumps({
        "metric": "fused_preprocess_1080p_to_640",
        "value": round(headline, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / headline, 3),
    }))


if __name__ == "__main__":
    main()
